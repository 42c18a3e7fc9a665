"""CLI surface tests: train_interface end-to-end on tiny synthetic data,
mesh-mode Trainer, corpus synthesis CLI."""

import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")


def test_train_interface_perf_flags_reach_config(monkeypatch):
    """The TPU perf knobs (--compute-dtype/--grad-accum/--pallas-lstm/
    --adam-mu-dtype) must land in the Config the trainer receives."""
    import train_interface

    captured = {}

    def fake_train(cfg, use_mesh=False, **kw):
        captured["cfg"] = cfg
        captured["use_mesh"] = use_mesh

    monkeypatch.setattr("se_tpu.train.loop.train", fake_train)
    monkeypatch.setattr(
        sys, "argv",
        [
            "train_interface.py", "--model", "DCCRN",
            "--train-data", "t.npy", "--valid-data", "v.npy",
            "--compute-dtype", "bfloat16", "--grad-accum", "4",
            "--pallas-lstm", "off", "--adam-mu-dtype", "bfloat16",
            "--mesh",
        ],
    )
    train_interface.main()
    cfg = captured["cfg"]
    assert cfg.compute_dtype == "bfloat16"
    assert cfg.train.grad_accum == 4
    assert cfg.use_pallas_lstm == "off"
    assert cfg.train.adam_mu_dtype == "bfloat16"
    assert captured["use_mesh"] is True


def test_train_interface_cli(tmp_path):
    rng = np.random.default_rng(0)
    train = rng.standard_normal((4, 2, 16000)).astype(np.float32) * 0.05
    valid = rng.standard_normal((2, 2, 16000)).astype(np.float32) * 0.05
    tp, vp = str(tmp_path / "train.npy"), str(tmp_path / "valid.npy")
    np.save(tp, train)
    np.save(vp, valid)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # prevent the container's sitecustomize from registering the axon TPU
    # backend in the subprocess (CPU-only test)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    out = subprocess.run(
        [
            sys.executable, "train_interface.py",
            "--model", "CRN", "--lstm", "real", "--loss", "MSE",
            "--max-epochs", "1", "--batch", "2",
            "--train-data", tp, "--valid-data", vp,
            "--job-dir", str(tmp_path / "models") + "/",
            "--logs-dir", str(tmp_path / "logs") + "/",
        ],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "Training has been finished." in out.stdout
    runs = os.listdir(tmp_path / "models")
    assert len(runs) == 1
    run_dir = tmp_path / "models" / runs[0]
    assert (run_dir / "chkpt_opt").exists()

    # enhance.py consumes the trained checkpoint (full-size CRN default
    # config differs from the tiny training config, so rebuild tiny here
    # by invoking the module path directly)
    from se_tpu.config import Config
    from se_tpu.data.synth import write_wav, read_wav
    from se_tpu.train.state import create_train_state
    from se_tpu.train.checkpoint import restore_checkpoint

    cfg = Config(model="CRN", lstm="real", loss="MSE")
    model, state = create_train_state(cfg)
    state, _ = restore_checkpoint(str(run_dir / "chkpt_opt"), state)
    wav_in = tmp_path / "noisy.wav"
    write_wav(str(wav_in), valid[0, 0].astype(np.float64), 16000)
    wav, _ = read_wav(str(wav_in))
    import jax.numpy as jnp

    out_wav = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(wav.astype(np.float32))[None],
        train=False,
    )[-1]
    assert np.isfinite(np.asarray(out_wav)).all()


def test_synth_cli(tmp_path):
    from se_tpu.data.synth import write_wav, generate_corpus

    rng = np.random.default_rng(1)
    for d in ("train/clean", "train/noise", "valid/clean"):
        os.makedirs(tmp_path / d)
    for i in range(2):
        write_wav(
            str(tmp_path / "train/clean" / f"c{i}.wav"),
            rng.standard_normal(8000) * 0.1, 16000,
        )
        write_wav(
            str(tmp_path / "valid/clean" / f"v{i}.wav"),
            rng.standard_normal(8000) * 0.1, 16000,
        )
    write_wav(
        str(tmp_path / "train/noise" / "n.wav"),
        rng.standard_normal(20000) * 0.1, 16000,
    )
    log = generate_corpus("train", [0.0, 5.0], 16000, root=str(tmp_path))
    assert os.path.exists(log)
    noisy = os.listdir(tmp_path / "train/noisy")
    assert len(noisy) == 4  # 2 clean x 2 SNRs
    log = generate_corpus("valid", [0.0, 5.0], 16000, root=str(tmp_path))
    assert len(os.listdir(tmp_path / "valid/noisy")) == 2

    # pack the generated tree into the [N, 2, T] training .npy (the
    # reference documents the array but ships no packer, README.md:37-41)
    from se_tpu.data.synth import pack_corpus, read_wav, main as synth_main
    from se_tpu.data import WaveDataset

    out = pack_corpus(
        "train", str(tmp_path / "train.npy"), seconds=1.0, fs=16000,
        root=str(tmp_path),
    )
    arr = np.load(out)
    assert arr.shape == (4, 2, 16000) and arr.dtype == np.float32
    # rows are (noisy, clean): clean row 0 must round-trip c*.wav, the
    # 8000-sample originals zero-padded to the 1-s crop
    with open(tmp_path / "train" / "log.tsv") as f:
        cf = f.readline().split("\t")[0]
    want = read_wav(cf, 16000)[0]
    np.testing.assert_allclose(arr[0, 1, :8000], want, atol=1e-4)
    assert np.all(arr[0, :, 8000:] == 0)
    assert not np.allclose(arr[0, 0, :8000], arr[0, 1, :8000])  # noisy differs
    ds = WaveDataset(arr)  # feeds the dataloader directly
    noisy0, clean0 = ds[0]
    assert noisy0.shape == clean0.shape == (16000,)

    # CLI subcommand form (cwd-relative root)
    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        synth_main(["pack", "valid", "valid.npy", "1.0", "16000"])
    finally:
        os.chdir(cwd)
    assert np.load(tmp_path / "valid.npy").shape == (2, 2, 16000)


def test_trainer_mesh_mode(tmp_path):
    """Trainer with use_mesh=True over the 8-device virtual mesh."""
    from se_tpu.config import TrainConfig
    from se_tpu.train.loop import Trainer
    from tests.test_models import small_cfg

    rng = np.random.default_rng(0)
    train = rng.standard_normal((16, 2, 16000)).astype(np.float32) * 0.05
    valid = rng.standard_normal((8, 2, 16000)).astype(np.float32) * 0.05
    cfg = small_cfg(model="CRN", lstm="real", loss="MSE").replace(
        train=TrainConfig(
            max_epochs=1,
            batch=8,
            job_dir=str(tmp_path / "models") + "/",
            logs_dir=str(tmp_path / "logs") + "/",
        )
    )
    t = Trainer(
        cfg, train, valid, use_mesh=True,
        score_fn=lambda e, c: ([2.0] * len(e), [0.9] * len(e)),
    )
    t.setup()
    mse = t.run()
    assert np.isfinite(mse[0]) and mse[0] != 0


def test_enhance_cli_jit_bucketing_matches_eager(tmp_path):
    """enhance.py --jit (1-second length bucketing, shared compiles) must
    produce the same audio as the eager path on a non-bucket-length wav."""
    from se_tpu.data.synth import write_wav, read_wav
    from se_tpu.config import Config
    from se_tpu.train.state import create_train_state
    from se_tpu.train.checkpoint import save_checkpoint

    cfg = Config(model="CRN", lstm="real", loss="MSE")
    model, state = create_train_state(cfg)
    ckpt_dir = tmp_path / "ck"
    os.makedirs(ckpt_dir)
    save_checkpoint(str(ckpt_dir), state, epoch=1)

    rng = np.random.default_rng(2)
    # 1.25 s (bucketed) + a sub-win_len file, which sits entirely inside
    # the bucketing contract's final-window zone and must therefore take
    # the exact-length path (bit-identical to eager)
    lengths = {"noisy.wav": 20000, "tiny.wav": 300}
    for name, L in lengths.items():
        write_wav(
            str(tmp_path / name), rng.standard_normal(L) * 0.05, 16000
        )

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    outs = {}
    for mode, flag in [("eager", "--no-jit"), ("jit", "--jit")]:
        out_dir = tmp_path / mode
        r = subprocess.run(
            [
                sys.executable, "enhance.py",
                "--checkpoint", str(ckpt_dir / "chkpt_1"),
                "--model", "CRN", "--lstm", "real", flag,
                str(tmp_path / "noisy.wav"), str(tmp_path / "tiny.wav"),
                "--out-dir", str(out_dir),
            ],
            cwd=ROOT, env=env, capture_output=True, text=True, timeout=1200,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        outs[mode] = {
            name: read_wav(str(out_dir / name))[0] for name in lengths
        }
    for name, L in lengths.items():
        got, want = outs["jit"][name], outs["eager"][name]
        assert len(got) == len(want) == L
        # identical up to the last analysis window (zero-pad tail
        # influence); the sub-win_len file matches everywhere
        tail = 512 if L > 512 else 0
        np.testing.assert_allclose(
            got[: L - tail], want[: L - tail], atol=2e-4
        )


def test_enhance_cli_fullsubnet_jit_matches_eager(tmp_path):
    """FullSubNet's default offline_laplace_norm takes utterance-global
    statistics, so naive zero-pad bucketing would rescale every frame.
    The pad-aware jit path (reflect tail + masked statistics via
    ``valid_frames``, se_tpu/models/fullsubnet.py) buckets to whole
    seconds and must still match eager on everything but the final
    analysis window, on non-whole-second files.  Two different lengths
    in one invocation share the same bucket compile."""
    from se_tpu.data.synth import write_wav, read_wav
    from se_tpu.config import Config
    from se_tpu.train.state import create_train_state
    from se_tpu.train.checkpoint import save_checkpoint

    cfg = Config(model="FullSubNet", loss="MSE")
    model, state = create_train_state(cfg)
    ckpt_dir = tmp_path / "ck"
    os.makedirs(ckpt_dir)
    save_checkpoint(str(ckpt_dir), state, epoch=1)

    rng = np.random.default_rng(4)
    # 1.25 s / 1.5 s share one bucket; 100 samples is shorter than the
    # fft_len/2 reflect pad, where no bucketed buffer can reproduce the
    # multi-bounce reflection — the jit path must fall back to the
    # exact-length eager run for it
    lengths = {"a.wav": 20000, "b.wav": 24000, "c.wav": 100}
    for name, L in lengths.items():
        write_wav(
            str(tmp_path / name), rng.standard_normal(L) * 0.05, 16000
        )

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    outs = {}
    for mode, flag in [("eager", "--no-jit"), ("jit", "--jit")]:
        out_dir = tmp_path / mode
        r = subprocess.run(
            [
                sys.executable, "enhance.py",
                "--checkpoint", str(ckpt_dir / "chkpt_1"),
                "--model", "FullSubNet", flag,
                str(tmp_path / "a.wav"), str(tmp_path / "b.wav"),
                str(tmp_path / "c.wav"),
                "--out-dir", str(out_dir),
            ],
            cwd=ROOT, env=env, capture_output=True, text=True, timeout=1800,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        outs[mode] = {
            name: read_wav(str(out_dir / name))[0] for name in lengths
        }
    for name, L in lengths.items():
        got, want = outs["jit"][name], outs["eager"][name]
        assert len(got) == len(want) == L
        # identical up to the last analysis window (the padded run's
        # trailing frames contribute to the final window's overlap-add);
        # the ultra-short file runs the exact-length path, so it matches
        # everywhere
        tail = 512 if L > 512 else 0
        np.testing.assert_allclose(
            got[: L - tail], want[: L - tail], atol=2e-4
        )


def test_enhance_cli_streaming_matches_batch_interior(tmp_path):
    """enhance.py --streaming (chunked carried-state CRN) must agree with
    the batch path over the WHOLE wav — including the final frames,
    which the round-5 ``flush_stream`` end-of-stream decoder cascade
    makes exact (previously the tail was excluded)."""
    from se_tpu.data.synth import write_wav, read_wav
    from se_tpu.config import Config
    from se_tpu.train.state import create_train_state
    from se_tpu.train.checkpoint import save_checkpoint

    cfg = Config(model="CRN", lstm="real", loss="MSE")
    model, state = create_train_state(cfg)
    ckpt_dir = tmp_path / "ck"
    os.makedirs(ckpt_dir)
    save_checkpoint(str(ckpt_dir), state, epoch=1)

    rng = np.random.default_rng(3)
    wav_in = tmp_path / "noisy.wav"
    write_wav(str(wav_in), rng.standard_normal(16000) * 0.05, 16000)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    outs = {}
    for mode, extra in [("batch", []), ("stream", ["--streaming"])]:
        out_dir = tmp_path / mode
        r = subprocess.run(
            [
                sys.executable, "enhance.py",
                "--checkpoint", str(ckpt_dir / "chkpt_1"),
                "--model", "CRN", "--lstm", "real", "--no-jit",
                *extra, str(wav_in), "--out-dir", str(out_dir),
            ],
            cwd=ROOT, env=env, capture_output=True, text=True, timeout=1200,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        outs[mode], _ = read_wav(str(out_dir / "noisy.wav"))
    assert len(outs["stream"]) == len(outs["batch"]) == 16000
    # latency-compensated stream + end-of-stream flush is sample-exact
    # with the batch forward (int16 WAV quantisation aside) EVERYWHERE
    np.testing.assert_allclose(outs["stream"], outs["batch"], atol=2e-4)


def test_enhance_cli_streaming_fullsubnet_exact(tmp_path):
    """enhance.py --streaming with FullSubNet (chunked analysis + carried
    cumulative-norm/RNN state + zero-frame look-ahead flush) must be
    sample-exact with the batch path over the WHOLE wav, on a
    non-whole-second file."""
    from se_tpu.data.synth import write_wav, read_wav
    from se_tpu.config import Config, FullSubNetConfig
    from se_tpu.train.state import create_train_state
    from se_tpu.train.checkpoint import save_checkpoint

    cfg = Config(
        model="FullSubNet", loss="MSE",
        fullsubnet=FullSubNetConfig(norm_type="cumulative_laplace_norm"),
    )
    model, state = create_train_state(cfg)
    ckpt_dir = tmp_path / "ck"
    os.makedirs(ckpt_dir)
    save_checkpoint(str(ckpt_dir), state, epoch=1)

    rng = np.random.default_rng(11)
    wav_in = tmp_path / "noisy.wav"
    write_wav(str(wav_in), rng.standard_normal(20000) * 0.05, 16000)  # 1.25 s

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    outs = {}
    for mode, extra in [("batch", []), ("stream", ["--streaming"])]:
        out_dir = tmp_path / mode
        r = subprocess.run(
            [
                sys.executable, "enhance.py",
                "--checkpoint", str(ckpt_dir / "chkpt_1"),
                "--model", "FullSubNet", "--no-jit",
                "--fsn-norm", "cumulative_laplace_norm",
                *extra, str(wav_in), "--out-dir", str(out_dir),
            ],
            cwd=ROOT, env=env, capture_output=True, text=True, timeout=1200,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        outs[mode], _ = read_wav(str(out_dir / "noisy.wav"))
    assert len(outs["stream"]) == len(outs["batch"]) == 20000
    # the stream handles the true reflect-padded tail and the look-ahead
    # flush, so there is no excluded region: exact everywhere up to int16
    # WAV quantisation
    np.testing.assert_allclose(outs["stream"], outs["batch"], atol=2e-4)


def test_enhance_cli_streaming_fullsubnet_rejects_offline_norm(tmp_path):
    """The offline_* norms have no causal form; the CLI must refuse to
    stream them instead of silently changing semantics."""
    from se_tpu.config import Config
    from se_tpu.train.state import create_train_state
    from se_tpu.train.checkpoint import save_checkpoint
    from se_tpu.data.synth import write_wav

    cfg = Config(model="FullSubNet", loss="MSE")
    model, state = create_train_state(cfg)
    ckpt_dir = tmp_path / "ck"
    os.makedirs(ckpt_dir)
    save_checkpoint(str(ckpt_dir), state, epoch=1)
    wav_in = tmp_path / "noisy.wav"
    write_wav(str(wav_in), np.zeros(8000), 16000)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [
            sys.executable, "enhance.py",
            "--checkpoint", str(ckpt_dir / "chkpt_1"),
            "--model", "FullSubNet", "--streaming", "--no-jit",
            str(wav_in), "--out-dir", str(tmp_path / "out"),
        ],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode != 0
    assert "cumulative" in r.stderr


def test_enhance_cli_batch_matches_single_fullsubnet(tmp_path):
    """``--batch`` groups same-bucket files into one device batch with
    per-sample ``valid_frames`` for the offline norms.  Every row is an
    independent sample, so each output must match the --batch 1 jit run
    exactly (same bucketed buffers, same model math).  The layout
    exercises all three batch-path branches: two files share a bucket
    (one full group), a third sits alone in a larger bucket (last-group
    row repetition), and an ultra-short file takes the exact-length
    eager fallback."""
    from se_tpu.data.synth import write_wav, read_wav
    from se_tpu.config import Config
    from se_tpu.train.state import create_train_state
    from se_tpu.train.checkpoint import save_checkpoint

    cfg = Config(model="FullSubNet", loss="MSE")
    model, state = create_train_state(cfg)
    ckpt_dir = tmp_path / "ck"
    os.makedirs(ckpt_dir)
    save_checkpoint(str(ckpt_dir), state, epoch=1)

    rng = np.random.default_rng(7)
    lengths = {
        "a.wav": 20000, "b.wav": 24000, "c.wav": 36000, "d.wav": 100,
    }
    for name, L in lengths.items():
        write_wav(
            str(tmp_path / name), rng.standard_normal(L) * 0.05, 16000
        )
    files = [str(tmp_path / n) for n in lengths]

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    outs = {}
    for mode, flags in [("single", []), ("batch", ["--batch", "2"])]:
        out_dir = tmp_path / mode
        r = subprocess.run(
            [
                sys.executable, "enhance.py",
                "--checkpoint", str(ckpt_dir / "chkpt_1"),
                "--model", "FullSubNet", "--jit", *flags, *files,
                "--out-dir", str(out_dir),
            ],
            cwd=ROOT, env=env, capture_output=True, text=True, timeout=1800,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        outs[mode] = {
            name: read_wav(str(out_dir / name))[0] for name in lengths
        }
    for name, L in lengths.items():
        got, want = outs["batch"][name], outs["single"][name]
        assert len(got) == len(want) == L
        # same bucketed buffers and per-sample statistics; only the
        # [B, L]-vs-[1-file] XLA lowering differs (float accumulation
        # noise, ~1e-7 in-process), so after the int16 wav round-trip
        # samples may land one quantisation step apart: tolerance is
        # two int16 LSBs, far below any semantic deviation
        np.testing.assert_allclose(got, want, atol=2.0 / 32768)


def test_enhance_cli_batch_matches_single_crn(tmp_path):
    """Conv-STFT models under ``--batch``: plain zero-pad bucketing,
    rows independent — outputs match the --batch 1 jit run."""
    from se_tpu.data.synth import write_wav, read_wav
    from se_tpu.config import Config
    from se_tpu.train.state import create_train_state
    from se_tpu.train.checkpoint import save_checkpoint

    cfg = Config(model="CRN", loss="MSE", lstm="real")
    model, state = create_train_state(cfg)
    ckpt_dir = tmp_path / "ck"
    os.makedirs(ckpt_dir)
    save_checkpoint(str(ckpt_dir), state, epoch=1)

    rng = np.random.default_rng(8)
    lengths = {"a.wav": 20000, "b.wav": 24000, "c.wav": 9000}
    for name, L in lengths.items():
        write_wav(
            str(tmp_path / name), rng.standard_normal(L) * 0.05, 16000
        )
    files = [str(tmp_path / n) for n in lengths]

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    outs = {}
    for mode, flags in [("single", []), ("batch", ["--batch", "2"])]:
        out_dir = tmp_path / mode
        r = subprocess.run(
            [
                sys.executable, "enhance.py",
                "--checkpoint", str(ckpt_dir / "chkpt_1"),
                "--model", "CRN", "--lstm", "real", "--jit",
                *flags, *files, "--out-dir", str(out_dir),
            ],
            cwd=ROOT, env=env, capture_output=True, text=True, timeout=1800,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        outs[mode] = {
            name: read_wav(str(out_dir / name))[0] for name in lengths
        }
    for name, L in lengths.items():
        got, want = outs["batch"][name], outs["single"][name]
        assert len(got) == len(want) == L
        # two int16 LSBs: float lowering noise across the wav round-trip
        np.testing.assert_allclose(got, want, atol=2.0 / 32768)


def test_enhance_cli_batch_rejects_streaming(tmp_path):
    """--batch is the offline bucketed path; combining it with
    --streaming or --no-jit must fail loudly, not silently degrade."""
    from se_tpu.config import Config
    from se_tpu.train.state import create_train_state
    from se_tpu.train.checkpoint import save_checkpoint
    from se_tpu.data.synth import write_wav

    cfg = Config(model="DCCRN")
    model, state = create_train_state(cfg)
    ckpt_dir = tmp_path / "ck"
    os.makedirs(ckpt_dir)
    save_checkpoint(str(ckpt_dir), state, epoch=1)
    wav_in = tmp_path / "noisy.wav"
    write_wav(str(wav_in), np.zeros(8000), 16000)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    for bad in (["--streaming"], ["--no-jit"]):
        r = subprocess.run(
            [
                sys.executable, "enhance.py",
                "--checkpoint", str(ckpt_dir / "chkpt_1"),
                "--model", "DCCRN", "--batch", "2", *bad,
                str(wav_in), "--out-dir", str(tmp_path / "out"),
            ],
            cwd=ROOT, env=env, capture_output=True, text=True, timeout=1200,
        )
        assert r.returncode != 0
        assert "--batch" in r.stderr


def test_enhance_cli_batch_bf16_parity(tmp_path):
    """The advertised fast serving path (``--batch --compute-dtype
    bfloat16``): batched bf16 outputs must match (a) the single-file
    bf16 run (row independence holds at any compute dtype) and (b) the
    f32 reference within a bounded bf16 drift (measured 5-6 int16 LSBs
    on this model/corpus; pinned at 32 LSBs)."""
    from se_tpu.data.synth import write_wav, read_wav
    from se_tpu.config import Config
    from se_tpu.train.state import create_train_state
    from se_tpu.train.checkpoint import save_checkpoint

    cfg = Config(model="DCCRN")
    model, state = create_train_state(cfg)
    ckpt_dir = tmp_path / "ck"
    os.makedirs(ckpt_dir)
    save_checkpoint(str(ckpt_dir), state, epoch=1)

    rng = np.random.default_rng(7)
    lengths = {"a.wav": 20000, "b.wav": 24000}
    for name, L in lengths.items():
        write_wav(
            str(tmp_path / name), rng.standard_normal(L) * 0.05, 16000
        )
    files = [str(tmp_path / n) for n in lengths]

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    outs = {}
    for mode, flags in [
        ("single_bf16", ["--compute-dtype", "bfloat16"]),
        ("batch_bf16", ["--batch", "2", "--compute-dtype", "bfloat16"]),
        ("single_f32", []),
    ]:
        out_dir = tmp_path / mode
        r = subprocess.run(
            [
                sys.executable, "enhance.py",
                "--checkpoint", str(ckpt_dir / "chkpt_1"),
                "--model", "DCCRN", "--jit", *flags, *files,
                "--out-dir", str(out_dir),
            ],
            cwd=ROOT, env=env, capture_output=True, text=True, timeout=1800,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        outs[mode] = {
            name: read_wav(str(out_dir / name))[0] for name in lengths
        }
    for name, L in lengths.items():
        got = outs["batch_bf16"][name]
        assert len(got) == L
        # same dtype, same bucketed buffers: only [B, L]-vs-[1, L]
        # lowering noise separates them (2 LSBs, as the f32 tests pin)
        np.testing.assert_allclose(
            got, outs["single_bf16"][name], atol=2.0 / 32768
        )
        # bf16 activations vs the f32 reference: bounded dtype drift
        np.testing.assert_allclose(
            got, outs["single_f32"][name], atol=32.0 / 32768
        )


def test_enhance_cli_batch_rejects_invalid_count(tmp_path):
    """--batch 0 / negative must be rejected at argparse time, not
    silently fall back to the single-file path."""
    from se_tpu.data.synth import write_wav

    wav_in = tmp_path / "noisy.wav"
    write_wav(str(wav_in), np.zeros(8000), 16000)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    for bad in ("0", "-3"):
        r = subprocess.run(
            [
                sys.executable, "enhance.py",
                "--checkpoint", "nonexistent",
                "--model", "DCCRN", "--batch", bad,
                str(wav_in), "--out-dir", str(tmp_path / "out"),
            ],
            cwd=ROOT, env=env, capture_output=True, text=True, timeout=600,
        )
        assert r.returncode != 0
        assert "--batch must be >= 1" in r.stderr


def test_train_interface_sets_persistent_compile_cache(monkeypatch, tmp_path):
    """Tunnel hardening: train_interface.main() must enable the
    persistent compile cache so a resume after a dropped-connection kill
    skips recompilation (docs/PERF.md round-5 findings)."""
    import jax

    import train_interface

    monkeypatch.setenv("SE_TPU_COMPILE_CACHE", str(tmp_path / "cc"))
    monkeypatch.setattr("se_tpu.train.loop.train", lambda cfg, **kw: None)
    monkeypatch.setattr(
        sys, "argv",
        ["train_interface.py", "--train-data", "t.npy",
         "--valid-data", "v.npy"],
    )
    train_interface.main()
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cc")
