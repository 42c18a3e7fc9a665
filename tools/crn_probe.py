"""In-context section timing of the CRN forward/backward on the current
device (the CRN analogue of tools/perf_probe.py sections, built for the
round-4 speed-of-light accounting).

Each timed call is a whole jitted subgraph (STFT+encoder / +LSTM /
full forward / the fwd+bwd of each prefix / the train step), so the
tunnelled axon platform's ~3-4 ms per-dispatch floor amortises away and
DIFFERENCES between sections give honest in-step shares.

Usage:
    python tools/crn_probe.py sections [B] [dtype]
    python tools/crn_probe.py s2d [B] [dtype]     # conv_s2d end-to-end A/B

Reference hot path: models.py:467-532 (CRN forward), models.py:373-460
(encoder/decoder towers).
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))


def run_sections(B=128, dtype="bfloat16", **cfg_kw):
    from se_tpu.config import Config
    from se_tpu.train import create_train_state, make_train_step

    cfg = Config(
        model="CRN", lstm="real", loss="MSE", compute_dtype=dtype, **cfg_kw
    )
    model, state = create_train_state(cfg)
    rng = np.random.default_rng(0)
    L = cfg.stft.fs * 3
    noisy = jnp.asarray((rng.standard_normal((B, L)) * 0.1).astype(np.float32))
    clean = jnp.asarray((rng.standard_normal((B, L)) * 0.1).astype(np.float32))
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def _sections(mdl, x):
        from se_tpu.dsp import conv_stft_mag_phase

        c = mdl.cfg
        mags, _phase = conv_stft_mag_phase(x, mdl.stft_kernels)
        compute_dtype = (
            jnp.bfloat16 if c.compute_dtype == "bfloat16" else jnp.float32
        )
        out = mags[:, None, 1:, :].astype(compute_dtype)
        for conv, bn, act in zip(mdl.encoder, mdl.encoder_bn, mdl.encoder_act):
            out = act(bn(conv(out), train=False))
        enc = out
        Bs, C, D, T = out.shape
        z = jnp.transpose(out, (3, 0, 1, 2)).reshape(T, Bs, C * D)
        z = mdl.enhance_lstm(z, train=False)
        z = mdl.tranform(z)
        return enc, z

    enc_fn = jax.jit(lambda v, x: model.apply(
        v, x, method=lambda m, xx: _sections(m, xx)[0]))
    lstm_fn = jax.jit(lambda v, x: model.apply(
        v, x, method=lambda m, xx: _sections(m, xx)[1]))
    fwd_fn = jax.jit(lambda v, x: model.apply(v, x, train=False)[-1])
    step = make_train_step(cfg, model)
    key = jax.random.PRNGKey(0)

    def _grad_of(apply_fn):
        def loss(v, x):
            out = apply_fn(v, x)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        return jax.jit(jax.grad(loss))

    enc_g = _grad_of(lambda v, x: model.apply(
        v, x, method=lambda m, xx: _sections(m, xx)[0]))
    lstm_g = _grad_of(lambda v, x: model.apply(
        v, x, method=lambda m, xx: _sections(m, xx)[1]))
    fwd_g = _grad_of(lambda v, x: model.apply(v, x, train=False)[-1])

    def _flops(fn, *args):
        try:
            c = fn.lower(*args).compile().cost_analysis()
            if isinstance(c, (list, tuple)):
                c = c[0]
            return c.get("flops", float("nan")) / 1e9
        except Exception:
            return float("nan")

    if "--flops" in sys.argv:
        for name, fn, args in (
            ("enc fwd+bwd", enc_g, (variables, noisy)),
            ("enc+lstm fwd+bwd", lstm_g, (variables, noisy)),
            ("full fwd+bwd", fwd_g, (variables, noisy)),
        ):
            g = _flops(fn, *args)
            print(f"{name:20s} {g:10.1f} GFLOP  ({g/B:.3f}/utt)", flush=True)

    names = []
    for name, fn, args in (
        ("stft+encoder fwd", enc_fn, (variables, noisy)),
        ("+LSTM+linear fwd", lstm_fn, (variables, noisy)),
        ("full forward", fwd_fn, (variables, noisy)),
        ("enc fwd+bwd", enc_g, (variables, noisy)),
        ("enc+lstm fwd+bwd", lstm_g, (variables, noisy)),
        ("full fwd+bwd", fwd_g, (variables, noisy)),
    ):
        t = timeit(fn, *args)
        names.append((name, t))
        print(f"{name:20s} {t*1e3:8.2f} ms", flush=True)
    st, m = step(state, noisy, clean, key)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(10):
        st, m = step(st, noisy, clean, key)
    float(m["loss"])
    t = (time.perf_counter() - t0) / 10
    print(f"{'train step':20s} {t*1e3:8.2f} ms  ({B/t:.1f} utt/s)")
    enc_t, lstm_t = names[0][1], names[1][1] - names[0][1]
    dec_t = names[2][1] - names[1][1]
    print(f"fwd shares: encoder {enc_t*1e3:.1f} ms, lstm {lstm_t*1e3:.1f} ms, "
          f"decoder+mask+istft {dec_t*1e3:.1f} ms")
    enc_bt, lstm_bt = names[3][1], names[4][1] - names[3][1]
    dec_bt = names[5][1] - names[4][1]
    print(f"fwd+bwd shares: encoder {enc_bt*1e3:.1f} ms, "
          f"lstm {lstm_bt*1e3:.1f} ms, decoder {dec_bt*1e3:.1f} ms, "
          f"step overhead {(t - names[5][1])*1e3:.1f} ms")


def run_s2d(B=128, dtype="bfloat16"):
    """End-to-end A/B of the polyphase s2d encoder fold for CRN
    (measured-and-rejected for DCCRN in round 3; CRN's halved channel
    counts make the direct conv's contraction depth even smaller, so
    re-measure rather than assume)."""
    import bench
    from se_tpu.config import Config

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    for s2d in ("off", "auto", "dec1", "dec2"):
        kw = dict(model="CRN", lstm="real", loss="MSE", compute_dtype=dtype)
        if s2d != "off":
            kw["conv_s2d"] = s2d
        try:
            cfg = Config(**kw)
            tr = bench._bench_train(cfg, B, key, rng)
            en = bench._bench_enhance(cfg, 2 * B, rng)
            print(f"s2d={s2d:5s}: train {tr:.1f} utt/s  "
                  f"enhance {en:.1f} utt/s", flush=True)
        except Exception as e:
            print(f"s2d={s2d:5s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "sections"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    dtype = sys.argv[3] if len(sys.argv) > 3 else "bfloat16"
    sys.path.insert(0, ".")
    if mode == "sections":
        run_sections(B, dtype)
    else:
        run_s2d(B, dtype)
