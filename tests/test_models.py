"""Model shape / behaviour tests (small configs for CPU speed)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from se_tpu.config import Config, DccrnConfig, CrnConfig, FullSubNetConfig
from se_tpu.models import build_model
from se_tpu.models.factory import init_model, example_batch, calculate_total_params


def small_cfg(**kw) -> Config:
    """Narrow-channel variant: same topology, fewer channels/units."""
    base = dict(
        dccrn=DccrnConfig(kernel_num=(8, 16, 16, 32, 32, 32), rnn_units=32),
        crn=CrnConfig(rnn_input_size=(32 // 2) * 4, rnn_units=32),
        fullsubnet=FullSubNetConfig(
            fb_model_hidden_size=32, sb_model_hidden_size=24, sb_num_neighbors=3
        ),
    )
    base.update(kw)
    return Config(**base)


def _run(cfg, seconds=1, batch=2):
    model = build_model(cfg)
    variables = init_model(cfg, model, batch=batch, seconds=seconds)
    noisy, clean = example_batch(cfg, batch=batch, seconds=seconds)
    if cfg.model == "FullSubNet":
        from se_tpu.dsp import frame_stft

        mag = jnp.abs(
            frame_stft(noisy, cfg.stft.fft_len, cfg.stft.torch_hop, cfg.stft.win_len)
        )
        out = model.apply(variables, mag, train=False)
    else:
        out = model.apply(variables, noisy, clean, train=False)
    return out, variables


@pytest.mark.parametrize("mode", ["E", "C", "R"])
def test_dccrn_masking_modes(mode):
    cfg = small_cfg(model="DCCRN", masking_mode=mode)
    (out_r, out_i, wav), _ = _run(cfg)
    assert out_r.shape == (2, 257, 163)
    assert out_i.shape == (2, 257, 163)
    assert wav.shape == (2, 16000)
    assert np.all(np.abs(np.asarray(wav)) <= 1.0)


def test_dccrn_direct():
    cfg = small_cfg(model="DCCRN", masking_mode="Direct(None make)")
    (out_r, tgt_r, out_i, tgt_i, wav), _ = _run(cfg)
    assert out_r.shape == tgt_r.shape == (2, 257, 163)
    assert wav.shape == (2, 16000)


def test_dccrn_real_lstm_and_no_skip():
    cfg = small_cfg(model="DCCRN", lstm="real", skip_type=False)
    (out_r, out_i, wav), _ = _run(cfg)
    assert wav.shape == (2, 16000)


def test_dccrn_param_count_full_config():
    """Full-size DCCRN parameter count (paper-scale ~3.7M)."""
    cfg = Config()
    model = build_model(cfg)
    variables = init_model(cfg, model, batch=1, seconds=1)
    n = calculate_total_params(variables["params"])
    assert n == 3671053, n


def test_crn_masking():
    cfg = small_cfg(model="CRN", lstm="real")
    (est_mags, target_mags, wav), _ = _run(cfg)
    assert est_mags.shape == (2, 257, 163)
    assert target_mags.shape == (2, 257, 163)
    assert wav.shape == (2, 16000)


def test_crn_direct():
    cfg = small_cfg(model="CRN", lstm="real", masking_mode="Direct(None make)")
    (out_mag, tgt_mag, wav), _ = _run(cfg)
    assert out_mag.shape == (2, 257, 163)
    assert wav.shape == (2, 16000)


def test_fullsubnet_shapes():
    cfg = small_cfg(model="FullSubNet", loss="MSE")
    out, _ = _run(cfg)
    # 1 s @ hop 300 -> 54 frames (16000//300 + 1)
    assert out.shape == (2, 257, 54, 2)


def test_fullsubnet_look_ahead_crop():
    """Output time dim must equal input frames (look-ahead pad cropped)."""
    cfg = small_cfg(model="FullSubNet", loss="MSE")
    model = build_model(cfg)
    variables = init_model(cfg, model)
    mag = jnp.ones((1, 257, 20))
    out = model.apply(variables, mag, train=False)
    assert out.shape == (1, 257, 20, 2)


def test_deterministic_forward():
    cfg = small_cfg(model="DCCRN")
    out1, _ = _run(cfg)
    out2, _ = _run(cfg)
    np.testing.assert_allclose(
        np.asarray(out1[2]), np.asarray(out2[2]), atol=0
    )


@pytest.mark.parametrize(
    "norm", ["offline_laplace_norm", "offline_gaussian_norm"]
)
def test_fullsubnet_valid_frames_masked_norm(norm):
    """Pad-aware offline norms: running the model on a longer padded
    buffer with ``valid_frames`` must reproduce the exact-length run on
    the valid prefix (the enhance.py 1-s length-bucketing contract).
    The pad frames are zeroed and the statistics count valid+look_ahead
    frames, so the utterance cannot be rescaled by the pad."""
    from se_tpu.config import FullSubNetConfig

    cfg = small_cfg(model="FullSubNet", loss="MSE")
    cfg = cfg.replace(
        fullsubnet=FullSubNetConfig(
            fb_model_hidden_size=32, sb_model_hidden_size=24,
            sb_num_neighbors=3, norm_type=norm,
        )
    )
    model = build_model(cfg)
    variables = init_model(cfg, model)

    rng = np.random.default_rng(11)
    T_valid, T_pad = 23, 40
    mag_exact = np.abs(
        rng.standard_normal((2, 257, T_valid))
    ).astype(np.float32)
    mag_padded = np.concatenate(
        [
            mag_exact,
            # garbage (not zeros) past the valid range: the model must
            # mask it out of both the statistics and the sequence input
            np.abs(rng.standard_normal((2, 257, T_pad - T_valid))).astype(
                np.float32
            ),
        ],
        axis=-1,
    )

    want = model.apply(variables, jnp.asarray(mag_exact), train=False)
    got = model.apply(
        variables, jnp.asarray(mag_padded), train=False,
        valid_frames=jnp.asarray(T_valid),
    )
    assert got.shape == (2, 257, T_pad, 2)
    np.testing.assert_allclose(
        np.asarray(got)[:, :, :T_valid], np.asarray(want),
        atol=1e-5, rtol=1e-5,
    )


@pytest.mark.parametrize(
    "norm", ["offline_laplace_norm", "offline_gaussian_norm"]
)
def test_fullsubnet_per_sample_valid_frames(norm):
    """Per-sample ``valid_frames`` [B]: rows with DIFFERENT true lengths
    batched into one padded buffer must each reproduce their own
    exact-length run on their valid prefix (the enhance.py --batch
    contract — heterogeneous-length files share one device batch)."""
    from se_tpu.config import FullSubNetConfig

    cfg = small_cfg(model="FullSubNet", loss="MSE")
    cfg = cfg.replace(
        fullsubnet=FullSubNetConfig(
            fb_model_hidden_size=32, sb_model_hidden_size=24,
            sb_num_neighbors=3, norm_type=norm,
        )
    )
    model = build_model(cfg)
    variables = init_model(cfg, model)

    rng = np.random.default_rng(12)
    lengths, T_pad = [17, 29], 40
    padded = np.abs(
        rng.standard_normal((2, 257, T_pad))
    ).astype(np.float32)

    got = model.apply(
        variables, jnp.asarray(padded), train=False,
        valid_frames=jnp.asarray(lengths),
    )
    for b, T_valid in enumerate(lengths):
        want = model.apply(
            variables, jnp.asarray(padded[b : b + 1, :, :T_valid]),
            train=False,
        )
        np.testing.assert_allclose(
            np.asarray(got)[b, :, :T_valid], np.asarray(want)[0],
            atol=1e-5, rtol=1e-5,
        )
