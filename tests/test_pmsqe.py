"""PMSQE perceptual loss properties: zero at identity, monotone in
degradation, differentiable."""

import numpy as np
import jax
import jax.numpy as jnp

from se_tpu.losses.pmsqe import pmsqe_loss
from tools.pesq_oracle_battery import speechlike


def test_zero_for_identical():
    x = speechlike(np.random.default_rng(0), n=16000)
    assert float(pmsqe_loss(x[None], x[None].copy())) < 1e-6


def test_monotonic_in_noise():
    rng = np.random.default_rng(1)
    x = speechlike(rng, n=16000)
    losses = []
    for snr in (30, 15, 5):
        n = rng.standard_normal(len(x))
        n *= np.sqrt(np.mean(x**2) / np.mean(n**2) * 10 ** (-snr / 10))
        losses.append(float(pmsqe_loss(x[None], (x + n)[None])))
    assert losses[0] < losses[1] < losses[2], losses


def test_gradients_flow():
    rng = np.random.default_rng(2)
    x = jnp.asarray(speechlike(rng, n=16000), jnp.float32)[None]
    y = x + 0.01 * jnp.asarray(rng.standard_normal(x.shape), jnp.float32)

    g = jax.grad(lambda deg: pmsqe_loss(x, deg))(y)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


def test_perceptual_train_step_with_pmsqe():
    """End-to-end: DCCRN + PMSQE perceptual trainer variant runs."""
    from se_tpu.train import create_train_state, make_train_step
    from tests.test_models import small_cfg
    from tests.test_train_step import _batch

    cfg = small_cfg(model="DCCRN", loss="SDR", perceptual="PMSQE")
    model, state = create_train_state(cfg)
    step = make_train_step(cfg, model)
    noisy, clean = _batch(cfg)
    state, metrics = step(state, noisy, clean, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert "perceptual_loss" in metrics


def test_loudness_matches_p862_intensity_warping():
    """PMSQE's Zwicker loudness is the SAME math as the P.862 model's
    intensity warping, which is validated to +-0.0001 MOS against the ITU
    oracle binary (tools/pesq_oracle_battery.py); pin the shared
    implementation numerically."""
    from se_tpu.eval import pesq_np as P
    from se_tpu.losses import pmsqe as M

    rng = np.random.default_rng(3)
    bark = np.abs(rng.standard_normal((4, M.NB))) * 1e6  # [T, NB] rows
    ours = np.asarray(M._loudness(jnp.asarray(bark)[None]))[0]
    spec = P._intensity_warping(bark)
    np.testing.assert_allclose(ours, spec, rtol=1e-5, atol=1e-8)


def test_bark_grouping_matches_p862_freq_warping():
    """The bark matrix reproduces P.862 freq_warping (band grouping +
    power-density correction + Sp) exactly on power-spectrum rows."""
    from se_tpu.eval import pesq_np as P
    from se_tpu.losses import pmsqe as M

    rng = np.random.default_rng(4)
    hz = np.abs(rng.standard_normal((3, M.NFFT // 2))) * 1e4
    ours = np.asarray(jnp.asarray(hz) @ M._bark_matrix())
    spec = P._freq_warping(hz)
    np.testing.assert_allclose(ours, spec, rtol=1e-5)


def test_one_second_chunking_matches_reference_reshape():
    """Chunked scoring equals scoring the reference's view(N, -1, fs)
    segments as a batch (tools_for_loss.py:264-265)."""
    rng = np.random.default_rng(5)
    x = speechlike(rng, n=48000)  # 3 s
    y = x + 0.05 * rng.standard_normal(len(x))
    whole = float(pmsqe_loss(x[None], y[None]))
    chunks_x = x.reshape(3, 16000)
    chunks_y = y.reshape(3, 16000)
    batched = float(pmsqe_loss(chunks_x, chunks_y))
    np.testing.assert_allclose(whole, batched, rtol=1e-6)
