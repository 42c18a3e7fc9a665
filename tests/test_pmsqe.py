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
