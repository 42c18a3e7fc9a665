"""Pallas fused encoder-conv kernel: exactness vs the XLA reference
(interpret mode on CPU; native compilation exercised on TPU)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import se_tpu.ops.pallas_conv as PC


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(
        PC, "_pallas_conv", functools.partial(PC._pallas_conv, interpret=True)
    )


@pytest.mark.parametrize(
    "shape",
    [
        (4, 2, 256, 100, 16),  # DCCRN stage 1
        (4, 16, 128, 130, 32),  # stage 2
        (2, 64, 32, 77, 128),  # stage 4
        (2, 128, 8, 33, 128),  # stage 6-ish
    ],
)
def test_pallas_matches_xla(rng, shape):
    B2, C, F, T, Co = shape
    x = jnp.asarray(rng.standard_normal((B2, C, F, T)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((Co, C, 5, 2)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.standard_normal(Co).astype(np.float32))
    want = np.asarray(PC.xla_reference(x, w, b))
    got = np.asarray(PC._pallas_conv(x, w, b))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_gradients_match_xla(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 16, 37)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((8, 4, 5, 2)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(8).astype(np.float32))

    def loss_pallas(x_, w_, b_):
        return jnp.sum(PC.fused_complex_conv2d(x_, w_, b_) ** 2)

    def loss_xla(x_, w_, b_):
        return jnp.sum(PC.xla_reference(x_, w_, b_) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(x, w, b)
    for a, e in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=1e-3)


def test_dccrn_with_pallas_conv_matches_default(rng):
    """Full DCCRN forward with the pallas encoder path equals the default."""
    from se_tpu.models import build_model
    from se_tpu.models.factory import init_model, example_batch
    from tests.test_models import small_cfg

    cfg = small_cfg(model="DCCRN")
    cfg_p = cfg.replace(use_pallas_conv=True)
    m1 = build_model(cfg)
    v = init_model(cfg, m1, batch=1, seconds=1)
    m2 = build_model(cfg_p)
    noisy, clean = example_batch(cfg, batch=1, seconds=1)
    w1 = np.asarray(m1.apply(v, noisy, clean, train=False)[2])
    w2 = np.asarray(m2.apply(v, noisy, clean, train=False)[2])
    np.testing.assert_allclose(w2, w1, atol=1e-4)
