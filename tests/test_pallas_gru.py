"""Fused Pallas GRU in-projection cell: exact parity with the lax.scan
``rnn_ops.gru``, forward and backward, on CPU via interpret mode.  The
GRU cell is FullSubNet's non-default sequence_model="GRU" recurrence
(reference: tools_for_model.py:726-795)."""

import numpy as np

import jax
import jax.numpy as jnp

from se_tpu.ops import pallas_lstm
from se_tpu.ops import rnn as rnn_ops


def test_gru_inproj_matches_scan_f32():
    rng = np.random.default_rng(0)
    T, B, In, H = 12, 8, 24, 16
    x = jnp.asarray(rng.standard_normal((T, B, In)) * 0.5, jnp.float32)
    p = rnn_ops.init_gru_params(jax.random.PRNGKey(0), In, H)
    ys_ref, h_ref = rnn_ops.gru(p, x)
    ys_pl, h_pl = rnn_ops.gru(p, x, use_pallas=True)
    np.testing.assert_allclose(np.asarray(ys_ref), np.asarray(ys_pl),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_ref), np.asarray(h_pl),
                               atol=1e-6)


def test_gru_inproj_gradients_match_scan():
    """All six gradients (x, w_ih, b_ih, w_hh, b_hh via params, h0)."""
    rng = np.random.default_rng(1)
    T, B, In, H = 10, 6, 16, 16
    x = jnp.asarray(rng.standard_normal((T, B, In)) * 0.5, jnp.float32)
    p = rnn_ops.init_gru_params(jax.random.PRNGKey(1), In, H)
    h0 = jnp.asarray(rng.standard_normal((B, H)) * 0.1, jnp.float32)

    def lr(p, x, h0):
        ys, hT = rnn_ops.gru(p, x, h0)
        return jnp.sum(ys**2) + jnp.sum(hT)

    def lp(p, x, h0):
        ys, hT = rnn_ops.gru(p, x, h0, use_pallas=True)
        return jnp.sum(ys**2) + jnp.sum(hT)

    gr = jax.grad(lr, (0, 1, 2))(p, x, h0)
    gp = jax.grad(lp, (0, 1, 2))(p, x, h0)
    for a, b in zip(jax.tree_util.tree_leaves(gr),
                    jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_gru_inproj_state_carry_matches_scan():
    """Chunked execution with carried h equals one whole-sequence run."""
    rng = np.random.default_rng(2)
    T, B, In, H = 12, 4, 8, 16
    x = jnp.asarray(rng.standard_normal((T, B, In)) * 0.5, jnp.float32)
    p = rnn_ops.init_gru_params(jax.random.PRNGKey(2), In, H)
    ys_full, _ = rnn_ops.gru(p, x, use_pallas=True)
    y1, h = rnn_ops.gru(p, x[:5], use_pallas=True)
    y2, _ = rnn_ops.gru(p, x[5:], h, use_pallas=True)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([y1, y2], 0)), np.asarray(ys_full),
        atol=1e-6,
    )


def test_gru_inproj_padded_multi_tile(monkeypatch):
    """Batches that do not divide into 8-aligned VMEM tiles are padded
    with zero sequences and sliced back — exact vs the scan, gradients
    unpolluted by the padding rows."""
    rng = np.random.default_rng(3)
    orig = pallas_lstm.plan_batch
    monkeypatch.setattr(pallas_lstm, "plan_batch",
                        lambda bb, target=512: orig(bb, target=8))
    T, B, In, H = 7, 13, 8, 16
    x = jnp.asarray(rng.standard_normal((T, B, In)) * 0.5, jnp.float32)
    p = rnn_ops.init_gru_params(jax.random.PRNGKey(3), In, H)
    ys_ref, _ = rnn_ops.gru(p, x)
    ys_pl, _ = rnn_ops.gru(p, x, use_pallas=True)
    np.testing.assert_allclose(np.asarray(ys_ref), np.asarray(ys_pl),
                               atol=1e-6)

    def lr(p, x):
        return jnp.sum(rnn_ops.gru(p, x)[0] ** 2)

    def lp(p, x):
        return jnp.sum(rnn_ops.gru(p, x, use_pallas=True)[0] ** 2)

    gr = jax.grad(lr, (0, 1))(p, x)
    gp = jax.grad(lp, (0, 1))(p, x)
    for a, b in zip(jax.tree_util.tree_leaves(gr),
                    jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_gru_inproj_bf16_stream():
    """bf16 x keeps the mixed contract: bf16 emitted ys, f32 h carry."""
    rng = np.random.default_rng(4)
    T, B, In, H = 10, 8, 16, 16
    xf = jnp.asarray(rng.standard_normal((T, B, In)) * 0.5, jnp.float32)
    p = rnn_ops.init_gru_params(jax.random.PRNGKey(4), In, H)
    ys_ref, h_ref = rnn_ops.gru(p, xf.astype(jnp.bfloat16))
    ys_pl, h_pl = rnn_ops.gru(p, xf.astype(jnp.bfloat16), use_pallas=True)
    assert ys_pl.dtype == jnp.bfloat16
    assert h_pl.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(ys_ref, np.float32), np.asarray(ys_pl, np.float32),
        atol=2e-2,  # bf16 stream; scan projects in bf16, kernel in f32
    )
    np.testing.assert_allclose(
        np.asarray(h_ref, np.float32), np.asarray(h_pl, np.float32),
        atol=2e-2,
    )


def test_fullsubnet_gru_train_step_equal_with_and_without_pallas():
    """FullSubNet sequence_model="GRU" train step: same loss with the
    fused cell forced on (interpret) vs the scan."""
    from tests.test_models import small_cfg
    from se_tpu.train import create_train_state, make_train_step

    rng = np.random.default_rng(5)
    cfg0 = small_cfg(
        model="FullSubNet", loss="MSE", sequence_model="GRU"
    ).replace(use_pallas_lstm="off")
    cfg1 = cfg0.replace(use_pallas_lstm="on")
    m0, s0 = create_train_state(cfg0)
    m1, s1 = create_train_state(cfg1)
    L = cfg0.stft.fs
    noisy = jnp.asarray((rng.standard_normal((2, L)) * 0.1).astype(np.float32))
    clean = jnp.asarray((rng.standard_normal((2, L)) * 0.1).astype(np.float32))
    _, mt0 = make_train_step(cfg0, m0)(s0, noisy, clean, jax.random.PRNGKey(0))
    _, mt1 = make_train_step(cfg1, m1)(s1, noisy, clean, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(mt0["loss"]), float(mt1["loss"]),
                               rtol=1e-6)
