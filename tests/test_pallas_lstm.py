"""Fused Pallas LSTM cell (se_tpu/ops/pallas_lstm.py): exact parity with
the lax.scan cells, forward and backward, on CPU via interpret mode
(the _interpret() guard runs the kernels interpreted off-TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from se_tpu.ops import rnn as rnn_ops
from se_tpu.ops import pallas_lstm


def _stack_params(In, H, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 2)
    return rnn_ops.LstmParams(*[
        jnp.stack([a, b]) for a, b in zip(
            rnn_ops.init_lstm_params(ks[0], In, H),
            rnn_ops.init_lstm_params(ks[1], In, H),
        )
    ])


def test_fused_stack_matches_scan_f32():
    rng = np.random.default_rng(0)
    T, B, In, H = 12, 8, 24, 16
    x = jnp.asarray(rng.standard_normal((T, B, In)) * 0.5, jnp.float32)
    p = _stack_params(In, H)
    ys_ref, fin_ref = rnn_ops.lstm_stack(p, x, return_state=True)
    ys_pl, fin_pl = rnn_ops.lstm_stack(
        p, x, return_state=True, use_pallas=True
    )
    np.testing.assert_allclose(np.asarray(ys_ref), np.asarray(ys_pl),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(fin_ref[0]), np.asarray(fin_pl[0]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(fin_ref[1]), np.asarray(fin_pl[1]),
                               atol=1e-6)


def test_fused_stack_matches_scan_mixed():
    rng = np.random.default_rng(1)
    T, B, In, H = 10, 8, 24, 16
    x = jnp.asarray(rng.standard_normal((T, B, In)) * 0.5, jnp.float32)
    p = _stack_params(In, H)
    y_ref = rnn_ops.lstm_stack(p, x, mixed_precision=True)
    y_pl = rnn_ops.lstm_stack(p, x, mixed_precision=True, use_pallas=True)
    assert y_pl.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y_ref, np.float32), np.asarray(y_pl, np.float32),
        atol=1e-6,
    )


def test_fused_stack_gradients_match_scan():
    rng = np.random.default_rng(2)
    T, B, In, H = 10, 6, 16, 16
    x = jnp.asarray(rng.standard_normal((T, B, In)) * 0.5, jnp.float32)
    p = _stack_params(In, H)

    def lr(p, x):
        return jnp.sum(rnn_ops.lstm_stack(p, x) ** 2)

    def lp(p, x):
        return jnp.sum(rnn_ops.lstm_stack(p, x, use_pallas=True) ** 2)

    gr = jax.grad(lr, (0, 1))(p, x)
    gp = jax.grad(lp, (0, 1))(p, x)
    for a, b in zip(jax.tree_util.tree_leaves(gr),
                    jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_fused_stack_state_roundtrip():
    """Carried (h0, c0) state matches the scan (streaming use)."""
    rng = np.random.default_rng(3)
    T, B, In, H = 8, 4, 16, 16
    x = jnp.asarray(rng.standard_normal((T, B, In)) * 0.5, jnp.float32)
    p = _stack_params(In, H)
    h0 = jnp.asarray(rng.standard_normal((2, B, H)) * 0.1, jnp.float32)
    c0 = jnp.asarray(rng.standard_normal((2, B, H)) * 0.1, jnp.float32)
    yr, fr = rnn_ops.lstm_stack(p, x, state=(h0, c0), return_state=True)
    yp, fp = rnn_ops.lstm_stack(p, x, state=(h0, c0), return_state=True,
                                use_pallas=True)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yp), atol=1e-6)
    np.testing.assert_allclose(np.asarray(fr[1]), np.asarray(fp[1]),
                               atol=1e-6)


def test_inproj_matches_hoisted_lstm():
    """Single-layer in-projection kernel == hoisted-x_proj scan lstm."""
    rng = np.random.default_rng(4)
    T, B, In, H = 10, 12, 8, 16
    x = jnp.asarray(rng.standard_normal((T, B, In)) * 0.5, jnp.float32)
    p = rnn_ops.init_lstm_params(jax.random.PRNGKey(0), In, H)
    ys_ref, fin_ref = rnn_ops.lstm(p, x)
    ys_pl, fin_pl = rnn_ops.lstm(p, x, use_pallas=True)
    np.testing.assert_allclose(np.asarray(ys_ref), np.asarray(ys_pl),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(fin_ref[0]), np.asarray(fin_pl[0]),
                               atol=1e-6)

    def lr(p, x):
        return jnp.sum(rnn_ops.lstm(p, x)[0] ** 2)

    def lp(p, x):
        return jnp.sum(rnn_ops.lstm(p, x, use_pallas=True)[0] ** 2)

    gr = jax.grad(lr, (0, 1))(p, x)
    gp = jax.grad(lp, (0, 1))(p, x)
    for a, b in zip(jax.tree_util.tree_leaves(gr),
                    jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_inproj_padded_multi_tile(monkeypatch):
    """Batches that do not divide into 8-aligned VMEM tiles are padded
    with zero sequences and sliced back — exact vs the scan."""
    rng = np.random.default_rng(5)
    orig = pallas_lstm.plan_batch
    monkeypatch.setattr(pallas_lstm, "plan_batch",
                        lambda bb, target=512: orig(bb, target=8))
    T, B, In, H = 7, 13, 8, 16
    assert pallas_lstm.plan_batch(13) == (8, 16)
    x = jnp.asarray(rng.standard_normal((T, B, In)) * 0.5, jnp.float32)
    p = rnn_ops.init_lstm_params(jax.random.PRNGKey(1), In, H)
    ys_ref, _ = rnn_ops.lstm(p, x)
    ys_pl, _ = rnn_ops.lstm(p, x, use_pallas=True)
    np.testing.assert_allclose(np.asarray(ys_ref), np.asarray(ys_pl),
                               atol=1e-6)

    def lr(p, x):
        return jnp.sum(rnn_ops.lstm(p, x)[0] ** 2)

    def lp(p, x):
        return jnp.sum(rnn_ops.lstm(p, x, use_pallas=True)[0] ** 2)

    gr = jax.grad(lr, (0, 1))(p, x)
    gp = jax.grad(lp, (0, 1))(p, x)
    for a, b in zip(jax.tree_util.tree_leaves(gr),
                    jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_plan_batch_properties():
    for bb in (13, 224, 256, 2056, 8224, 512, 513):
        block, padded = pallas_lstm.plan_batch(bb)
        assert padded >= bb and padded % block == 0
        assert block == padded or block % 8 == 0
        assert padded - bb < block  # bounded waste


def test_resolve_pallas_auto_off_on_cpu():
    assert rnn_ops.resolve_pallas("auto") is False  # tests run on CPU
    assert rnn_ops.resolve_pallas("on") and rnn_ops.resolve_pallas(True)
    assert not rnn_ops.resolve_pallas("off")


# ---------------------------------------------------------------------------
# SPMD mesh: the fused cells wrapped in jax.shard_map over the data axis
# (se_tpu/ops/rnn.py shard_context — entered by se_tpu/parallel/dp.py).
# ---------------------------------------------------------------------------


def _data_mesh():
    from jax.sharding import Mesh

    return Mesh(jax.devices(), ("data",))


def test_lstm_stack_matches_under_shard_map():
    """fused_lstm_scan via lstm_stack: forward + grads identical between
    no-mesh and the shard_map-wrapped dispatch (8-way batch shard)."""
    rng = np.random.default_rng(7)
    T, B, In, H = 10, 16, 16, 16
    x = jnp.asarray(rng.standard_normal((T, B, In)) * 0.5, jnp.float32)
    p = _stack_params(In, H)

    def loss(p, x):
        ys = rnn_ops.lstm_stack(p, x, use_pallas=True)
        return jnp.sum(ys**2)

    l1, g1 = jax.value_and_grad(loss, (0, 1))(p, x)
    mesh = _data_mesh()
    with rnn_ops.shard_context(mesh):
        l2, g2 = jax.jit(jax.value_and_grad(loss, (0, 1)))(p, x)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_lstm_inproj_matches_under_shard_map():
    """fused_lstm_scan_inproj via rnn_ops.lstm under shard_context."""
    rng = np.random.default_rng(8)
    T, B, In, H = 9, 16, 8, 16
    x = jnp.asarray(rng.standard_normal((T, B, In)) * 0.5, jnp.float32)
    p = rnn_ops.init_lstm_params(jax.random.PRNGKey(2), In, H)

    def loss(p, x):
        ys, (hT, cT) = rnn_ops.lstm(p, x, use_pallas=True)
        return jnp.sum(ys**2) + jnp.sum(hT) + jnp.sum(cT)

    l1, g1 = jax.value_and_grad(loss, (0, 1))(p, x)
    with rnn_ops.shard_context(_data_mesh()):
        l2, g2 = jax.jit(jax.value_and_grad(loss, (0, 1)))(p, x)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_gru_inproj_matches_under_shard_map():
    """fused_gru_scan_inproj via rnn_ops.gru under shard_context."""
    rng = np.random.default_rng(9)
    T, B, In, H = 9, 16, 8, 16
    x = jnp.asarray(rng.standard_normal((T, B, In)) * 0.5, jnp.float32)
    p = rnn_ops.init_gru_params(jax.random.PRNGKey(3), In, H)

    def loss(p, x):
        ys, hT = rnn_ops.gru(p, x, use_pallas=True)
        return jnp.sum(ys**2) + jnp.sum(hT)

    l1, g1 = jax.value_and_grad(loss, (0, 1))(p, x)
    with rnn_ops.shard_context(_data_mesh()):
        l2, g2 = jax.jit(jax.value_and_grad(loss, (0, 1)))(p, x)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_shard_context_falls_back_when_batch_indivisible():
    """B=6 over an 8-device mesh: the dispatch must fall back to the scan
    cell (shard_map would require divisibility) and still be correct."""
    rng = np.random.default_rng(10)
    T, B, In, H = 8, 6, 8, 16
    x = jnp.asarray(rng.standard_normal((T, B, In)) * 0.5, jnp.float32)
    p = rnn_ops.init_lstm_params(jax.random.PRNGKey(4), In, H)
    ys_ref, _ = rnn_ops.lstm(p, x)  # scan cell
    with rnn_ops.shard_context(_data_mesh()):
        ys_sm, _ = rnn_ops.lstm(p, x, use_pallas=True)
    np.testing.assert_allclose(np.asarray(ys_ref), np.asarray(ys_sm),
                               atol=1e-6)


def test_resolve_pallas_auto_under_mesh_context():
    """"auto" stays off on CPU even under a shard context (interpret mode
    is a slow-path only for tests); forcing works and dispatch shards."""
    with rnn_ops.shard_context(_data_mesh()):
        assert rnn_ops.resolve_pallas("auto") is False  # CPU backend
        assert rnn_ops.resolve_pallas("on") is True
    assert rnn_ops.current_shard_context() is None


def test_train_step_equal_with_and_without_pallas():
    """Tiny DCCRN and FullSubNet train steps: identical loss with the
    fused cell forced on (interpret) vs the scan."""
    from tests.test_models import small_cfg
    from se_tpu.train import create_train_state, make_train_step

    rng = np.random.default_rng(6)
    for model_name, loss in (("DCCRN", "SDR"), ("FullSubNet", "MSE")):
        cfg0 = small_cfg(model=model_name, loss=loss).replace(
            use_pallas_lstm="off"
        )
        cfg1 = cfg0.replace(use_pallas_lstm="on")
        m0, s0 = create_train_state(cfg0)
        m1, s1 = create_train_state(cfg1)
        L = cfg0.stft.fs
        noisy = jnp.asarray((rng.standard_normal((2, L)) * 0.1).astype(np.float32))
        clean = jnp.asarray((rng.standard_normal((2, L)) * 0.1).astype(np.float32))
        _, mt0 = make_train_step(cfg0, m0)(s0, noisy, clean, jax.random.PRNGKey(0))
        _, mt1 = make_train_step(cfg1, m1)(s1, noisy, clean, jax.random.PRNGKey(0))
        np.testing.assert_allclose(float(mt0["loss"]), float(mt1["loss"]),
                                   rtol=1e-6), model_name


def test_inproj_bf16_cs_stash_grads_close(monkeypatch):
    """SE_TPU_LSTM_CS_STASH=bfloat16 stores the backward's cell-state
    stash in bf16 (an HBM-traffic lever, docs/PERF.md); the carry and
    gate math stay f32, so gradients must stay within bf16-rounding
    distance of the f32-stash gradients (measured ~7e-4 relative)."""
    import jax
    import jax.numpy as jnp

    from se_tpu.ops import pallas_lstm

    T, L, Bb, In, H = 10, 1, 8, 8, 16
    r = np.random.default_rng(3)
    args = [
        jnp.asarray(a, jnp.float32)
        for a in (
            r.standard_normal((T, L, Bb, In)) * 0.5,
            r.standard_normal((L, In, 4 * H)) * 0.3,
            r.standard_normal((L, 4 * H)) * 0.1,
            r.standard_normal((L, H, 4 * H)) * 0.3,
            np.zeros((L, Bb, H)),
            np.zeros((L, Bb, H)),
        )
    ]

    def loss(*a):
        ys, (hT, cT) = pallas_lstm.fused_lstm_scan_inproj(*a)
        return jnp.sum(ys**2) + jnp.sum(hT**2)

    g32 = jax.grad(loss, argnums=(0, 1, 2, 3))(*args)
    monkeypatch.setattr(pallas_lstm, "CS_STASH_DTYPE", jnp.bfloat16)
    g16 = jax.grad(loss, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(g32, g16):
        scale = float(jnp.max(jnp.abs(a))) + 1e-12
        assert float(jnp.max(jnp.abs(a - b))) / scale < 5e-3
