"""Multi-chip data parallelism on the 8-device virtual CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from se_tpu.parallel import make_mesh, shard_batch, replicate
from se_tpu.parallel.dp import make_parallel_train_step, make_parallel_eval_step
from se_tpu.train import create_train_state, make_train_step
from tests.test_models import small_cfg
from tests.test_train_step import _batch


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_dp_train_step_runs_and_matches_single_device():
    cfg = small_cfg(model="CRN", lstm="real", loss="MSE")
    model, state = create_train_state(cfg)
    noisy, clean = _batch(cfg, batch=8)
    key = jax.random.PRNGKey(0)

    # single-device result
    single_step = make_train_step(cfg, model)
    _, m_single = single_step(state, noisy, clean, key)

    # 8-way data-parallel result
    model2, state2 = create_train_state(cfg)
    mesh = make_mesh()
    pstep = make_parallel_train_step(cfg, model2, mesh)
    state2 = replicate(mesh, state2)
    noisy_s, clean_s = shard_batch(mesh, noisy, clean)
    state2, m_par = pstep(state2, noisy_s, clean_s, key)

    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_par["loss"]), rtol=1e-4
    )


def test_dp_eval_step_sharded_outputs():
    cfg = small_cfg(model="CRN", lstm="real", loss="MSE")
    model, state = create_train_state(cfg)
    mesh = make_mesh()
    state = replicate(mesh, state)
    noisy, clean = _batch(cfg, batch=8)
    noisy_s, clean_s = shard_batch(mesh, noisy, clean)
    pstep = make_parallel_eval_step(cfg, model, mesh)
    metrics, outputs = pstep(state, noisy_s, clean_s)
    assert outputs.shape == (8, noisy.shape[-1])
    assert np.isfinite(float(metrics["loss"]))


def test_dp_multiple_steps_keep_state_replicated():
    cfg = small_cfg(model="DCCRN", loss="SDR")
    model, state = create_train_state(cfg)
    mesh = make_mesh()
    pstep = make_parallel_train_step(cfg, model, mesh)
    state = replicate(mesh, state)
    noisy, clean = _batch(cfg, batch=8)
    noisy_s, clean_s = shard_batch(mesh, noisy, clean)
    losses = []
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, metrics = pstep(state, noisy_s, clean_s, sub)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # replicate()-placed initial state + carried NamedSharding outputs are
    # ONE jit signature.  A bare device_put initial state makes the first
    # carried call a second signature, i.e. a full mid-training recompile
    # (~18.5 s for DCCRN on the v5e — docs/PERF.md "mesh overhead").
    assert pstep._cache_size() == 1, (
        "carried mesh train step recompiled: initial-state sharding does "
        "not match the carried state's NamedSharding"
    )


def _loss_of(step, *args):
    out = step(*args)
    return float(out[1]["loss"] if isinstance(out, tuple) else out["loss"])


def test_dp_dccrn_keeps_fused_pallas_cells():
    """The headline ask: the fused Pallas complex-LSTM cell stays ON under
    the data-parallel mesh (shard_map-wrapped, interpret mode on CPU) and
    matches the scan-cell single-device loss."""
    cfg = small_cfg(model="DCCRN", loss="SDR", use_pallas_lstm="on")
    cfg_scan = cfg.replace(use_pallas_lstm="off")
    model, state = create_train_state(cfg)
    noisy, clean = _batch(cfg, batch=8)
    key = jax.random.PRNGKey(0)

    single_step = make_train_step(cfg_scan, model)
    _, m_single = single_step(state, noisy, clean, key)

    model2, state2 = create_train_state(cfg)
    mesh = make_mesh()
    pstep = make_parallel_train_step(cfg, model2, mesh)
    state2 = replicate(mesh, state2)
    noisy_s, clean_s = shard_batch(mesh, noisy, clean)
    state2, m_par = pstep(state2, noisy_s, clean_s, key)
    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_par["loss"]), rtol=2e-4
    )

    # and it trains: loss decreases over a few steps
    losses = [float(m_par["loss"])]
    for i in range(2):
        state2, m_par = pstep(state2, noisy_s, clean_s,
                              jax.random.PRNGKey(i + 1))
        losses.append(float(m_par["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("seq", ["LSTM", "GRU"])
def test_dp_fullsubnet_fused_cells_under_mesh(seq):
    """FullSubNet's sub-band recurrence (the kernel whose scan fallback
    cannot compile at real batches) runs fused under the mesh, both cell
    types, train + eval."""
    cfg = small_cfg(model="FullSubNet", loss="MSE", sequence_model=seq,
                    use_pallas_lstm="on")
    cfg_scan = cfg.replace(use_pallas_lstm="off")
    model, state = create_train_state(cfg)
    noisy, clean = _batch(cfg, batch=8)
    key = jax.random.PRNGKey(0)

    _, m_single = make_train_step(cfg_scan, model)(state, noisy, clean, key)

    model2, state2 = create_train_state(cfg)
    mesh = make_mesh()
    pstep = make_parallel_train_step(cfg, model2, mesh)
    state2 = replicate(mesh, state2)
    noisy_s, clean_s = shard_batch(mesh, noisy, clean)
    state2, m_par = pstep(state2, noisy_s, clean_s, key)
    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_par["loss"]), rtol=2e-4
    )

    estep = make_parallel_eval_step(cfg, model2, mesh)
    metrics, outputs = estep(state2, noisy_s, clean_s)
    assert outputs.shape == (8, noisy.shape[-1])
    assert np.isfinite(np.asarray(outputs)).all()


@pytest.mark.parametrize("perceptual", ["LMS", "PMSQE"])
def test_dp_perceptual_variants_under_mesh(perceptual):
    """The perceptual trainer modes (reference trainer.py:45-82) share the
    step body with the single-device path, so they must run and match it
    under the data-parallel mesh too — the mel/bark machinery traces in
    global-view jit over a sharded batch."""
    cfg = small_cfg(model="DCCRN", loss="SDR", perceptual=perceptual)
    model, state = create_train_state(cfg)
    noisy, clean = _batch(cfg, batch=8)
    key = jax.random.PRNGKey(0)
    _, m_single = make_train_step(cfg, model)(state, noisy, clean, key)

    model2, state2 = create_train_state(cfg)
    mesh = make_mesh()
    pstep = make_parallel_train_step(cfg, model2, mesh)
    state2 = replicate(mesh, state2)
    noisy_s, clean_s = shard_batch(mesh, noisy, clean)
    state2, m_par = pstep(state2, noisy_s, clean_s, key)
    for k in ("loss", "main_loss", "perceptual_loss"):
        np.testing.assert_allclose(
            float(m_single[k]), float(m_par[k]), rtol=2e-4, err_msg=k
        )


def test_dp_grad_accum_with_fused_cells():
    """grad_accum micro-batching composes with the shard_map-wrapped
    kernels (shard_map inside lax.scan inside pjit)."""
    cfg = small_cfg(model="DCCRN", loss="SDR", use_pallas_lstm="on")
    cfg = cfg.replace(train=cfg.train.__class__(grad_accum=2))
    model, state = create_train_state(cfg)
    mesh = make_mesh()
    pstep = make_parallel_train_step(cfg, model, mesh)
    state = replicate(mesh, state)
    noisy, clean = _batch(cfg, batch=16)
    noisy_s, clean_s = shard_batch(mesh, noisy, clean)
    state, metrics = pstep(state, noisy_s, clean_s, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_dp_fullsubnet_train_and_eval():
    """FullSubNet under the mesh: dropout rngs + cIRM decode with sharded
    batches."""
    cfg = small_cfg(model="FullSubNet", loss="MSE")
    model, state = create_train_state(cfg)
    mesh = make_mesh()
    state = replicate(mesh, state)
    noisy, clean = _batch(cfg, batch=8)
    noisy_s, clean_s = shard_batch(mesh, noisy, clean)
    pstep = make_parallel_train_step(cfg, model, mesh)
    state, metrics = pstep(state, noisy_s, clean_s, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    estep = make_parallel_eval_step(cfg, model, mesh)
    metrics, outputs = estep(state, noisy_s, clean_s)
    assert outputs.shape == (8, noisy.shape[-1])
    assert np.isfinite(np.asarray(outputs)).all()
