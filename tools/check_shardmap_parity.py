"""Model-level parity checker: the fused Pallas cells under the 8-device
CPU mesh (shard_map, interpret mode) vs the single-device scan cell —
loss, one-step params and sharded eval for DCCRN + FullSubNet LSTM/GRU.

Standalone (slow) companion to tests/test_parallel.py's mesh tests:
run `PYTHONPATH=. python tools/check_shardmap_parity.py`."""
import os
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np

from se_tpu.parallel import make_mesh, shard_batch, replicate
from se_tpu.parallel.dp import make_parallel_train_step, make_parallel_eval_step
from se_tpu.train import create_train_state, make_train_step
from tests.test_models import small_cfg
from tests.test_train_step import _batch


def check(name, **kw):
    cfg_scan = small_cfg(use_pallas_lstm="off", **kw)
    cfg_pal = small_cfg(use_pallas_lstm="on", **kw)
    model, state = create_train_state(cfg_pal)
    noisy, clean = _batch(cfg_pal, batch=8)
    key = jax.random.PRNGKey(0)

    # scan-cell loss (ties the kernel path to the reference semantics)
    _, state0 = create_train_state(cfg_scan)
    scan_step = make_train_step(cfg_scan, model)
    _, m0 = scan_step(state0, noisy, clean, key)

    # single-device fused kernel (interpret)
    step = make_train_step(cfg_pal, model)
    s1, m1 = step(state, noisy, clean, key)
    np.testing.assert_allclose(
        float(m0["loss"]), float(m1["loss"]), rtol=2e-4)

    model2, state2 = create_train_state(cfg_pal)
    mesh = make_mesh()
    pstep = make_parallel_train_step(cfg_pal, model2, mesh)
    state2 = replicate(mesh, state2)
    ns, cs = shard_batch(mesh, noisy, clean)
    s2, m2 = pstep(state2, ns, cs, key)

    l1, l2 = float(m1["loss"]), float(m2["loss"])
    print(f"{name}: scan-loss {l1:.6f}  mesh+pallas-loss {l2:.6f}")
    np.testing.assert_allclose(l1, l2, rtol=2e-4)

    # params after one step.  atol floor = 2.5x the Adam step scale:
    # leaves with near-zero gradients get +-lr updates whose SIGN flips
    # on interpret-vs-shard_map roundoff (Adam normalises tiny grads to
    # full steps), so only differences beyond the per-step magnitude
    # are meaningful here; the loss/grad parity above is the real pin.
    lr = cfg_pal.train.learning_rate
    p1 = jax.tree_util.tree_leaves(s1.params)
    p2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=2.5 * lr)

    estep = make_parallel_eval_step(cfg_pal, model2, mesh)
    em, out = estep(s2, ns, cs)
    assert np.isfinite(float(em["loss"]))
    print(f"{name}: OK (eval loss {float(em['loss']):.6f})")


check("DCCRN complex LSTM", model="DCCRN", loss="SDR")
check("FullSubNet LSTM", model="FullSubNet", loss="MSE")
check("FullSubNet GRU", model="FullSubNet", loss="MSE",
      sequence_model="GRU")
print("ALL OK")
