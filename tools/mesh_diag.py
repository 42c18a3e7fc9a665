"""Diagnose the 1-device-mesh train-step slowdown (tools/mesh_probe.py
measured mesh/jit = 0.13-0.16 for train, 1.00 for eval).

Variants timed, DCCRN bf16:
  a. plain jit, carried state (the bench headline path)
  b. mesh jit (dp.py), carried state (the slow one)
  c. mesh jit, UNCARRIED state (same state each call, no donation use)
  d. mesh jit, carried, no donation
  e. plain jit with in_shardings only

Run ON TPU: PYTHONPATH="/root/repo:$PYTHONPATH" python tools/mesh_diag.py
"""

import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa


def main():
    from se_tpu.config import Config
    from se_tpu.train import create_train_state, make_train_step
    from se_tpu.train.steps import train_step_body
    from se_tpu.parallel.dp import make_parallel_train_step
    from se_tpu.ops import rnn as rnn_ops

    B = 64
    cfg = Config(compute_dtype="bfloat16")
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    model, _ = create_train_state(cfg)
    L = cfg.stft.fs * 3
    noisy = jnp.asarray((rng.standard_normal((B, L)) * 0.1).astype(np.float32))
    clean = jnp.asarray((rng.standard_normal((B, L)) * 0.1).astype(np.float32))
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("data",))
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("data"))

    def bench(step, state, carry=True, n=10):
        out = step(state, noisy, clean, key)
        float(out[1]["loss"])
        s = out[0] if carry else state
        t0 = time.perf_counter()
        for _ in range(n):
            out = step(s, noisy, clean, key)
            if carry:
                s = out[0]
        float(out[1]["loss"])
        return B / ((time.perf_counter() - t0) / n)

    r = {}
    r["a_jit_carried"] = bench(make_train_step(cfg, model),
                               create_train_state(cfg)[1])
    r["b_mesh_carried"] = bench(
        make_parallel_train_step(cfg, model, mesh),
        jax.device_put(create_train_state(cfg)[1]),
    )
    # c: mesh, uncarried (cannot donate the reused state: fresh jit
    # without donation)
    body = train_step_body(cfg, model)

    def mk(donate, in_sh, out_sh):
        def step(state, i, t, k):
            with rnn_ops.shard_context(mesh, "data"):
                return body(state, i, t, k)
        return jax.jit(
            step,
            in_shardings=in_sh, out_shardings=out_sh,
            donate_argnums=(0,) if donate else (),
        )

    in_sh = (repl, bsh, bsh, repl)
    out_sh = (repl, repl)
    r["c_mesh_uncarried"] = bench(
        mk(False, in_sh, out_sh),
        jax.device_put(create_train_state(cfg)[1]),
        carry=False,
    )
    r["d_mesh_nodonate"] = bench(
        mk(False, in_sh, out_sh),
        jax.device_put(create_train_state(cfg)[1]),
    )
    r["e_mesh_inonly"] = bench(
        mk(True, in_sh, None),
        jax.device_put(create_train_state(cfg)[1]),
    )

    for k, v in r.items():
        print(f"{k:18s}: {v:8.1f} utt/s", flush=True)


if __name__ == "__main__":
    main()
