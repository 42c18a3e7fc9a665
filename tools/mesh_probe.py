"""Mesh-overhead measurement on the real chip (VERDICT round-3 #5).

Runs the DCCRN bf16 train and eval steps twice — plain jit (bench.py's
path) and through parallel/dp.py's SPMD steps on a 1-device mesh — so
the sharding machinery's cost (NamedSharding plumbing, shard_map-wrapped
Pallas recurrences) is measured instead of extrapolated.

Run ON TPU: PYTHONPATH="/root/repo:$PYTHONPATH" python tools/mesh_probe.py [B]
"""

import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402


def main():
    from se_tpu.config import Config
    from se_tpu.train import create_train_state, make_train_step
    from se_tpu.train.steps import make_eval_step
    from se_tpu.parallel import replicate
    from se_tpu.parallel.dp import (
        make_parallel_train_step, make_parallel_eval_step,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    pallas = sys.argv[2] if len(sys.argv) > 2 else "auto"
    cfg = Config(compute_dtype="bfloat16", use_pallas_lstm=pallas)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    model, state = create_train_state(cfg)
    L = cfg.stft.fs * 3
    noisy = jnp.asarray((rng.standard_normal((B, L)) * 0.1).astype(np.float32))
    clean = jnp.asarray((rng.standard_normal((B, L)) * 0.1).astype(np.float32))

    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("data",))

    def bench_train(step, state, n=20):
        state, m = step(state, noisy, clean, key)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = step(state, noisy, clean, key)
        float(m["loss"])
        return B / ((time.perf_counter() - t0) / n)

    def bench_eval(step, state, n=20):
        m, _ = step(state, noisy, clean)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(n):
            m, _ = step(state, noisy, clean)
        float(m["loss"])
        return B / ((time.perf_counter() - t0) / n)

    # plain jit first (donation: make fresh states per run)
    r = {}
    r["train_jit"] = bench_train(make_train_step(cfg, model),
                                 create_train_state(cfg)[1])
    # replicate() (NamedSharding) placement, NOT bare device_put: the
    # carried state returns NamedSharding-replicated, and a mismatched
    # first-call sharding is a second jit signature (= mid-loop recompile)
    r["train_mesh1"] = bench_train(
        make_parallel_train_step(cfg, model, mesh),
        replicate(mesh, create_train_state(cfg)[1]),
    )
    r["eval_jit"] = bench_eval(make_eval_step(cfg, model), state)
    r["eval_mesh1"] = bench_eval(
        make_parallel_eval_step(cfg, model, mesh), replicate(mesh, state))

    for k, v in r.items():
        print(f"{k:12s}: {v:8.1f} utt/s", flush=True)
    print(f"train mesh/jit: {r['train_mesh1'] / r['train_jit']:.4f}  "
          f"eval mesh/jit: {r['eval_mesh1'] / r['eval_jit']:.4f}")


if __name__ == "__main__":
    main()
