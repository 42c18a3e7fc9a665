"""Is the carried-mesh train-step slowdown dispatch-blocking (host) or
device-side?  Times each step() CALL (async dispatch should return in
~ms) separately from the final value fetch, for carried plain jit vs
carried mesh jit.

Run ON TPU: PYTHONPATH="/root/repo:$PYTHONPATH" python tools/mesh_diag4.py
"""

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
    from se_tpu.parallel.dp import make_parallel_train_step

    B = 64
    cfg = Config(compute_dtype="bfloat16")
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    model, _ = create_train_state(cfg)
    L = cfg.stft.fs * 3
    noisy = jnp.asarray((rng.standard_normal((B, L)) * 0.1).astype(np.float32))
    clean = jnp.asarray((rng.standard_normal((B, L)) * 0.1).astype(np.float32))
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("data",))

    def profile(name, step, state, n=8):
        state, m = step(state, noisy, clean, key)
        float(m["loss"])
        disp = []
        t_all = time.perf_counter()
        for _ in range(n):
            t0 = time.perf_counter()
            state, m = step(state, noisy, clean, key)
            disp.append(time.perf_counter() - t0)
        float(m["loss"])
        total = time.perf_counter() - t_all
        print(f"{name:10s}: dispatch ms per step "
              f"{[f'{d * 1e3:.0f}' for d in disp]}  total {total / n * 1e3:.0f}"
              f" ms/step", flush=True)

    profile("plain", make_train_step(cfg, model),
            create_train_state(cfg)[1])
    profile("mesh", make_parallel_train_step(cfg, model, mesh),
            jax.device_put(create_train_state(cfg)[1]))


if __name__ == "__main__":
    main()
