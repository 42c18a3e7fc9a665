"""Isolate the carried-state mesh slowdown from the train body: time a
trivial jitted function with mesh shardings whose output feeds the next
call, vs the same function carried WITHOUT shardings, at two state sizes.

Run ON TPU: PYTHONPATH="/root/repo:$PYTHONPATH" python tools/mesh_diag2.py
"""

import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa


def main():
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("data",))
    repl = NamedSharding(mesh, P())

    for mb in (1, 32, 128):
        n_el = mb * 1024 * 1024 // 4
        x0 = jnp.zeros((n_el,), jnp.float32)

        def f(x):
            return x * 1.0001 + 1.0

        for name, jf, x in [
            ("plain", jax.jit(f), x0),
            ("mesh", jax.jit(f, in_shardings=repl, out_shardings=repl),
             jax.device_put(x0, repl)),
        ]:
            x_ = jf(x)
            float(x_[0])
            t0 = time.perf_counter()
            for _ in range(20):
                x_ = jf(x_)
            float(x_[0])
            ms = (time.perf_counter() - t0) / 20 * 1e3
            print(f"{mb:4d} MB {name:5s} carried: {ms:8.2f} ms/step "
                  f"(sharding={type(x_.sharding).__name__})", flush=True)


if __name__ == "__main__":
    main()
