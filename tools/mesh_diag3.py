"""Leaf-count scaling of carried mesh-jit dispatch on this backend.

Run ON TPU: PYTHONPATH="/root/repo:$PYTHONPATH" python tools/mesh_diag3.py
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

    for n_leaves in (8, 64, 512):
        xs0 = [jnp.full((128, 128), float(i)) for i in range(n_leaves)]

        def f(xs):
            return [x * 1.0001 + 1.0 for x in xs]

        for name, jf, xs in [
            ("plain", jax.jit(f), xs0),
            ("mesh", jax.jit(f, in_shardings=repl, out_shardings=repl),
             jax.device_put(xs0, repl)),
        ]:
            xs_ = jf(xs)
            float(xs_[0][0, 0])
            t0 = time.perf_counter()
            for _ in range(10):
                xs_ = jf(xs_)
            float(xs_[0][0, 0])
            ms = (time.perf_counter() - t0) / 10 * 1e3
            print(f"{n_leaves:4d} leaves {name:5s} carried: {ms:8.2f} ms/step",
                  flush=True)


if __name__ == "__main__":
    main()
