"""VPU transcendental-throughput probe for the sub-band recurrence bound.

Measures, via standalone Pallas kernels at the sub-band tile shape:
1. sigmoid vs tanh-form sigmoid (0.5*tanh(x/2)+0.5) vs exp cost,
2. a 'gates-only' kernel executing exactly the per-step VPU work of the
   fused LSTM cell (no dots, no recurrence) over the same total volume —
   the VPU-imposed lower bound for the whole recurrence,
3. a 'dots-only' kernel with just the two MXU projections — the MXU bound.

Run ON TPU: PYTHONPATH=. python tools/vpu_probe.py
"""

import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

BB, H, STEPS = 176, 384, 193 * 8  # one sb batch tile, 8 tiles' volume


def _run(kernel, n_out_h, steps, *arrs):
    outs = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(a.shape, lambda t: (0,) * a.ndim,
                         memory_space=pltpu.VMEM)
            for a in arrs
        ],
        out_specs=pl.BlockSpec((BB, n_out_h), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BB, n_out_h), jnp.float32),
    )(*arrs)
    return outs


def bench(fn, *arrs, n=5):
    f = jax.jit(fn)
    out = f(*arrs)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*arrs)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.standard_normal((BB, 4 * H)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((BB, H)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((BB, 32)), jnp.bfloat16)
    h = jnp.asarray(rng.standard_normal((BB, H)), jnp.float32)
    wih = jnp.asarray(rng.standard_normal((32, 4 * H)) * 0.05, jnp.float32)
    whh = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.05, jnp.float32)

    # 1. transcendental forms over the same gate volume
    def k_sig(g_ref, o_ref):
        o_ref[:] = jax.nn.sigmoid(g_ref[:][:, : H])

    def k_tanh(g_ref, o_ref):
        o_ref[:] = jnp.tanh(g_ref[:][:, : H])

    def k_sig_tanh(g_ref, o_ref):
        o_ref[:] = 0.5 * jnp.tanh(g_ref[:][:, : H] * 0.5) + 0.5

    def k_exp(g_ref, o_ref):
        o_ref[:] = jnp.exp(g_ref[:][:, : H])

    for name, k in [("sigmoid", k_sig), ("tanh", k_tanh),
                    ("0.5*tanh+0.5", k_sig_tanh), ("exp", k_exp)]:
        ms = bench(lambda g: _run(k, H, STEPS, g), g)
        per = ms * 1e6 / (STEPS * BB * H)  # ns per element
        print(f"{name:14s}: {ms:8.2f} ms  ({per:.3f} ns/elem)")

    # 2. full per-step gate math (the fused cell's VPU work, no dots)
    def k_gates(g_ref, c_ref, o_ref):
        gg = g_ref[:]
        i = jax.nn.sigmoid(gg[:, 0 * H:1 * H])
        f = jax.nn.sigmoid(gg[:, 1 * H:2 * H])
        gt = jnp.tanh(gg[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gg[:, 3 * H:4 * H])
        cn = f * c_ref[:] + i * gt
        o_ref[:] = o * jnp.tanh(cn)

    ms_gates = bench(lambda g, c: _run(k_gates, H, STEPS, g, c), g, c)
    print(f"gates-only    : {ms_gates:8.2f} ms   <- VPU bound for the "
          f"whole sb recurrence volume")

    # 3. the two dots only (MXU bound)
    def k_dots(x_ref, h_ref, wih_ref, whh_ref, o_ref):
        o_ref[:] = (
            jnp.dot(x_ref[:].astype(jnp.float32), wih_ref[:],
                    preferred_element_type=jnp.float32)
            + jnp.dot(h_ref[:], whh_ref[:],
                      preferred_element_type=jnp.float32)
        )

    ms_dots = bench(
        lambda x, h, wih, whh: _run(k_dots, 4 * H, STEPS, x, h, wih, whh),
        x, h, wih, whh,
    )
    print(f"dots-only     : {ms_dots:8.2f} ms   <- MXU bound")
    print(f"sum           : {ms_gates + ms_dots:8.2f} ms; measured fused "
          f"kernel ~{56*8/47:.1f} ms/2 layers at this volume "
          f"(tools/wavefront_probe, scaled 8/47)")


if __name__ == "__main__":
    main()
