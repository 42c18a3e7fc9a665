"""Decisive bound probe for the FullSubNet sub-band recurrence.

docs/PERF.md round-3 concluded the sb recurrence is VPU-bound with ~2x
conceded headroom; tools/wavefront_probe.py showed layer-pipelining buys
only 1.08x (Mosaic already overlaps grid iterations) and
tools/vpu_probe.py showed sigmoid/tanh/exp all cost the same.  This
probe separates the remaining hypotheses by timing the REAL fused
in-projection forward kernel (se_tpu/ops/pallas_lstm.py geometry) with
its per-step VPU work progressively removed:

  real      — shipped gate math (f32 sigmoid/tanh)
  bf16gates — transcendentals evaluated on bf16 inputs (f32 carry kept)
  polyswap  — transcendentals replaced by a multiply (same slicing,
              same elementwise volume, zero transcendental cost)
  nogates   — no gate math at all: c/h updated from raw gate slices
              (pure dots + carry read/write + output store)

If polyswap ~ real: the bound is memory/scheduling, not transcendentals,
and the conceded ~2x is not claimable via gate math.  If polyswap
collapses but bf16gates doesn't: f32 transcendental rate is the wall.
If bf16gates collapses: ship bf16 gate evaluation behind a flag.

Run ON TPU: PYTHONPATH=. python tools/bound_probe.py [B] [T]
"""

import sys
import time
from functools import partial

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from se_tpu.ops import pallas_lstm as pk  # noqa: E402


def make_kernel(mode):
    def kernel(x_ref, wih_ref, b_ref, whh_ref, h0_ref, c0_ref,
               ys_ref, hT_ref, cT_ref):
        t = pl.program_id(1)
        H = h0_ref.shape[-1]

        @pl.when(t == 0)
        def _():
            hT_ref[:] = h0_ref[:]
            cT_ref[:] = c0_ref[:]

        h, c = hT_ref[:], cT_ref[:]
        x = x_ref[0].astype(jnp.float32)
        gates = (
            jnp.dot(x, wih_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(h, whh_ref[:], preferred_element_type=jnp.float32)
            + b_ref[0][None, :]
        )
        gi = gates[:, 0 * H:1 * H]
        gf = gates[:, 1 * H:2 * H]
        gg = gates[:, 2 * H:3 * H]
        go = gates[:, 3 * H:4 * H]
        if mode == "real":
            i, f = jax.nn.sigmoid(gi), jax.nn.sigmoid(gf)
            g, o = jnp.tanh(gg), jax.nn.sigmoid(go)
            cn = f * c + i * g
            hn = o * jnp.tanh(cn)
        elif mode == "bf16gates":
            # jax.nn.sigmoid on bf16 trips a Mosaic broadcast-type
            # verification error (f32 constant into bf16 vector), so
            # spell it with dtype-matched constants
            bf = jnp.bfloat16
            one = jnp.asarray(1.0, bf)

            def _sig(v):
                return one / (one + jnp.exp(-v.astype(bf)))

            i = _sig(gi).astype(jnp.float32)
            f = _sig(gf).astype(jnp.float32)
            g = jnp.tanh(gg.astype(bf)).astype(jnp.float32)
            o = _sig(go).astype(jnp.float32)
            cn = f * c + i * g
            hn = o * jnp.tanh(cn.astype(bf)).astype(jnp.float32)
        elif mode == "polyswap":
            i, f, g, o = gi * 0.25, gf * 0.25, gg * 0.5, go * 0.25
            cn = f * c + i * g
            hn = o * (cn * 0.5)
        elif mode == "nogates":
            cn = gf * c + gi
            hn = go
        else:
            raise ValueError(mode)
        hT_ref[:] = hn
        cT_ref[:] = cn
        ys_ref[0] = hn.astype(ys_ref.dtype)

    return kernel


def run(mode, x, wih, b, whh, h0, c0):
    T, Bb, In = x.shape
    H = whh.shape[0]
    bb, padded = pk.plan_batch(Bb, pk._inproj_target(H))
    assert padded == Bb, (Bb, padded)
    fourH = 4 * H
    wmap = lambda bidx, t: (0, 0)
    ys, hT, cT = pl.pallas_call(
        make_kernel(mode),
        grid=(Bb // bb, T),
        in_specs=[
            pl.BlockSpec((1, bb, In), lambda bidx, t: (t, bidx, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((In, fourH), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fourH), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, fourH), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, H), lambda bidx, t: (bidx, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, H), lambda bidx, t: (bidx, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bb, H), lambda bidx, t: (t, bidx, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, H), lambda bidx, t: (bidx, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, H), lambda bidx, t: (bidx, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, Bb, H), x.dtype),
            jax.ShapeDtypeStruct((Bb, H), jnp.float32),
            jax.ShapeDtypeStruct((Bb, H), jnp.float32),
        ],
        interpret=pk._interpret(),
    )(x, wih, b[None], whh, h0, c0)
    return ys, hT, cT


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 193
    F, In, H = 257, 32, 384
    Bb = B * F
    bb, padded = pk.plan_batch(Bb, pk._inproj_target(H))
    Bb = padded
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((T, Bb, In)) * 0.3, dt)
    wih = jnp.asarray(rng.standard_normal((In, 4 * H)) * 0.05, jnp.float32)
    whh = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.05, jnp.float32)
    b = jnp.zeros((4 * H,), jnp.float32)
    h0 = jnp.zeros((Bb, H), jnp.float32)
    c0 = jnp.zeros((Bb, H), jnp.float32)

    def bench(fn, n=20):
        out = fn(x, wih, b, whh, h0, c0)
        float(jnp.sum(out[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        h, c = h0, c0
        for _ in range(n):
            out = fn(x, wih, b, whh, h, c)
            h, c = out[1], out[2]
        float(jnp.sum(out[0].astype(jnp.float32)))
        return (time.perf_counter() - t0) / n * 1e3

    base = None
    for mode in ["real", "bf16gates", "polyswap", "nogates"]:
        f = jax.jit(partial(run, mode))
        ms = bench(f)
        if base is None:
            base = ms
        print(f"{mode:10s}: {ms:7.2f} ms  ({base / ms:.2f}x vs real)  "
              f"[B={B} T={T} Bb={Bb} bb={bb}]")


if __name__ == "__main__":
    main()
