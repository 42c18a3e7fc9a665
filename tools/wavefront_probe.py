"""Prototype probe: 2-layer wavefront LSTM kernel vs two sequential
fused in-projection kernels, on the FullSubNet sub-band shape.

Hypothesis (docs/PERF.md round-3 speed-of-light): each per-layer kernel
iteration serialises MXU dot -> VPU gates, so two stacked layers run
2*(MXU+VPU) per timestep; a wavefront iteration computing (layer1, t)
and (layer2, t-1) together lets Mosaic overlap layer2's VPU work with
layer1's MXU dot -> up to ~1.7x on the sb stack.

Run ON TPU: PYTHONPATH=. python tools/wavefront_probe.py [B] [T]
"""

import sys
import time
from functools import partial

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from se_tpu.ops import pallas_lstm as pk


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def _wavefront_fwd_kernel(x_ref, wih1_ref, b1_ref, whh1_ref,
                          wih2_ref, b2_ref, whh2_ref, h0_ref, c0_ref,
                          ys2_ref, ys1_ref, hT_ref, cT_ref, y1p_ref):
    t = pl.program_id(1)
    T = pl.num_programs(1) - 1
    _, bb, H = h0_ref.shape

    @pl.when(t == 0)
    def _():
        hT_ref[:] = h0_ref[:]
        cT_ref[:] = c0_ref[:]

    h1, h2 = hT_ref[0], hT_ref[1]
    c1, c2 = cT_ref[0], cT_ref[1]
    y1_prev = y1p_ref[:]

    # ---- layer 1 at step t (valid for t < T) ----
    x = x_ref[0].astype(jnp.float32)  # [bb, In]
    g1 = (
        jnp.dot(x, wih1_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(h1, whh1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[0][None, :]
    )
    i1 = _sigmoid(g1[:, 0 * H:1 * H])
    f1 = _sigmoid(g1[:, 1 * H:2 * H])
    gg1 = jnp.tanh(g1[:, 2 * H:3 * H])
    o1 = _sigmoid(g1[:, 3 * H:4 * H])
    c1n = f1 * c1 + i1 * gg1
    h1n = o1 * jnp.tanh(c1n)

    # ---- layer 2 at step t-1 (valid for t >= 1), input y1_prev ----
    g2 = (
        jnp.dot(y1_prev, wih2_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(h2, whh2_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[0][None, :]
    )
    i2 = _sigmoid(g2[:, 0 * H:1 * H])
    f2 = _sigmoid(g2[:, 1 * H:2 * H])
    gg2 = jnp.tanh(g2[:, 2 * H:3 * H])
    o2 = _sigmoid(g2[:, 3 * H:4 * H])
    c2n = f2 * c2 + i2 * gg2
    h2n = o2 * jnp.tanh(c2n)

    lane1 = t < T
    lane2 = t >= 1
    hT_ref[0] = jnp.where(lane1, h1n, h1)
    cT_ref[0] = jnp.where(lane1, c1n, c1)
    hT_ref[1] = jnp.where(lane2, h2n, h2)
    cT_ref[1] = jnp.where(lane2, c2n, c2)
    y1p_ref[:] = jnp.where(lane1, h1n, y1_prev)

    @pl.when(lane1)
    def _():
        ys1_ref[0] = h1n.astype(ys1_ref.dtype)

    @pl.when(lane2)
    def _():
        ys2_ref[0] = h2n.astype(ys2_ref.dtype)


def wavefront_lstm2(x, wih1, b1, whh1, wih2, b2, whh2, h0, c0,
                    interpret=None):
    T, Bb, In = x.shape
    Bb0 = Bb
    H = whh1.shape[0]
    bb, padded = pk.plan_batch(Bb, pk._inproj_target(H))
    if padded != Bb:
        pb = padded - Bb
        x = jnp.pad(x, ((0, 0), (0, pb), (0, 0)))
        h0 = jnp.pad(h0, ((0, 0), (0, pb), (0, 0)))
        c0 = jnp.pad(c0, ((0, 0), (0, pb), (0, 0)))
        Bb = padded
    grid = (Bb // bb, T + 1)
    fourH = 4 * H

    xmap = lambda b, t: (jnp.minimum(t, T - 1), b, 0)
    y2map = lambda b, t: (jnp.maximum(t - 1, 0), b, 0)
    y1map = lambda b, t: (jnp.minimum(t, T - 1), b, 0)
    cmap = lambda b, t: (0, b, 0)
    wmap = lambda b, t: (0, 0)
    ys2, ys1, hT, cT = pl.pallas_call(
        _wavefront_fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bb, In), xmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((In, fourH), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fourH), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, fourH), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, fourH), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fourH), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, fourH), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, bb, H), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, bb, H), cmap, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bb, H), y2map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bb, H), y1map, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, bb, H), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, bb, H), cmap, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, Bb, H), x.dtype),
            jax.ShapeDtypeStruct((T, Bb, H), x.dtype),
            jax.ShapeDtypeStruct((2, Bb, H), jnp.float32),
            jax.ShapeDtypeStruct((2, Bb, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bb, H), jnp.float32)],
        interpret=pk._interpret() if interpret is None else interpret,
    )(x, wih1, b1[None], whh1, wih2, b2[None], whh2, h0, c0)
    return (ys2[:, :Bb0], ys1[:, :Bb0], hT[:, :Bb0], cT[:, :Bb0])


def sequential_lstm2(x, wih1, b1, whh1, wih2, b2, whh2, h0, c0):
    """Today's path: two fused_lstm_scan_inproj calls."""
    ys1, (h1, c1) = pk.fused_lstm_scan_inproj(
        x[:, None], wih1[None], b1[None], whh1[None],
        h0[:1], c0[:1],
    )
    ys2, (h2, c2) = pk.fused_lstm_scan_inproj(
        ys1, wih2[None], b2[None], whh2[None], h0[1:], c0[1:],
    )
    return (ys2[:, 0], ys1[:, 0],
            jnp.concatenate([h1, h2], 0), jnp.concatenate([c1, c2], 0))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 193
    F, In, H = 257, 32, 384
    Bb = B * F
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((T, Bb, In)) * 0.3, dt)
    wih1 = jnp.asarray(rng.standard_normal((In, 4 * H)) * 0.05, jnp.float32)
    whh1 = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.05, jnp.float32)
    wih2 = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.05, jnp.float32)
    whh2 = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.05, jnp.float32)
    b1 = jnp.zeros((4 * H,), jnp.float32)
    b2 = jnp.zeros((4 * H,), jnp.float32)
    h0 = jnp.zeros((2, Bb, H), jnp.float32)
    c0 = jnp.zeros((2, Bb, H), jnp.float32)

    seq = jax.jit(sequential_lstm2)
    wav = jax.jit(wavefront_lstm2)

    # correctness first (small slice)
    xs = x[:8, :512].astype(jnp.float32)
    a = seq(xs, wih1, b1, whh1, wih2, b2, whh2, h0[:, :512], c0[:, :512])
    b_ = wav(xs, wih1, b1, whh1, wih2, b2, whh2, h0[:, :512], c0[:, :512])
    err = float(jnp.max(jnp.abs(a[0].astype(jnp.float32)
                                - b_[0].astype(jnp.float32))))
    err1 = float(jnp.max(jnp.abs(a[1].astype(jnp.float32)
                                 - b_[1].astype(jnp.float32))))
    print(f"max |ys2 diff| {err:.2e}  |ys1 diff| {err1:.2e}")
    assert err < 1e-4 and err1 < 1e-4

    def bench(fn, n=20):
        # pipelined: n dependent dispatches (h0 <- hT), ONE fetch — the
        # axon tunnel adds ~40 ms per round trip, so per-call fetches
        # would swamp the device time (docs/PERF.md streaming section)
        out = fn(x, wih1, b1, whh1, wih2, b2, whh2, h0, c0)
        float(jnp.sum(out[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        h, c = h0, c0
        for _ in range(n):
            out = fn(x, wih1, b1, whh1, wih2, b2, whh2, h, c)
            h, c = out[2], out[3]
        float(jnp.sum(out[0].astype(jnp.float32)))
        return (time.perf_counter() - t0) / n * 1e3

    ms_seq = bench(seq)
    ms_wav = bench(wav)
    print(f"B={B} T={T} Bb={Bb}: sequential {ms_seq:.2f} ms | "
          f"wavefront {ms_wav:.2f} ms | speedup {ms_seq / ms_wav:.2f}x")


if __name__ == "__main__":
    main()
