"""Pallas fused LSTM-stack scan cell for TPU.

The complex-LSTM bottleneck is a stack of L independent LSTMs scanned over
T~481 steps (se_tpu/ops/rnn.py).  As an XLA ``lax.scan`` each step costs
~9 us forward and ~33 us backward at DCCRN shapes — per-step launch and
residual traffic, not math (the per-step GEMM is [2B, H] x [H, 4H]).  This
kernel runs the WHOLE recurrence as one ``pallas_call``: the (h, c) carry
and the recurrent weights stay resident in VMEM, the x_proj stream is
pipelined HBM->VMEM by the sequential grid, and each step is one MXU dot
plus VPU gate math.

Semantics match ``rnn_ops._lstm_scan`` exactly: f32 carry and gate
arithmetic; x_proj and the emitted hidden stream keep the caller's dtype
(bf16 in the mixed-precision path).  The backward is a custom-VJP reverse
-grid kernel that recomputes the gates from (x_proj, h_prev) — nothing but
the cell state sequence is stashed — and accumulates dW_hh in VMEM.

reference for the recurrence being fused: tools_for_model.py:141-181.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False  # force-interpret override (tests)

# Storage dtype of the in-projection kernels' cell-state STASH (the
# backward's gate-recomputation input; the carry itself always stays
# f32 in VMEM).  bf16 halves the stash's HBM traffic — measured as a
# FullSubNet train lever (docs/PERF.md); f32 is the default because the
# end-to-end win is small and f32 keeps gradients bit-stable.
# Opt-in: SE_TPU_LSTM_CS_STASH=bfloat16 (read at import).
CS_STASH_DTYPE = (
    jnp.bfloat16
    if os.environ.get("SE_TPU_LSTM_CS_STASH") == "bfloat16"
    else jnp.float32
)


def _interpret() -> bool:
    """Pallas TPU kernels cannot execute on the CPU backend; interpret
    there (tests, CPU smoke runs) and compile on TPU."""
    return INTERPRET or jax.default_backend() != "tpu"


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def _fwd_kernel(xp_ref, whh_ref, h0_ref, c0_ref,
                ys_ref, cs_ref, hT_ref, cT_ref):
    t = pl.program_id(0)
    T = pl.num_programs(0)
    L, Bb, H = h0_ref.shape

    @pl.when(t == 0)
    def _():
        hT_ref[:] = h0_ref[:]
        cT_ref[:] = c0_ref[:]

    h = hT_ref[:]  # [L, Bb, H] f32 (output ref doubles as the carry)
    c = cT_ref[:]
    xp = xp_ref[0].astype(jnp.float32)  # [L, Bb, 4H]

    hh = jnp.stack(
        [
            jnp.dot(h[l], whh_ref[l], preferred_element_type=jnp.float32)
            for l in range(L)
        ]
    )
    gates = xp + hh
    i = _sigmoid(gates[..., 0 * H : 1 * H])
    f = _sigmoid(gates[..., 1 * H : 2 * H])
    g = jnp.tanh(gates[..., 2 * H : 3 * H])
    o = _sigmoid(gates[..., 3 * H : 4 * H])
    c = f * c + i * g
    h = o * jnp.tanh(c)
    hT_ref[:] = h
    cT_ref[:] = c
    ys_ref[0] = h.astype(ys_ref.dtype)
    cs_ref[0] = c.astype(cs_ref.dtype)


def _bwd_kernel(xp_ref, ysp_ref, cs_ref, csp_ref, dys_ref,
                whh_ref, h0_ref, c0_ref, dhT_ref, dcT_ref,
                dxp_ref, dwhh_ref, dh0_ref, dc0_ref):
    i_rev = pl.program_id(0)
    T = pl.num_programs(0)
    t = T - 1 - i_rev
    L, Bb, H = h0_ref.shape

    @pl.when(i_rev == 0)
    def _():
        dh0_ref[:] = dhT_ref[:]
        dc0_ref[:] = dcT_ref[:]
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)

    first = t == 0
    h_prev = jnp.where(first, h0_ref[:], ysp_ref[0].astype(jnp.float32))
    c_prev = jnp.where(first, c0_ref[:], csp_ref[0])

    # recompute the gates (cheaper than stashing them)
    xp = xp_ref[0].astype(jnp.float32)
    hh = jnp.stack(
        [
            jnp.dot(h_prev[l], whh_ref[l],
                    preferred_element_type=jnp.float32)
            for l in range(L)
        ]
    )
    gates = xp + hh
    i = _sigmoid(gates[..., 0 * H : 1 * H])
    f = _sigmoid(gates[..., 1 * H : 2 * H])
    g = jnp.tanh(gates[..., 2 * H : 3 * H])
    o = _sigmoid(gates[..., 3 * H : 4 * H])
    c_t = cs_ref[0]
    tanh_c = jnp.tanh(c_t)

    dh = dys_ref[0].astype(jnp.float32) + dh0_ref[:]
    do = dh * tanh_c * o * (1.0 - o)
    dc = dc0_ref[:] + dh * o * (1.0 - tanh_c * tanh_c)
    di = dc * g * i * (1.0 - i)
    df = dc * c_prev * f * (1.0 - f)
    dg = dc * i * (1.0 - g * g)
    dgates = jnp.concatenate([di, df, dg, do], axis=-1)  # [L, Bb, 4H]

    dxp_ref[0] = dgates.astype(dxp_ref.dtype)
    dh_new = jnp.stack(
        [
            jax.lax.dot_general(
                dgates[l], whh_ref[l],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for l in range(L)
        ]
    )
    dwhh_ref[:] = dwhh_ref[:] + jnp.stack(
        [
            jax.lax.dot_general(
                h_prev[l], dgates[l],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for l in range(L)
        ]
    )
    dh0_ref[:] = dh_new
    dc0_ref[:] = dc * f


def _fwd_call(x_proj, w_hh_t, h0, c0, need_cs=True):
    T, L, Bb, fourH = x_proj.shape
    H = fourH // 4
    grid = (T,)
    # inference never reads the cell-state stash: collapse it to one
    # revisited block so no [T, ...] buffer is allocated
    Tc = T if need_cs else 1
    cs_map = (lambda t: (t, 0, 0, 0)) if need_cs else (lambda t: (0, 0, 0, 0))
    ys, cs, hT, cT = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, L, Bb, fourH), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, H, fourH), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, Bb, H), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, Bb, H), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, L, Bb, H), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, Bb, H), cs_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, Bb, H), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, Bb, H), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, L, Bb, H), x_proj.dtype),
            jax.ShapeDtypeStruct((Tc, L, Bb, H), jnp.float32),
            jax.ShapeDtypeStruct((L, Bb, H), jnp.float32),
            jax.ShapeDtypeStruct((L, Bb, H), jnp.float32),
        ],
        interpret=_interpret(),
    )(x_proj, w_hh_t, h0, c0)
    return ys, cs, hT, cT


@partial(jax.custom_vjp, nondiff_argnums=())
def fused_lstm_scan(x_proj, w_hh_t, h0, c0):
    """x_proj [T, L, Bb, 4H] (+biases folded in), w_hh_t [L, H, 4H],
    h0/c0 [L, Bb, H] f32 -> (ys [T, L, Bb, H] in x_proj dtype,
    (hT, cT) f32).  Drop-in for rnn_ops._lstm_scan with f32 carry.

    The primal (inference) path skips the [T, L, Bb, H] cell-state
    stash — only the VJP forward (_fused_fwd) materialises it for the
    backward's gate recomputation."""
    ys, cs, hT, cT = _fwd_call(x_proj, w_hh_t, h0, c0, need_cs=False)
    return ys, (hT, cT)


def _fused_fwd(x_proj, w_hh_t, h0, c0):
    ys, cs, hT, cT = _fwd_call(x_proj, w_hh_t, h0, c0)
    return (ys, (hT, cT)), (x_proj, w_hh_t, h0, c0, ys, cs)


def _fused_bwd(res, grads):
    x_proj, w_hh_t, h0, c0, ys, cs = res
    dys, (dhT, dcT) = grads
    T, L, Bb, fourH = x_proj.shape
    H = fourH // 4
    grid = (T,)

    def rev(t):
        return (T - 1 - t, 0, 0, 0)

    def rev_prev(t):
        # block t-1 in forward time; clamped at 0 (h0/c0 is selected
        # inside the kernel for the first forward step)
        return (jnp.maximum(T - 2 - t, 0), 0, 0, 0)

    const3 = lambda t: (0, 0, 0)
    dxp, dwhh, dh0, dc0 = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, L, Bb, fourH), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, Bb, H), rev_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, Bb, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, Bb, H), rev_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, Bb, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, H, fourH), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, Bb, H), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, Bb, H), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, Bb, H), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, Bb, H), const3, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, L, Bb, fourH), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, H, fourH), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, Bb, H), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, Bb, H), const3, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, L, Bb, fourH), x_proj.dtype),
            jax.ShapeDtypeStruct((L, H, fourH), jnp.float32),
            jax.ShapeDtypeStruct((L, Bb, H), jnp.float32),
            jax.ShapeDtypeStruct((L, Bb, H), jnp.float32),
        ],
        interpret=_interpret(),
    )(x_proj, ys, cs, cs, dys, w_hh_t, h0, c0, dhT, dcT)
    return dxp, dwhh, dh0, dc0


fused_lstm_scan.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# In-kernel input projection variant.
#
# For wide batches with a SMALL input dimension (FullSubNet's sub-band
# model: Bb = B*257 sequences of In = 32), hoisting the input projection
# materialises x_proj [T, Bb, 4H] — gigabytes that OOM the chip long
# before the compute is a problem.  This variant streams x itself
# ([T, Bb, In], tiny) and computes the projection per step in VMEM; the
# only backward stash is (ys, cs).  The batch is tiled over a second grid
# dimension (independent sequences), with the T loop innermost so the
# (h, c) carry stays VMEM-resident per tile.
# ---------------------------------------------------------------------------


def _inproj_target(H: int) -> int:
    """Rows per tile for the in-projection kernels: the backward holds
    roughly 14 H-sized f32 vectors per row in VMEM (double-buffered
    streams, gate temporaries, carries), so the tile scales down with H
    to stay under the ~16 MB VMEM budget (measured: 464 rows at H=384
    needs 22 MB)."""
    return max(64, min(512, (4 * 1024 * 1024) // (H * 56)))


def plan_batch(bb: int, target: int = 512):
    """Batch tiling plan: (block, padded_batch).

    Mosaic requires the second-minor block dimension to be a multiple of
    8 OR equal to the full axis.  Small batches run as one full tile
    (no constraint, no padding); larger ones are padded up to
    ``block * n_tiles`` with an 8-aligned block near ``target`` rows
    (padding rows are independent zero sequences — sliced off after)."""
    if bb <= target:
        return bb, bb
    n_tiles = -(-bb // target)
    block = -(-bb // (n_tiles * 8)) * 8
    return block, block * n_tiles


def _fwd_inproj_kernel(x_ref, wih_ref, b_ref, whh_ref, h0_ref, c0_ref,
                       ys_ref, cs_ref, hT_ref, cT_ref):
    t = pl.program_id(1)
    L, bb, H = h0_ref.shape

    @pl.when(t == 0)
    def _():
        hT_ref[:] = h0_ref[:]
        cT_ref[:] = c0_ref[:]

    h = hT_ref[:]
    c = cT_ref[:]
    x = x_ref[0].astype(jnp.float32)  # [L, bb, In]
    gates = jnp.stack(
        [
            jnp.dot(x[l], wih_ref[l], preferred_element_type=jnp.float32)
            + jnp.dot(h[l], whh_ref[l], preferred_element_type=jnp.float32)
            for l in range(L)
        ]
    ) + b_ref[:][:, None, :]
    i = _sigmoid(gates[..., 0 * H : 1 * H])
    f = _sigmoid(gates[..., 1 * H : 2 * H])
    g = jnp.tanh(gates[..., 2 * H : 3 * H])
    o = _sigmoid(gates[..., 3 * H : 4 * H])
    c = f * c + i * g
    h = o * jnp.tanh(c)
    hT_ref[:] = h
    cT_ref[:] = c
    ys_ref[0] = h.astype(ys_ref.dtype)
    cs_ref[0] = c.astype(cs_ref.dtype)


def _bwd_inproj_kernel(x_ref, ysp_ref, cs_ref, csp_ref, dys_ref,
                       wih_ref, b_ref, whh_ref, h0_ref, c0_ref,
                       dhT_ref, dcT_ref,
                       dx_ref, dwih_ref, dbias_ref, dwhh_ref,
                       dh0_ref, dc0_ref):
    bidx = pl.program_id(0)
    i_rev = pl.program_id(1)
    T = pl.num_programs(1)
    t = T - 1 - i_rev
    L, bb, H = h0_ref.shape

    @pl.when((bidx == 0) & (i_rev == 0))
    def _():
        dwih_ref[:] = jnp.zeros_like(dwih_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)

    @pl.when(i_rev == 0)
    def _():
        dh0_ref[:] = dhT_ref[:]
        dc0_ref[:] = dcT_ref[:]

    first = t == 0
    h_prev = jnp.where(first, h0_ref[:], ysp_ref[0].astype(jnp.float32))
    c_prev = jnp.where(first, c0_ref[:], csp_ref[0].astype(jnp.float32))

    x = x_ref[0].astype(jnp.float32)
    gates = jnp.stack(
        [
            jnp.dot(x[l], wih_ref[l], preferred_element_type=jnp.float32)
            + jnp.dot(h_prev[l], whh_ref[l],
                      preferred_element_type=jnp.float32)
            for l in range(L)
        ]
    ) + b_ref[:][:, None, :]
    i = _sigmoid(gates[..., 0 * H : 1 * H])
    f = _sigmoid(gates[..., 1 * H : 2 * H])
    g = jnp.tanh(gates[..., 2 * H : 3 * H])
    o = _sigmoid(gates[..., 3 * H : 4 * H])
    c_t = cs_ref[0].astype(jnp.float32)
    tanh_c = jnp.tanh(c_t)

    dh = dys_ref[0].astype(jnp.float32) + dh0_ref[:]
    do = dh * tanh_c * o * (1.0 - o)
    dc = dc0_ref[:] + dh * o * (1.0 - tanh_c * tanh_c)
    di = dc * g * i * (1.0 - i)
    df = dc * c_prev * f * (1.0 - f)
    dg = dc * i * (1.0 - g * g)
    dgates = jnp.concatenate([di, df, dg, do], axis=-1)  # [L, bb, 4H]

    dx_ref[0] = jnp.stack(
        [
            jax.lax.dot_general(
                dgates[l], wih_ref[l],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for l in range(L)
        ]
    ).astype(dx_ref.dtype)
    dwih_ref[:] = dwih_ref[:] + jnp.stack(
        [
            jax.lax.dot_general(
                x[l], dgates[l],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for l in range(L)
        ]
    )
    dbias_ref[:] = dbias_ref[:] + jnp.sum(dgates, axis=1)
    dwhh_ref[:] = dwhh_ref[:] + jnp.stack(
        [
            jax.lax.dot_general(
                h_prev[l], dgates[l],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for l in range(L)
        ]
    )
    dh0_ref[:] = jnp.stack(
        [
            jax.lax.dot_general(
                dgates[l], whh_ref[l],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for l in range(L)
        ]
    )
    dc0_ref[:] = dc * f


def _inproj_call(x, w_ih_t, bias, w_hh_t, h0, c0, need_cs=True,
                 cs_dtype=None):
    cs_dtype = cs_dtype or CS_STASH_DTYPE
    T, L, Bb, In = x.shape
    H = w_hh_t.shape[1]
    fourH = 4 * H
    bb, padded = plan_batch(Bb, _inproj_target(H))
    if padded != Bb:
        pad = ((0, 0), (0, 0), (0, padded - Bb), (0, 0))
        x = jnp.pad(x, pad)
        h0 = jnp.pad(h0, ((0, 0), (0, padded - Bb), (0, 0)))
        c0 = jnp.pad(c0, ((0, 0), (0, padded - Bb), (0, 0)))
        Bb = padded
    grid = (Bb // bb, T)

    xmap = lambda b, t: (t, 0, b, 0)
    hmap = lambda b, t: (t, 0, b, 0)
    cmap3 = lambda b, t: (0, b, 0)
    wmap = lambda b, t: (0, 0, 0)
    bmap = lambda b, t: (0, 0)
    Tc = T if need_cs else 1
    cs_map = hmap if need_cs else (lambda b, t: (0, 0, b, 0))
    ys, cs, hT, cT = pl.pallas_call(
        _fwd_inproj_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, L, bb, In), xmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, In, fourH), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, fourH), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, H, fourH), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, bb, H), cmap3, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, bb, H), cmap3, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, L, bb, H), hmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, bb, H), cs_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, bb, H), cmap3, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, bb, H), cmap3, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, L, Bb, H), x.dtype),
            jax.ShapeDtypeStruct((Tc, L, Bb, H), cs_dtype),
            jax.ShapeDtypeStruct((L, Bb, H), jnp.float32),
            jax.ShapeDtypeStruct((L, Bb, H), jnp.float32),
        ],
        interpret=_interpret(),
    )(x, w_ih_t, bias, w_hh_t, h0, c0)
    return ys, cs, hT, cT



@jax.custom_vjp
def fused_lstm_scan_inproj(x, w_ih_t, bias, w_hh_t, h0, c0):
    """x [T, L, Bb, In], w_ih_t [L, In, 4H], bias [L, 4H] (b_ih + b_hh),
    w_hh_t [L, H, 4H], h0/c0 [L, Bb, H] f32 -> (ys [T, L, Bb, H] in x
    dtype, (hT, cT) f32).  Input projection computed per step in VMEM —
    nothing but (ys, cs) is stashed for the backward.  Batches beyond one
    VMEM tile are zero-padded to 8-aligned tiles internally."""
    Bb = x.shape[2]
    ys, cs, hT, cT = _inproj_call(x, w_ih_t, bias, w_hh_t, h0, c0,
                                  need_cs=False)
    return ys[:, :, :Bb], (hT[:, :Bb], cT[:, :Bb])


def _inproj_fwd(x, w_ih_t, bias, w_hh_t, h0, c0):
    Bb = x.shape[2]
    ys, cs, hT, cT = _inproj_call(x, w_ih_t, bias, w_hh_t, h0, c0)
    return (ys[:, :, :Bb], (hT[:, :Bb], cT[:, :Bb])), (
        x, w_ih_t, bias, w_hh_t, h0, c0, ys, cs)


def _inproj_bwd(res, grads):
    x, w_ih_t, bias, w_hh_t, h0, c0, ys, cs = res
    dys, (dhT, dcT) = grads
    T, L, Bb, In = x.shape
    H = w_hh_t.shape[1]
    fourH = 4 * H
    bb, padded = plan_batch(Bb, _inproj_target(H))
    if padded != Bb:
        pb = padded - Bb
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pb), (0, 0)))
        h0 = jnp.pad(h0, ((0, 0), (0, pb), (0, 0)))
        c0 = jnp.pad(c0, ((0, 0), (0, pb), (0, 0)))
        dys = jnp.pad(dys, ((0, 0), (0, 0), (0, pb), (0, 0)))
        dhT = jnp.pad(dhT, ((0, 0), (0, pb), (0, 0)))
        dcT = jnp.pad(dcT, ((0, 0), (0, pb), (0, 0)))
    BbP = padded
    grid = (BbP // bb, T)

    rev = lambda b, t: (T - 1 - t, 0, b, 0)
    rev_prev = lambda b, t: (jnp.maximum(T - 2 - t, 0), 0, b, 0)
    cmap3 = lambda b, t: (0, b, 0)
    wmap = lambda b, t: (0, 0, 0)
    bmap = lambda b, t: (0, 0)

    dx, dwih, dbias, dwhh, dh0, dc0 = pl.pallas_call(
        _bwd_inproj_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, L, bb, In), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, bb, H), rev_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, bb, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, bb, H), rev_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, bb, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, In, fourH), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, fourH), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, H, fourH), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, bb, H), cmap3, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, bb, H), cmap3, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, bb, H), cmap3, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, bb, H), cmap3, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, L, bb, In), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, In, fourH), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, fourH), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, H, fourH), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, bb, H), cmap3, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, bb, H), cmap3, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, L, BbP, In), x.dtype),
            jax.ShapeDtypeStruct((L, In, fourH), jnp.float32),
            jax.ShapeDtypeStruct((L, fourH), jnp.float32),
            jax.ShapeDtypeStruct((L, H, fourH), jnp.float32),
            jax.ShapeDtypeStruct((L, BbP, H), jnp.float32),
            jax.ShapeDtypeStruct((L, BbP, H), jnp.float32),
        ],
        interpret=_interpret(),
    )(x, ys, cs, cs, dys, w_ih_t, bias, w_hh_t, h0, c0, dhT, dcT)
    return (dx[:, :, :Bb], dwih, dbias, dwhh,
            dh0[:, :Bb], dc0[:, :Bb])


fused_lstm_scan_inproj.defvjp(_inproj_fwd, _inproj_bwd)


# ---------------------------------------------------------------------------
# GRU in-projection variant.
#
# Same motivation and structure as fused_lstm_scan_inproj, for torch GRU
# gate semantics (r, z, n with n = tanh(W_in x + b_in + r * (W_hn h +
# b_hn)), reference recurrence consumed via tools_for_model.py:726-795's
# SequenceModel("GRU")).  Unlike the LSTM the two bias vectors CANNOT be
# folded: the hidden-side n-gate projection is multiplied by r before the
# input-side term is added, so b_hh rides inside that product.  The only
# backward stash is ys (the GRU's h is its entire state).
# ---------------------------------------------------------------------------


def _gru_gates(x, h_prev, wih_ref, bih_ref, whh_ref, bhh_ref, H, L):
    """Shared forward gate math: returns (r, z, n, hp_n)."""
    xp = jnp.stack(
        [
            jnp.dot(x[l], wih_ref[l], preferred_element_type=jnp.float32)
            for l in range(L)
        ]
    ) + bih_ref[:][:, None, :]
    hp = jnp.stack(
        [
            jnp.dot(h_prev[l], whh_ref[l],
                    preferred_element_type=jnp.float32)
            for l in range(L)
        ]
    ) + bhh_ref[:][:, None, :]
    r = _sigmoid(xp[..., 0 * H : 1 * H] + hp[..., 0 * H : 1 * H])
    z = _sigmoid(xp[..., 1 * H : 2 * H] + hp[..., 1 * H : 2 * H])
    hp_n = hp[..., 2 * H : 3 * H]
    n = jnp.tanh(xp[..., 2 * H : 3 * H] + r * hp_n)
    return r, z, n, hp_n


def _fwd_gru_kernel(x_ref, wih_ref, bih_ref, whh_ref, bhh_ref, h0_ref,
                    ys_ref, hT_ref):
    t = pl.program_id(1)
    L, bb, H = h0_ref.shape

    @pl.when(t == 0)
    def _():
        hT_ref[:] = h0_ref[:]

    h = hT_ref[:]
    x = x_ref[0].astype(jnp.float32)
    r, z, n, _ = _gru_gates(x, h, wih_ref, bih_ref, whh_ref, bhh_ref, H, L)
    h = (1.0 - z) * n + z * h
    hT_ref[:] = h
    ys_ref[0] = h.astype(ys_ref.dtype)


def _bwd_gru_kernel(x_ref, ysp_ref, dys_ref,
                    wih_ref, bih_ref, whh_ref, bhh_ref, h0_ref, dhT_ref,
                    dx_ref, dwih_ref, dbih_ref, dwhh_ref, dbhh_ref,
                    dh0_ref):
    bidx = pl.program_id(0)
    i_rev = pl.program_id(1)
    T = pl.num_programs(1)
    t = T - 1 - i_rev
    L, bb, H = h0_ref.shape

    @pl.when((bidx == 0) & (i_rev == 0))
    def _():
        dwih_ref[:] = jnp.zeros_like(dwih_ref)
        dbih_ref[:] = jnp.zeros_like(dbih_ref)
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)
        dbhh_ref[:] = jnp.zeros_like(dbhh_ref)

    @pl.when(i_rev == 0)
    def _():
        dh0_ref[:] = dhT_ref[:]

    first = t == 0
    h_prev = jnp.where(first, h0_ref[:], ysp_ref[0].astype(jnp.float32))
    x = x_ref[0].astype(jnp.float32)
    r, z, n, hp_n = _gru_gates(
        x, h_prev, wih_ref, bih_ref, whh_ref, bhh_ref, H, L
    )

    dh = dys_ref[0].astype(jnp.float32) + dh0_ref[:]
    # h_t = (1 - z) n + z h_prev
    da_z = dh * (h_prev - n) * z * (1.0 - z)
    dn = dh * (1.0 - z)
    da_n = dn * (1.0 - n * n)
    da_r = da_n * hp_n * r * (1.0 - r)
    dxp = jnp.concatenate([da_r, da_z, da_n], axis=-1)        # [L, bb, 3H]
    dhp = jnp.concatenate([da_r, da_z, da_n * r], axis=-1)

    dx_ref[0] = jnp.stack(
        [
            jax.lax.dot_general(
                dxp[l], wih_ref[l],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for l in range(L)
        ]
    ).astype(dx_ref.dtype)
    dwih_ref[:] = dwih_ref[:] + jnp.stack(
        [
            jax.lax.dot_general(
                x[l], dxp[l],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for l in range(L)
        ]
    )
    dbih_ref[:] = dbih_ref[:] + jnp.sum(dxp, axis=1)
    dwhh_ref[:] = dwhh_ref[:] + jnp.stack(
        [
            jax.lax.dot_general(
                h_prev[l], dhp[l],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for l in range(L)
        ]
    )
    dbhh_ref[:] = dbhh_ref[:] + jnp.sum(dhp, axis=1)
    dh0_ref[:] = dh * z + jnp.stack(
        [
            jax.lax.dot_general(
                dhp[l], whh_ref[l],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for l in range(L)
        ]
    )


def _gru_call(x, w_ih_t, b_ih, w_hh_t, b_hh, h0):
    T, L, Bb, In = x.shape
    H = w_hh_t.shape[1]
    threeH = 3 * H
    bb, padded = plan_batch(Bb, _inproj_target(H))
    if padded != Bb:
        pb = padded - Bb
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pb), (0, 0)))
        h0 = jnp.pad(h0, ((0, 0), (0, pb), (0, 0)))
        Bb = padded
    grid = (Bb // bb, T)

    xmap = lambda b, t: (t, 0, b, 0)
    cmap3 = lambda b, t: (0, b, 0)
    wmap = lambda b, t: (0, 0, 0)
    bmap = lambda b, t: (0, 0)
    ys, hT = pl.pallas_call(
        _fwd_gru_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, L, bb, In), xmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, In, threeH), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, threeH), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, H, threeH), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, threeH), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, bb, H), cmap3, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, L, bb, H), xmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, bb, H), cmap3, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, L, Bb, H), x.dtype),
            jax.ShapeDtypeStruct((L, Bb, H), jnp.float32),
        ],
        interpret=_interpret(),
    )(x, w_ih_t, b_ih, w_hh_t, b_hh, h0)
    return ys, hT


@jax.custom_vjp
def fused_gru_scan_inproj(x, w_ih_t, b_ih, w_hh_t, b_hh, h0):
    """x [T, L, Bb, In], w_ih_t [L, In, 3H], b_ih/b_hh [L, 3H] (NOT
    foldable — b_hh's n-gate slice is multiplied by r), w_hh_t [L, H, 3H],
    h0 [L, Bb, H] f32 -> (ys [T, L, Bb, H] in x dtype, hT f32).  Torch
    GRU gate semantics; input projection per step in VMEM; only ys is
    stashed for the backward.  Batches beyond one VMEM tile are
    zero-padded to 8-aligned tiles internally."""
    Bb = x.shape[2]
    ys, hT = _gru_call(x, w_ih_t, b_ih, w_hh_t, b_hh, h0)
    return ys[:, :, :Bb], hT[:, :Bb]


def _gru_fwd(x, w_ih_t, b_ih, w_hh_t, b_hh, h0):
    Bb = x.shape[2]
    ys, hT = _gru_call(x, w_ih_t, b_ih, w_hh_t, b_hh, h0)
    return (ys[:, :, :Bb], hT[:, :Bb]), (
        x, w_ih_t, b_ih, w_hh_t, b_hh, h0, ys)


def _gru_bwd(res, grads):
    x, w_ih_t, b_ih, w_hh_t, b_hh, h0, ys = res
    dys, dhT = grads
    T, L, Bb, In = x.shape
    H = w_hh_t.shape[1]
    threeH = 3 * H
    bb, padded = plan_batch(Bb, _inproj_target(H))
    if padded != Bb:
        pb = padded - Bb
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pb), (0, 0)))
        h0 = jnp.pad(h0, ((0, 0), (0, pb), (0, 0)))
        dys = jnp.pad(dys, ((0, 0), (0, 0), (0, pb), (0, 0)))
        dhT = jnp.pad(dhT, ((0, 0), (0, pb), (0, 0)))
    BbP = padded
    grid = (BbP // bb, T)

    rev = lambda b, t: (T - 1 - t, 0, b, 0)
    rev_prev = lambda b, t: (jnp.maximum(T - 2 - t, 0), 0, b, 0)
    cmap3 = lambda b, t: (0, b, 0)
    wmap = lambda b, t: (0, 0, 0)
    bmap = lambda b, t: (0, 0)

    dx, dwih, dbih, dwhh, dbhh, dh0 = pl.pallas_call(
        _bwd_gru_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, L, bb, In), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, bb, H), rev_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, bb, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, In, threeH), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, threeH), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, H, threeH), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, threeH), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, bb, H), cmap3, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, bb, H), cmap3, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, L, bb, In), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, In, threeH), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, threeH), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, H, threeH), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, threeH), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, bb, H), cmap3, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, L, BbP, In), x.dtype),
            jax.ShapeDtypeStruct((L, In, threeH), jnp.float32),
            jax.ShapeDtypeStruct((L, threeH), jnp.float32),
            jax.ShapeDtypeStruct((L, H, threeH), jnp.float32),
            jax.ShapeDtypeStruct((L, threeH), jnp.float32),
            jax.ShapeDtypeStruct((L, BbP, H), jnp.float32),
        ],
        interpret=_interpret(),
    )(x, ys, dys, w_ih_t, b_ih, w_hh_t, b_hh, h0, dhT)
    return dx[:, :, :Bb], dwih, dbih, dwhh, dbhh, dh0[:, :Bb]


fused_gru_scan_inproj.defvjp(_gru_fwd, _gru_bwd)
