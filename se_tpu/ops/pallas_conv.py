"""Pallas TPU kernel: fused complex Conv2d for the DCCRN encoder.

The encoder's complex convs (kernel (5, 2), stride (2, 1), causal) have
small channel counts, so XLA's generic conv reaches a few percent of MXU
peak.  This kernel restructures each stage as an im2col GEMM:

  * grid over (doubled-batch, time tiles);
  * the time-kernel halo is handled with TWO differently-padded views of
    the input and the stride-2 frequency subsampling by EVEN/ODD phase
    de-interleaving outside the kernel — every in-kernel slice is unit
    stride (Mosaic cannot lower strided gathers);
  * patches [F_out * TT, C * 10] are built in VMEM from static slices and
    contracted against the reshaped stacked filters in ONE MXU dot; bias
    fused in the epilogue;
  * the doubled batch carries real|imag, so all four real products of the
    complex conv come from this single kernel.

The backward pass reuses the XLA transposed-conv formulation via
``jax.custom_vjp`` — gradients are the standard conv gradients.

``fused_complex_conv2d`` is a drop-in for the doubled-batch conv body of
``se_tpu.models.layers.ComplexConv2d`` (enable with
``Config(use_pallas_conv=True)``); correctness is pinned against the XLA
reference in tests/test_pallas_conv.py (interpret mode on CPU, native on
TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import conv as conv_ops

KF, KT = 5, 2  # DCCRN encoder kernel geometry
STRIDE_F = 2

# tap kf -> (parity, phase offset): freq 2*fo + kf - 2 for output bin fo
_TAPS = [("even", 0), ("odd", 0), ("even", 1), ("odd", 1), ("even", 2)]


def _kernel(xe0_ref, xo0_ref, xe1_ref, xo1_ref, w_ref, b_ref, y_ref,
            *, f_out: int, c: int):
    """One (batch row, time tile) program.

    x{e,o}{0,1}_ref: [1, C, Fp/2-ish, TT] phase-split freq views for time
      taps kt = 0 (previous sample) / 1 (current).
    w_ref: [KF * KT * C, Cop] filters, rows ordered (kf, kt, c) so each
      tap's [C, Cop] slab is contiguous.
    b_ref: [1, Cop].  y_ref: [1, F_out * TT, Cop].

    Ten accumulated MXU dot_generals (contraction over C on dim 0 of both
    operands) — no in-kernel transposes, which Mosaic cannot lower.
    """
    views = {
        ("even", 0): xe0_ref,
        ("odd", 0): xo0_ref,
        ("even", 1): xe1_ref,
        ("odd", 1): xo1_ref,
    }
    _, _, _, TT = xe0_ref.shape
    acc = None
    tap = 0
    for kf in range(KF):
        parity, off = _TAPS[kf]
        for kt in range(KT):
            xv = views[(parity, kt)][0, :, off : off + f_out, :]
            xv2 = xv.reshape(c, f_out * TT)
            w_tap = w_ref[tap * c : (tap + 1) * c, :]  # [C, Cop]
            y = jax.lax.dot_general(
                xv2, w_tap,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [F_out*TT, Cop]
            acc = y if acc is None else acc + y
            tap += 1
    y_ref[0] = (acc + b_ref[:]).astype(y_ref.dtype)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _pallas_conv(x, w, b, tt: int = 128, interpret: bool = False):
    """x: [B2, C, F, T]; w: [Co, C, KF, KT]; b: [Co] ->
    [B2, Co, F // 2, T] with causal time semantics.

    Mosaic tiling: time tile 128 (lanes), phase-split freq padded to a
    multiple of 8 (sublanes), output channels padded to 128."""
    B2, C, F, T = x.shape
    Co = w.shape[0]
    F_out = F // 2

    n_tiles = -(-T // tt)
    pad_t = n_tiles * tt - T
    Cop = _round_up(Co, 128)

    # freq pad 2|2, then phase de-interleave: even phase holds freqs
    # {-2, 0, 2, ...}, odd {-1, 1, 3, ...}; output bin fo reads even
    # offsets fo..fo+2 and odd offsets fo..fo+1 — all unit stride.
    base = jnp.pad(x, ((0, 0), (0, 0), (2, 2), (0, 0)))
    even = base[:, :, 0::2, :]  # [(F+4)/2] entries
    odd = base[:, :, 1::2, :]
    Fp2 = _round_up(even.shape[2], 8)
    even = jnp.pad(even, ((0, 0), (0, 0), (0, Fp2 - even.shape[2]), (0, 0)))
    odd = jnp.pad(odd, ((0, 0), (0, 0), (0, Fp2 - odd.shape[2]), (0, 0)))

    def time_views(a):
        a0 = jnp.pad(a, ((0, 0), (0, 0), (0, 0), (1, pad_t)))[..., : n_tiles * tt]
        a1 = jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, pad_t)))
        return a0, a1

    xe0, xe1 = time_views(even)
    xo0, xo1 = time_views(odd)

    # rows ordered (kf, kt, c): each tap's [C, Cop] slab is contiguous
    wr = jnp.asarray(w).transpose(2, 3, 1, 0).reshape(KF * KT * C, Co)
    wr = jnp.pad(wr, ((0, 0), (0, Cop - Co))).astype(x.dtype)
    br = jnp.pad(b, (0, Cop - Co)).reshape(1, Cop).astype(x.dtype)

    xspec = pl.BlockSpec((1, C, Fp2, tt), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        functools.partial(_kernel, f_out=F_out, c=C),
        grid=(B2, n_tiles),
        in_specs=[
            xspec, xspec, xspec, xspec,
            pl.BlockSpec((KF * KT * C, Cop), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cop), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, F_out * tt, Cop), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B2, n_tiles * F_out * tt, Cop), x.dtype
        ),
        interpret=interpret,
    )(xe0, xo0, xe1, xo1, wr, br)

    y = y.reshape(B2, n_tiles, F_out, tt, Cop)[..., :Co]
    y = y.transpose(0, 4, 2, 1, 3).reshape(B2, Co, F_out, n_tiles * tt)
    return y[..., :T]


def xla_reference(x, w, b):
    """Same math via XLA conv (causal time pad 1, freq pad 2)."""
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    return conv_ops.conv2d(xp, w, b, stride=(2, 1), padding=(2, 0))


@jax.custom_vjp
def fused_complex_conv2d(x, w, b):
    """Causal encoder conv: [B2, C, F, T] -> [B2, Co, F/2, T].

    Pallas forward; gradients via the standard XLA formulation.
    """
    return _pallas_conv(x, w, b)


def _fwd(x, w, b):
    return _pallas_conv(x, w, b), (x, w, b)


def _bwd(res, g):
    x, w, b = res
    _, vjp = jax.vjp(xla_reference, x, w, b)
    return vjp(g)


fused_complex_conv2d.defvjp(_fwd, _bwd)
