"""Pallas TPU kernel: fused complex Conv2d for the DCCRN encoder.

The encoder's complex convs (kernel (5, 2), stride (2, 1), causal) have
small channel counts, so XLA's generic conv reaches a few percent of MXU
peak.  This kernel restructures each stage as an im2col GEMM:

  * grid over (doubled-batch, time tiles);
  * the time-kernel halo is handled with TWO differently-padded views of
    the input, so every block is aligned (no overlapping BlockSpecs);
  * patches [F_out * TT, C * 10] are built in VMEM with static strided
    slices and contracted against the reshaped stacked filters in ONE
    MXU dot; bias is fused in the epilogue;
  * the doubled batch carries real|imag, so all four real products of the
    complex conv come from this single kernel.

The backward pass reuses the XLA transposed-conv formulation via
``jax.custom_vjp`` — gradients are the standard conv gradients.

``fused_complex_conv2d`` is a drop-in for the doubled-batch conv body of
``se_tpu.models.layers.ComplexConv2d``; correctness is pinned against the
XLA reference in tests/test_pallas_conv.py (interpret mode on CPU, native
on TPU).
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


def _kernel(x0_ref, x1_ref, w_ref, b_ref, y_ref, *, f_out: int, k_pad: int):
    """One (batch row, time tile) program.

    x0_ref / x1_ref: [1, C, Fp, TT] freq-padded input views for time
      taps kt = 0 (previous sample) and kt = 1 (current sample).
    w_ref: [Kp, Cop] reshaped zero-padded filters (c, kf, kt) row order.
    b_ref: [1, Cop].
    y_ref: [1, F_out * TT, Cop].
    """
    _, C, Fp, TT = x0_ref.shape

    views = (x0_ref[0], x1_ref[0])  # each [C, Fp, TT]
    cols = []
    for kf in range(KF):
        stop = kf + (f_out - 1) * STRIDE_F + 1
        for kt in range(KT):
            xv = views[kt][:, kf:stop:STRIDE_F, :]  # [C, F_out, TT]
            cols.append(xv)
    # [C, KF*KT, F_out, TT] -> rows (fo, t), cols (c, kf, kt)
    patches = jnp.stack(cols, axis=1)
    patches = patches.transpose(2, 3, 0, 1).reshape(
        f_out * TT, C * KF * KT
    )
    if k_pad > C * KF * KT:
        patches = jnp.pad(
            patches, ((0, 0), (0, k_pad - C * KF * KT))
        )
    y = jnp.dot(patches, w_ref[:], preferred_element_type=jnp.float32)
    y_ref[0] = (y + b_ref[:]).astype(y_ref.dtype)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _pallas_conv(x, w, b, tt: int = 128, interpret: bool = False):
    """x: [B2, C, F, T]; w: [Co, C, KF, KT]; b: [Co] ->
    [B2, Co, F // 2, T] with causal time semantics.

    Mosaic tiling: time tile 128 (lane dim), freq padded to a multiple of
    8 (sublane dim), output channels padded to 128 (zero filters)."""
    B2, C, F, T = x.shape
    Co = w.shape[0]
    F_out = F // 2

    n_tiles = -(-T // tt)
    pad_t = n_tiles * tt - T
    Fp = _round_up(F + 4, 8)
    Cop = _round_up(Co, 128)
    Kp = _round_up(C * KF * KT, 8)

    # view for kt=0 (x[t-1], causal zero at t=0) and kt=1 (x[t])
    base = jnp.pad(x, ((0, 0), (0, 0), (2, Fp - F - 2), (0, 0)))
    x0 = jnp.pad(base, ((0, 0), (0, 0), (0, 0), (1, pad_t)))[..., : n_tiles * tt]
    x1 = jnp.pad(base, ((0, 0), (0, 0), (0, 0), (0, pad_t)))

    wr = jnp.asarray(w).transpose(1, 2, 3, 0).reshape(C * KF * KT, Co)
    wr = jnp.pad(wr, ((0, Kp - C * KF * KT), (0, Cop - Co))).astype(x.dtype)
    br = jnp.pad(b, (0, Cop - Co)).reshape(1, Cop).astype(x.dtype)

    y = pl.pallas_call(
        functools.partial(_kernel, f_out=F_out, k_pad=Kp),
        grid=(B2, n_tiles),
        in_specs=[
            pl.BlockSpec((1, C, Fp, tt), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, Fp, tt), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, Cop), lambda i, j: (0, 0),
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
    )(x0, x1, wr, br)

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
