"""PyTorch-parity 2-D convolution primitives on XLA.

The reference builds its encoder/decoder from ``nn.Conv2d`` /
``nn.ConvTranspose2d`` with causal time padding and ``output_padding``
(reference: tools_for_model.py:199-425).  These wrappers reproduce those
exact shape/semantic rules as ``lax.conv_general_dilated`` calls so XLA can
tile them onto the MXU; causal padding is applied by the caller.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return tuple(v)
    return (v, v)


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride=(1, 1),
    padding=(0, 0),
    dilation=(1, 1),
    groups: int = 1,
    precision=None,
) -> jnp.ndarray:
    """torch ``F.conv2d`` semantics: x [B,C,H,W], w [O,I/g,kh,kw].

    Weights are cast to the activation dtype (mixed-precision path: bf16
    activations with f32 master weights).
    """
    stride, padding, dilation = _pair(stride), _pair(padding), _pair(dilation)
    w = w.astype(x.dtype)
    b = b.astype(x.dtype) if b is not None else None
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NCHW", "OIHW", "NCHW"))
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        rhs_dilation=dilation,
        dimension_numbers=dn,
        feature_group_count=groups,
        precision=precision,
    )
    if b is not None:
        out = out + b[None, :, None, None]
    return out


def conv_transpose2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride=(1, 1),
    padding=(0, 0),
    output_padding=(0, 0),
    dilation=(1, 1),
    precision=None,
) -> jnp.ndarray:
    """torch ``F.conv_transpose2d`` semantics.

    x: [B, I, H, W]; w: [I, O, kh, kw] (torch ConvTranspose2d layout).
    Output spatial size: (H - 1) * s - 2p + d * (k - 1) + op + 1.

    Realised as an input-dilated convolution with the spatially flipped,
    in/out-swapped kernel — the standard fractionally-strided-conv
    identity, which XLA lowers to an MXU conv.
    """
    stride, padding = _pair(stride), _pair(padding)
    output_padding, dilation = _pair(output_padding), _pair(dilation)
    w = w.astype(x.dtype)
    b = b.astype(x.dtype) if b is not None else None
    kh, kw = w.shape[2], w.shape[3]

    # NOTE (measured, v5e): decomposing the freq-stride-2 transpose conv
    # into two stride-1 convs + row interleave is exact but SLOWER than the
    # lhs-dilated form XLA emits (227 vs 186 ms/step at B=40) and triggers
    # remote-compiler failures at B>=96 — keep the dilated form.
    w_t = jnp.flip(w, axis=(2, 3)).swapaxes(0, 1)  # [O, I, kh, kw]
    pads = []
    for k, p, op, d in zip(
        (kh, kw), padding, output_padding, dilation
    ):
        lo = d * (k - 1) - p
        hi = d * (k - 1) - p + op
        pads.append((lo, hi))

    dn = lax.conv_dimension_numbers(x.shape, w_t.shape, ("NCHW", "OIHW", "NCHW"))
    out = lax.conv_general_dilated(
        x,
        w_t,
        window_strides=(1, 1),
        padding=pads,
        lhs_dilation=stride,
        rhs_dilation=dilation,
        dimension_numbers=dn,
        precision=precision,
    )
    if b is not None:
        out = out + b[None, :, None, None]
    return out
