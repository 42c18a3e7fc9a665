"""PyTorch-parity 2-D convolution primitives on XLA.

The reference builds its encoder/decoder from ``nn.Conv2d`` /
``nn.ConvTranspose2d`` with causal time padding and ``output_padding``
(reference: tools_for_model.py:199-425).  These wrappers reproduce those
exact shape/semantic rules as ``lax.conv_general_dilated`` calls so XLA can
tile them onto the MXU; causal padding is applied by the caller.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return tuple(v)
    return (v, v)


@lru_cache(maxsize=32)
def _s2d_scatter(kh: int, r: int, sf: int, pf: int):
    """Constant one-hot scatter E[k, u, d, j] mapping kernel tap k at
    block-local output u to (block offset d, block-local input j):
    sf*u + k - pf == (d_min + d)*blk + j.  Returns (E, d_min, n_taps)."""
    blk = sf * r
    jmin = -pf
    jmax = sf * (r - 1) + kh - 1 - pf
    d_min = jmin // blk  # floor division: -1 for pf <= blk
    d_max = jmax // blk
    n_taps = d_max - d_min + 1
    E = np.zeros((kh, r, n_taps, blk), np.float32)
    for k in range(kh):
        for u in range(r):
            d, j = divmod(sf * u + k - pf - d_min * blk, blk)
            E[k, u, d, j] = 1.0
    return E, d_min, n_taps


def auto_s2d_r(c_in: int, kh: int, kw: int, f_in: int, stride_f: int = 2,
               k_target: int = 128, r_max: int = 16) -> int:
    """Pick the frequency fold for ``conv2d_freq_s2d``: the smallest
    power-of-two r that lifts the contraction C*(stride_f*r)*3*kw to
    ~k_target.  Returns 0 (disabled) when the direct conv is already
    MXU-deep (C*kh*kw >= k_target) or the geometry does not divide."""
    if c_in * kh * kw >= k_target:
        return 0
    r = 2
    while c_in * stride_f * r * 3 * kw < k_target and r < r_max:
        r *= 2
    return 0 if f_in % (stride_f * r) else r


def conv2d_freq_s2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    r: int = 4,
    stride=(2, 1),
    padding=(2, 0),
) -> jnp.ndarray:
    """``conv2d(x, w, b, stride, padding)`` for small channel counts,
    reformulated as a polyphase space-to-depth block conv so the MXU sees
    a real contraction.

    The frequency axis is folded into channels in blocks of ``sf*r``; each
    block of ``r`` output frequencies then depends on ``n_taps`` (usually 3)
    input blocks, giving ONE conv with contraction ``C*sf*r*n_taps*kw`` and
    output features ``O*r`` — MXU-sized where the direct form's
    ``C*kh*kw``-deep GEMM runs at percent-level utilisation (docs/PERF.md:
    the ci<=32 encoder stages).  FLOP inflation is ``n_taps*sf*r/kh`` (~6r/5
    for the (5,2)/(2,1) stages); the win is utilisation, not FLOPs.

    Exact-equivalence requirements (assert-checked): time padding already
    applied by the caller (padding[1] == 0), F divisible by ``sf*r``, and
    the conv's own zero padding must coincide with zero blocks — which
    holds whenever ``pf <= sf*r`` and ``F_out == F // sf``.
    """
    stride, padding = _pair(stride), _pair(padding)
    sf, st = stride
    pf, pt = padding
    assert st == 1 and pt == 0, "time axis must be pre-padded, stride 1"
    B, C, F, T = x.shape
    O, I, kh, kw = w.shape
    assert I == C
    blk = sf * r
    assert pf <= blk, (pf, blk)
    assert F % blk == 0, (F, blk)
    P = F // blk
    F_out = (F + 2 * pf - kh) // sf + 1
    assert F_out == r * P, (F_out, r, P)

    E, d_min, n_taps = _s2d_scatter(kh, r, sf, pf)
    # [O, r, C, blk, n_taps, kw] -> [O*r, C*blk, n_taps, kw]
    wblk = jnp.einsum("ockt,kudj->oucjdt", w, jnp.asarray(E))
    wblk = wblk.reshape(O * r, C * blk, n_taps, kw).astype(x.dtype)

    xb = x.reshape(B, C, P, blk, T).transpose(0, 1, 3, 2, 4)
    xb = xb.reshape(B, C * blk, P, T)
    dn = lax.conv_dimension_numbers(
        xb.shape, wblk.shape, ("NCHW", "OIHW", "NCHW")
    )
    out = lax.conv_general_dilated(
        xb,
        wblk,
        window_strides=(1, 1),
        padding=[(-d_min, n_taps - 1 + d_min), (0, 0)],
        dimension_numbers=dn,
    )  # [B, O*r, P, T-kw+1]
    out = out.reshape(B, O, r, P, out.shape[-1]).transpose(0, 1, 3, 2, 4)
    out = out.reshape(B, O, F_out, out.shape[-1])
    if b is not None:
        out = out + b.astype(x.dtype)[None, :, None, None]
    return out


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


def conv_transpose2d_freq_s2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    r: int = 4,
    stride=(2, 1),
    padding=(2, 0),
    output_padding=(1, 0),
) -> jnp.ndarray:
    """``conv_transpose2d`` for small OUTPUT channel counts via the
    space-to-depth GEMM: a transposed conv is exactly the adjoint of the
    matching forward conv (that is torch's definition of ConvTranspose2d),
    so this evaluates the vjp of ``conv2d_freq_s2d`` — whose transpose is
    another stride-1 block conv with the same MXU-sized GEMM shapes.

    x: [B, I, F, T]; w: [I, O, kh, kw] (torch ConvTranspose2d layout).
    Time axis must be unpadded (padding[1] == output_padding[1] == 0).
    """
    stride, padding = _pair(stride), _pair(padding)
    output_padding = _pair(output_padding)
    sf, st = stride
    pf, pt = padding
    opf, opt = output_padding
    assert st == 1 and pt == 0 and opt == 0
    B, I, F_in, T = x.shape
    _, O, kh, kw = w.shape
    f_out = (F_in - 1) * sf - 2 * pf + kh + opf
    t_out = T + kw - 1
    # torch ConvTranspose2d(I, O) with weight [I, O, kh, kw] is the adjoint
    # of Conv2d(O, I) whose OIHW weight is that same [I, O, kh, kw] tensor

    def fwd(z):
        return conv2d_freq_s2d(
            z, w, None, r=r, stride=(sf, 1), padding=(pf, 0)
        )

    zeros = jnp.zeros((B, O, f_out, t_out), x.dtype)
    _, pullback = jax.vjp(fwd, zeros)
    (out,) = pullback(x)
    if b is not None:
        out = out + b.astype(x.dtype)[None, :, None, None]
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
