"""Overlap-add synthesis as a static-shape, XLA-fusable primitive.

The reference realises OLA as ``F.conv_transpose1d`` with an identity
"enframe" kernel (reference: tools_for_model.py:101-107).  On TPU a
transposed conv with a [win_len x win_len] identity kernel wastes MXU FLOPs;
instead we decompose each frame into ``R = ceil(N / hop)`` hop-sized blocks.
Block ``r`` of frame ``t`` lands at output offset ``(t + r) * hop``, so the
whole OLA is R shifted adds of contiguous [T * hop] vectors — pure VPU work
with static shapes, no scatter.
"""

from __future__ import annotations

import jax.numpy as jnp


def overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Overlap-add frames along the last axis.

    Args:
      frames: [..., T, N] frame matrix.
      hop: frame shift in samples.

    Returns:
      [..., (T - 1) * hop + N] synthesis signal.
    """
    *lead, T, N = frames.shape
    R = -(-N // hop)  # ceil
    n_pad = R * hop - N
    out_len = (T - 1) * hop + N

    if n_pad:
        frames = jnp.pad(frames, [(0, 0)] * len(lead) + [(0, 0), (0, n_pad)])

    # [..., T, R, hop] -> per-r contiguous [T * hop] strips
    blocks = frames.reshape(*lead, T, R, hop)
    full = (T - 1) * hop + R * hop  # padded output length
    out = jnp.zeros((*lead, full), frames.dtype)
    strip_len = T * hop
    for r in range(R):
        strip = blocks[..., :, r, :].reshape(*lead, strip_len)
        pad_left = r * hop
        pad_right = full - strip_len - pad_left
        out = out + jnp.pad(
            strip, [(0, 0)] * len(lead) + [(pad_left, pad_right)]
        )
    return out[..., :out_len]
