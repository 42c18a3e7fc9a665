"""Sub-band unfold: split overlapped frequency neighbourhoods.

reference: tools_for_model.py:806-837 — reflect-pad the frequency axis and
extract, for every frequency bin, its (2n + 1)-wide neighbourhood across
all frames.  Instead of the reference's ``F.unfold`` im2col, this is
2n + 1 static slices of the padded array stacked on a new axis — pure
layout work that XLA fuses with the consumer.
"""

from __future__ import annotations

import jax.numpy as jnp


def unfold(x: jnp.ndarray, num_neighbor: int) -> jnp.ndarray:
    """[B, C, F, T] -> [B, F, C, 2n+1, T] frequency-neighbourhood view."""
    assert x.ndim == 4, f"The dim of input is {x.ndim}. It should be four dim."
    B, C, F, T = x.shape
    if num_neighbor < 1:
        return x.transpose(0, 2, 1, 3).reshape(B, F, C, 1, T)

    pad = num_neighbor
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
    size = 2 * num_neighbor + 1
    # windows[j][b, c, f, t] = xp[b, c, f + j, t]
    windows = jnp.stack(
        [xp[:, :, j : j + F, :] for j in range(size)], axis=3
    )  # [B, C, F, 2n+1, T]
    return windows.transpose(0, 2, 1, 3, 4)  # [B, F, C, 2n+1, T]
