"""Sub-band unfold: split overlapped frequency neighbourhoods.

reference: tools_for_model.py:806-837 — reflect-pad the frequency axis and
extract, for every frequency bin, its (2n + 1)-wide neighbourhood across
all frames.  Instead of the reference's ``F.unfold`` im2col, this is ONE
gather over a precomputed [F, 2n+1] index matrix.  (A stack of 2n + 1
slices is mathematically identical but materialises every slice as a
separate [.., 1, T] temporary under downstream layout constraints —
XLA pads the unit axis to the 128-lane tile, 42 GB of temp at
FullSubNet B=64 on v5e; the single gather keeps one well-formed array.)
"""

from __future__ import annotations

import numpy as np
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
    # idx[f, j] = f + j in padded coords: windows[b, c, f, j, t]
    idx = np.arange(F)[:, None] + np.arange(size)[None, :]
    windows = jnp.take(xp, jnp.asarray(idx), axis=2)  # [B, C, F, 2n+1, T]
    return windows.transpose(0, 2, 1, 3, 4)  # [B, F, C, 2n+1, T]


def reduce_complexity_separately(
    sub_band_input: jnp.ndarray,
    full_band_output: jnp.ndarray,
) -> jnp.ndarray:
    """Three-way batch/frequency interleaved band dropping.

    reference: tools_for_model.py:840-878 (present in BaseModel but unused
    on the main path).  Splits the batch into three sub-batches, selects
    every third frequency (offset i+1, avoiding the padded first/last
    bins), and concatenates sub-band and full-band features.

    Args:
      sub_band_input: [B, F, C, F_s, T]
      full_band_output: [B, F, C, F_f, T]
    Returns:
      [B, F//3-ish, C, F_s + F_f, T]
    """
    batch_size = full_band_output.shape[0]
    n_freqs = full_band_output.shape[1]
    sub_batch_size = batch_size // 3
    final_selected = []
    for idx in range(3):
        b0, b1 = idx * sub_batch_size, (idx + 1) * sub_batch_size
        freq_indices = jnp.arange(idx + 1, n_freqs - 1, 3)
        fb = full_band_output[b0:b1][:, freq_indices]
        sb = sub_band_input[b0:b1][:, freq_indices]
        final_selected.append(jnp.concatenate([sb, fb], axis=-2))
    return jnp.concatenate(final_selected, axis=0)
