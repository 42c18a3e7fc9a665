"""LMS perceptual loss: multi-scale log-mel spectral RMSE.

reference: tools_for_loss.py:100-249.  Differences from the reference,
both deliberate and documented:

* The mel filterbanks are **precomputed once** per (scales, fft_size)
  instead of being rebuilt on every call (reference quirk at
  tools_for_loss.py:194-198).
* The reference feeds ``[F, T]`` magnitude arrays through
  ``x.view(-1, FFT_SIZE // 2 + 1)`` (tools_for_loss.py:203), which for
  T != F reinterprets *row-major chunks* of the freq-major array as
  spectra — i.e. each "spectrum" row mixes several frequency rows.  We
  instead orient frames properly (time-major rows of F bins).  Flag
  ``compat_scrambled=True`` reproduces the reference's raw-view behaviour
  bit-for-bit for parity experiments.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np
import jax.numpy as jnp

MEL_SCALES = (16, 32, 64)


def _freq_to_mel(freq: float) -> float:
    return 1127.01048 * math.log(1 + freq / 700.0)


def _mel_to_freq(mel: float) -> float:
    return 700 * (math.exp(mel / 1127.01048) - 1)


def mel_filterbank(num_coeffs: int, fft_size: int, fs: int) -> np.ndarray:
    """Triangular mel filters over rFFT bins: [num_coeffs, fft_size//2+1].

    Same construction as reference tools_for_loss.py:140-184 (integer bin
    flooring included).
    """
    max_hz = fs / 2
    num_fft_bins = fft_size // 2 + 1
    max_mel = _freq_to_mel(max_hz)
    min_mel = _freq_to_mel(0.0)

    centers = np.arange(num_coeffs + 2, dtype=np.float64)
    centers = centers * (max_mel - min_mel) / (num_coeffs + 1) + min_mel
    bins = np.array(
        [math.floor(num_fft_bins * _mel_to_freq(m) / max_hz) for m in centers]
    )

    filter_mat = np.zeros((num_coeffs, num_fft_bins))
    for i in range(1, num_coeffs + 1):
        start, mid, end = int(bins[i - 1]), int(bins[i]), int(bins[i + 1])
        for j in range(start, mid):
            filter_mat[i - 1, j] = (float(j) - start) / (mid - start)
        for j in range(mid, end):
            filter_mat[i - 1, j] = 1 - (float(j) - mid) / (end - mid)
    return filter_mat.astype(np.float32)


@lru_cache(maxsize=8)
def _filterbanks(scales: tuple, fft_size: int, fs: int):
    # cache NUMPY arrays: caching jnp arrays created inside a jit trace
    # leaks tracers across compilations
    return tuple(
        np.ascontiguousarray(mel_filterbank(s, fft_size, fs).T)
        for s in scales
    )  # each [F, n_mel]


def _rmse(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    m = jnp.mean((y_pred - y_true) ** 2, axis=-1)
    return jnp.mean(jnp.sqrt(m + 1e-7))


def _perceptual_transform(mags, banks, fft_size, compat_scrambled):
    """[..., F, T] magnitudes -> list of log-mel arrays (one per scale)."""
    F = fft_size // 2 + 1
    if compat_scrambled:
        spec = mags.reshape(-1, F)  # raw row-major chunks (reference view)
    else:
        spec = jnp.swapaxes(mags, -1, -2).reshape(-1, F)  # time-major frames
    spec = spec / fft_size
    # CRN's tanh-masked magnitudes can dip below zero; clamp so the log is
    # defined (the reference's CRN+LMS path never runs, see module docs)
    return [jnp.log(jnp.maximum(spec @ fb, 0.0) + 1e-7) for fb in banks]


def lms_loss(
    clean_mags: jnp.ndarray,
    est_mags: jnp.ndarray,
    fft_size: int = 512,
    fs: int = 16000,
    scales: tuple = MEL_SCALES,
    compat_scrambled: bool = False,
) -> jnp.ndarray:
    """Multi-scale log-mel RMSE between magnitude spectrograms [B, F, T].

    The reference averages a per-utterance python loop
    (tools_for_loss.py:242-249); with batched transforms the mean over the
    batch is identical.
    """
    banks = _filterbanks(tuple(scales), fft_size, fs)
    pv_true = _perceptual_transform(clean_mags, banks, fft_size, compat_scrambled)
    pv_pred = _perceptual_transform(est_mags, banks, fft_size, compat_scrambled)
    # Equal-length utterances: batching the frame rows gives exactly the
    # reference's mean-over-utterances of mean-over-frames.
    dists = jnp.stack([_rmse(t, p) for t, p in zip(pv_true, pv_pred)])
    return jnp.mean(dists)
