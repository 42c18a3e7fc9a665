"""STOI — short-time objective intelligibility (Taal et al., 2011).

Numpy implementation equivalent to the pystoi path the reference uses
(reference: tools_for_estimate.py:90-95, ``extended=False``): resample to
10 kHz, energy-VAD silent-frame removal, 1/3-octave band envelopes over
512-point STFTs, 384 ms segment correlations with clipped normalisation.
"""

from __future__ import annotations

import numpy as np
from scipy.signal import resample_poly

FS = 10000
N_FRAME = 256
NFFT = 512
NUMBAND = 15
MINFREQ = 150
N = 30  # 384 ms segments
BETA = -15.0
DYN_RANGE = 40.0


def _hann(n: int) -> np.ndarray:
    return np.hanning(n + 2)[1:-1]


def _thirdoct(fs: int, nfft: int, num_bands: int, min_freq: float):
    f = np.linspace(0, fs, nfft, endpoint=False)[: nfft // 2 + 1]
    k = np.arange(num_bands, dtype=np.float64)
    cf = 2.0 ** (k / 3.0) * min_freq
    freq_low = cf * 2.0 ** (-1.0 / 6.0)
    freq_high = cf * 2.0 ** (1.0 / 6.0)
    obm = np.zeros((num_bands, len(f)))
    for i in range(num_bands):
        fl_ii = np.argmin((f - freq_low[i]) ** 2)
        fh_ii = np.argmin((f - freq_high[i]) ** 2)
        obm[i, fl_ii:fh_ii] = 1
    return obm


_OBM = _thirdoct(FS, NFFT, NUMBAND, MINFREQ)


def _frames(x: np.ndarray, framelen: int, hop: int) -> np.ndarray:
    n = (len(x) - framelen) // hop + 1
    if n <= 0:
        return np.zeros((0, framelen))
    idx = np.arange(framelen)[None, :] + hop * np.arange(n)[:, None]
    return x[idx]


def _remove_silent_frames(x, y, dyn_range, framelen, hop):
    w = _hann(framelen)
    xf = _frames(x, framelen, hop) * w
    yf = _frames(y, framelen, hop) * w
    energies = 20 * np.log10(np.linalg.norm(xf, axis=1) + 1e-16)
    mask = energies > np.max(energies) - dyn_range
    xf, yf = xf[mask], yf[mask]
    # overlap-add back to signals
    n = len(xf)
    x_sil = np.zeros((n - 1) * hop + framelen) if n else np.zeros(0)
    y_sil = np.zeros_like(x_sil)
    for i in range(n):
        x_sil[i * hop : i * hop + framelen] += xf[i]
        y_sil[i * hop : i * hop + framelen] += yf[i]
    return x_sil, y_sil


def _stft_mag(x: np.ndarray) -> np.ndarray:
    w = _hann(N_FRAME)
    f = _frames(x, N_FRAME, N_FRAME // 2) * w
    return np.abs(np.fft.rfft(f, n=NFFT, axis=-1))  # [T, F]


def stoi(x: np.ndarray, y: np.ndarray, fs_sig: int, extended: bool = False) -> float:
    """Compute STOI of degraded ``y`` against clean ``x``."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    if x.shape != y.shape:
        raise ValueError("x and y must have the same length")
    if fs_sig != FS:
        g = np.gcd(FS, int(fs_sig))
        x = resample_poly(x, FS // g, fs_sig // g)
        y = resample_poly(y, FS // g, fs_sig // g)

    x, y = _remove_silent_frames(x, y, DYN_RANGE, N_FRAME, N_FRAME // 2)
    if len(x) < N_FRAME:
        return 1e-5  # degenerate: everything silent

    X = _stft_mag(x)  # [T, F]
    Y = _stft_mag(y)
    if X.shape[0] < N:
        return 1e-5

    # 1/3-octave band envelopes [T, J]
    Xb = np.sqrt((X**2) @ _OBM.T)
    Yb = np.sqrt((Y**2) @ _OBM.T)

    c = 10.0 ** (-BETA / 20.0)
    d_sum = 0.0
    n_seg = X.shape[0] - N + 1
    for m in range(n_seg):
        xs = Xb[m : m + N].T  # [J, N]
        ys = Yb[m : m + N].T
        alpha = np.linalg.norm(xs, axis=1, keepdims=True) / (
            np.linalg.norm(ys, axis=1, keepdims=True) + 1e-16
        )
        ys_n = np.minimum(alpha * ys, xs * (1 + c))
        if extended:
            xs_c = xs - xs.mean(axis=1, keepdims=True)
            ys_c = ys_n - ys_n.mean(axis=1, keepdims=True)
            xs_c /= np.linalg.norm(xs_c, axis=1, keepdims=True) + 1e-16
            ys_c /= np.linalg.norm(ys_c, axis=1, keepdims=True) + 1e-16
            d_sum += np.sum(xs_c * ys_c) / NUMBAND
        else:
            xm = xs - xs.mean(axis=1, keepdims=True)
            ym = ys_n - ys_n.mean(axis=1, keepdims=True)
            corr = np.sum(xm * ym, axis=1) / (
                np.linalg.norm(xm, axis=1) * np.linalg.norm(ym, axis=1) + 1e-16
            )
            d_sum += np.sum(corr) / NUMBAND
    return float(d_sum / n_seg)
