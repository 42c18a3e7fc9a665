"""Test-only oracle: faithful restatement of pystoi 0.3.3 (mpariente/pystoi,
MIT license), the scorer the reference actually calls for STOI
(reference: tools_for_estimate.py:90-95, ``stoi(clean, est, fs,
extended=False)``).

pystoi is not installable in this environment (zero egress), so this is a
from-knowledge restatement of its published algorithm and implementation
quirks, written deliberately in pystoi's own loop-style structure so it can
be diffed against the real package line by line.  It restates 0.3.3 — the
release contemporaneous with the reference's documented environment
(README.md:26-30: Python 3.7 / PyTorch 1.9, 2021) — including its two
deviations from Taal's original MATLAB code:

* frame ranges are ``range(0, len(x) - framelen, hop)`` (EXCLUSIVE stop) in
  both ``remove_silent_frames`` and ``stft``, so the final frame is dropped
  whenever ``(len - framelen) % hop == 0``.  After silence removal the
  overlap-added signal has length ``(n-1)*hop + framelen`` exactly, so the
  STFT hits that aligned case on *every* call;
* resampling uses scipy ``resample_poly`` with an Octave-compatible
  Kaiser-windowed sinc filter (``_resample_window_oct``), not scipy's
  default firwin design.

This module must NEVER be imported by framework code — it exists to pin
``se_tpu/eval/stoi.py`` numerically (tests/test_eval_metrics.py).
"""

from __future__ import annotations

import numpy as np
from scipy.signal import resample_poly

FS = 10000
N_FRAME = 256
NFFT = 512
NUMBAND = 15
MINFREQ = 150
N = 30
BETA = -15.0
DYN_RANGE = 40
EPS = np.finfo("float").eps


def _resample_window_oct(p, q):
    """Port of the Octave resample antialiasing window (pystoi utils)."""
    gcd = np.gcd(p, q)
    if gcd > 1:
        p = p // gcd
        q = q // gcd

    # Properties of the antialiasing filter
    log10_rejection = -3.0
    stopband_cutoff_f = 1.0 / (2 * max(p, q))
    roll_off_width = stopband_cutoff_f / 10

    # Determine filter length
    rejection_db = -20 * log10_rejection
    l = int(np.ceil((rejection_db - 8) / (28.714 * roll_off_width)))

    # Ideal sinc filter
    t = np.arange(-l, l + 1)
    ideal_filter = 2 * p * stopband_cutoff_f * np.sinc(
        2 * stopband_cutoff_f * t
    )

    # Determine parameter of Kaiser window
    if (rejection_db >= 21) and (rejection_db <= 50):
        beta = 0.5842 * (rejection_db - 21) ** 0.4 + 0.07886 * (
            rejection_db - 21
        )
    elif rejection_db > 50:
        beta = 0.1102 * (rejection_db - 8.7)
    else:
        beta = 0.0

    # Apodize ideal filter response
    h = np.kaiser(2 * l + 1, beta) * ideal_filter
    return h


def resample_oct(x, p, q):
    """Octave-compatible resampler (pystoi utils.resample_oct)."""
    h = _resample_window_oct(p, q)
    window = h / np.sum(h)
    return resample_poly(x, p, q, window=window)


def thirdoct(fs, nfft, num_bands, min_freq):
    """1/3-octave band matrix (pystoi utils.thirdoct)."""
    f = np.linspace(0, fs, nfft + 1)
    f = f[: int(nfft / 2) + 1]
    k = np.array(range(num_bands)).astype(float)
    cf = np.power(2.0 ** (1.0 / 3), k) * min_freq
    freq_low = min_freq * np.power(2.0, (2 * k - 1) / 6)
    freq_high = min_freq * np.power(2.0, (2 * k + 1) / 6)
    obm = np.zeros((num_bands, len(f)))  # a verifier
    for i in range(len(cf)):
        # Match 1/3 oct band freq with fft frequency bin
        f_bin = np.argmin(np.square(f - freq_low[i]))
        freq_low[i] = f[f_bin]
        fl_ii = f_bin
        f_bin = np.argmin(np.square(f - freq_high[i]))
        freq_high[i] = f[f_bin]
        fh_ii = f_bin
        # Assign to the octave band matrix
        obm[i, fl_ii:fh_ii] = 1
    return obm, cf


def stft(x, win_size, fft_size, overlap=4):
    """STFT with pystoi's EXCLUSIVE frame range (drops the aligned final
    frame — see module docstring)."""
    hop = int(win_size / overlap)
    w = np.hanning(win_size + 2)[1:-1]  # = matlab hanning(win_size)
    stft_out = np.array(
        [
            np.fft.rfft(w * x[i : i + win_size], n=fft_size)
            for i in range(0, len(x) - win_size, hop)
        ]
    )
    return stft_out


def remove_silent_frames(x, y, dyn_range, framelen, hop):
    """Energy-VAD silent-frame removal (pystoi utils), with the same
    exclusive frame range as ``stft``."""
    # Compute Mask
    w = np.hanning(framelen + 2)[1:-1]
    x_frames = np.array(
        [w * x[i : i + framelen] for i in range(0, len(x) - framelen, hop)]
    )
    y_frames = np.array(
        [w * y[i : i + framelen] for i in range(0, len(y) - framelen, hop)]
    )
    # Compute energies in dB
    x_energies = 20 * np.log10(np.linalg.norm(x_frames, axis=1) + EPS)
    # Find boolean mask of energies lower than dynamic_range dB
    # with respect to maximum clean speech energy frame
    mask = (np.max(x_energies) - dyn_range - x_energies) < 0
    # Remove silent frames by masking
    x_frames = x_frames[mask]
    y_frames = y_frames[mask]
    # Overlap-add the unmasked frames back into signals
    n_sil = (len(x_frames) - 1) * hop + framelen
    x_sil = np.zeros(n_sil)
    y_sil = np.zeros(n_sil)
    for i in range(x_frames.shape[0]):
        x_sil[range(i * hop, i * hop + framelen)] += x_frames[i, :]
        y_sil[range(i * hop, i * hop + framelen)] += y_frames[i, :]
    return x_sil, y_sil


def stoi(x, y, fs_sig, extended=False):
    """STOI of degraded ``y`` against clean ``x`` (pystoi stoi.stoi)."""
    if x.shape != y.shape:
        raise Exception("x and y should have the same length")

    # Resample if fs_sig is different than fs
    if fs_sig != FS:
        x = resample_oct(x, FS, fs_sig)
        y = resample_oct(y, FS, fs_sig)

    # Remove silent frames
    x, y = remove_silent_frames(x, y, DYN_RANGE, N_FRAME, int(N_FRAME / 2))

    # Take STFT
    x_spec = stft(x, N_FRAME, NFFT, overlap=2).transpose()
    y_spec = stft(y, N_FRAME, NFFT, overlap=2).transpose()

    # Ensure at least 30 frames for intermediate intelligibility
    if x_spec.shape[-1] < N:
        return 1e-5

    # Apply OB matrix to the spectrograms as in Eq. (1)
    obm, cf = thirdoct(FS, NFFT, NUMBAND, MINFREQ)
    x_tob = np.sqrt(np.matmul(obm, np.square(np.abs(x_spec))))
    y_tob = np.sqrt(np.matmul(obm, np.square(np.abs(y_spec))))

    # Take segments of x_tob, y_tob
    x_segments = np.array(
        [x_tob[:, m - N : m] for m in range(N, x_tob.shape[1] + 1)]
    )
    y_segments = np.array(
        [y_tob[:, m - N : m] for m in range(N, x_tob.shape[1] + 1)]
    )

    if extended:
        x_n = _row_col_normalize(x_segments)
        y_n = _row_col_normalize(y_segments)
        return np.sum(x_n * y_n / N) / x_n.shape[0]

    else:
        # Find normalization constants and normalize
        normalization_consts = (
            np.linalg.norm(x_segments, axis=2, keepdims=True)
            / (np.linalg.norm(y_segments, axis=2, keepdims=True) + EPS)
        )
        y_segments_normalized = y_segments * normalization_consts

        # Clip as described in [1]
        clip_value = 10 ** (-BETA / 20)
        y_primes = np.minimum(
            y_segments_normalized, x_segments * (1 + clip_value)
        )

        # Subtract mean vectors
        y_primes = y_primes - np.mean(y_primes, axis=2, keepdims=True)
        x_segments = x_segments - np.mean(x_segments, axis=2, keepdims=True)

        # Divide by their norms
        y_primes /= np.linalg.norm(y_primes, axis=2, keepdims=True) + EPS
        x_segments /= np.linalg.norm(x_segments, axis=2, keepdims=True) + EPS
        # Find a matrix with entries summing to sum of correlations of
        # vectors
        correlations_components = y_primes * x_segments

        # J, M as in [1], eq.6
        J = x_segments.shape[0]
        M = x_segments.shape[1]

        # Find the mean of all correlations
        d = np.sum(correlations_components) / (J * M)
        return d


def _row_col_normalize(x):
    """Row and column mean/norm normalization (pystoi utils, extended)."""
    # Row mean and variance normalization
    x_normed = x + np.random.standard_normal(x.shape) * EPS
    x_normed -= np.mean(x_normed, axis=-1, keepdims=True)
    x_inv = 1.0 / np.linalg.norm(x_normed, axis=-1, keepdims=True)
    x_diags = np.array(
        [np.diag(x_inv[i].reshape(-1)) for i in range(x_inv.shape[0])]
    )
    x_normed = np.matmul(x_diags, x_normed)
    # Column mean and variance normalization
    x_normed += +np.random.standard_normal(x_normed.shape) * EPS
    x_normed -= np.mean(x_normed, axis=1, keepdims=True)
    x_inv = 1.0 / np.linalg.norm(x_normed, axis=1, keepdims=True)
    x_diags = np.array(
        [np.diag(x_inv[i].reshape(-1)) for i in range(x_inv.shape[0])]
    )
    x_normed = np.matmul(x_normed, x_diags)
    return x_normed
