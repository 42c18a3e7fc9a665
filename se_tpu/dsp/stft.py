"""STFT / iSTFT, TPU-first.

Two numerically faithful paths, matching the two STFT stacks in the
reference:

1. **Conv-STFT path** (DCCRN / CRN).  The reference implements STFT as a
   1-D convolution with a precomputed rFFT basis and its pinv for the
   inverse (reference: tools_for_model.py:16-112).  Here the analysis is a
   single framing + [win_len x (fft_len + 2)] matmul (one MXU GEMM over all
   frames) and the synthesis is the transposed GEMM + hop-block overlap-add
   — identical math, but expressed as large batched matmuls instead of many
   small convs.

2. **Framework-STFT path** (FullSubNet).  Matches ``torch.stft`` /
   ``torch.istft`` semantics: centered reflect padding, window zero-padded
   to ``n_fft``, hop ``int(win_len * ola_ratio)``
   (reference: tools_for_model.py:628-680).

Both paths are pure functions of static-shape arrays: jit/grad/vmap-safe.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from scipy.signal import get_window

from .ola import overlap_add

# scipy >= 1.13 dropped the 'hanning' alias used by the reference config
_WINDOW_ALIASES = {"hanning": "hann", "hamming": "hamming"}


def _window_np(win_type: str | None, win_len: int) -> np.ndarray:
    if win_type is None or win_type == "None":
        return np.ones(win_len)
    win_type = _WINDOW_ALIASES.get(win_type, win_type)
    return get_window(win_type, win_len, fftbins=True)


def _conv_stft_bases(win_len: int, fft_len: int, win_type: str | None):
    """Forward/inverse DFT bases exactly as the reference builds them.

    reference: tools_for_model.py:16-33 — ``np.fft.rfft(np.eye(fft_len))[:win_len]``
    real||imag stacked, the inverse via Moore-Penrose pseudo-inverse, both
    multiplied by the analysis window.
    """
    window = _window_np(win_type, win_len)
    fourier_basis = np.fft.rfft(np.eye(fft_len))[:win_len]  # [win_len, F]
    basis = np.concatenate(
        [np.real(fourier_basis), np.imag(fourier_basis)], axis=1
    )  # [win_len, 2F]
    fwd = (basis * window[:, None]).astype(np.float32)  # [win_len, 2F]
    inv = (np.linalg.pinv(basis.T) * window[:, None]).astype(np.float32)  # [win_len, 2F]
    return fwd, inv, window.astype(np.float32)


@dataclass(frozen=True)
class ConvStftKernels:
    """Precomputed analysis/synthesis kernels for the conv-STFT path."""

    fwd: jnp.ndarray  # [win_len, fft_len + 2]
    inv: jnp.ndarray  # [win_len, fft_len + 2]
    window: jnp.ndarray  # [win_len]
    win_len: int
    hop: int
    fft_len: int


def make_conv_stft_kernels(
    win_len: int, hop: int, fft_len: int, win_type: str | None = "hanning"
) -> ConvStftKernels:
    fwd, inv, window = _conv_stft_bases(win_len, fft_len, win_type)
    return ConvStftKernels(
        fwd=jnp.asarray(fwd),
        inv=jnp.asarray(inv),
        window=jnp.asarray(window),
        win_len=win_len,
        hop=hop,
        fft_len=fft_len,
    )


def _frame(x: jnp.ndarray, win_len: int, hop: int) -> jnp.ndarray:
    """[B, L] -> [B, T, win_len] strided frames (static shapes).

    Uses hop-block reshaping: when ``win_len`` spans R hops, frame t is the
    concatenation of hop-blocks t..t+R-1, so framing is R static slices of a
    [B, L/hop, hop] view — no gather.
    """
    B, L = x.shape
    T = (L - win_len) // hop + 1
    R = -(-win_len // hop)
    pad = R * hop - win_len
    xb = x
    n_blocks = (L + hop - 1) // hop
    if n_blocks * hop != L:
        xb = jnp.pad(xb, ((0, 0), (0, n_blocks * hop - L)))
    if n_blocks < T - 1 + R:
        xb = jnp.pad(xb, ((0, 0), (0, (T - 1 + R - n_blocks) * hop)))
        n_blocks = T - 1 + R
    blocks = xb.reshape(B, n_blocks, hop)
    # frame t = blocks[t : t + R] flattened, truncated to win_len
    parts = [blocks[:, r : r + T, :] for r in range(R)]
    frames = jnp.concatenate(parts, axis=-1)  # [B, T, R * hop]
    if pad:
        frames = frames[..., :win_len]
    return frames


# ---------------------------------------------------------------------------
# Conv-STFT path (DCCRN / CRN)
# ---------------------------------------------------------------------------

def conv_stft(x: jnp.ndarray, k: ConvStftKernels) -> jnp.ndarray:
    """Analysis STFT with reference ConvSTFT semantics.

    reference: tools_for_model.py:54-61 — pad ``win_len - hop`` on both
    sides, stride-``hop`` windowed projection on the rFFT basis, output
    real-stacked-over-imag ``[B, fft_len + 2, T]``.
    """
    if x.ndim == 1:
        x = x[None]
    pad = k.win_len - k.hop
    x = jnp.pad(x, ((0, 0), (pad, pad)))
    frames = _frame(x, k.win_len, k.hop)  # [B, T, win_len]
    spec = jnp.einsum(
        "btn,nf->bft", frames, k.fwd, precision=jax.lax.Precision.HIGHEST
    )
    return spec  # [B, fft_len + 2, T]


def conv_stft_mag_phase(x: jnp.ndarray, k: ConvStftKernels):
    """'real' feature type: (mags, phase) (reference: tools_for_model.py:63-68)."""
    spec = conv_stft(x, k)
    dim = k.fft_len // 2 + 1
    real, imag = spec[:, :dim], spec[:, dim:]
    # forward-identical to sqrt(r^2+i^2) but with a finite (zero) gradient
    # at all-zero bins (see se_tpu/ops/magnitude.py)
    from ..ops.magnitude import complex_mag

    mags = complex_mag(real, imag)
    phase = jnp.arctan2(imag, real)
    return mags, phase


def conv_istft(
    spec: jnp.ndarray,
    k: ConvStftKernels,
    phase: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Synthesis iSTFT with reference ConviSTFT semantics.

    reference: tools_for_model.py:90-112 — transposed conv with the
    pinv-based synthesis kernel, overlap-add normalisation by the OLA of the
    squared window (via the identity 'enframe' kernel), then edge trim of
    ``win_len - hop`` samples on each side.

    Args:
      spec: [B, fft_len + 2, T] real-stacked-over-imag spectrum, or
        [B, fft_len//2+1, T] magnitudes if ``phase`` is given.
      phase: optional [B, fft_len//2+1, T] phases.
    """
    if phase is not None:
        real = spec * jnp.cos(phase)
        imag = spec * jnp.sin(phase)
        spec = jnp.concatenate([real, imag], axis=1)

    B, F2, T = spec.shape
    frames = jnp.einsum(
        "bft,nf->btn", spec, k.inv, precision=jax.lax.Precision.HIGHEST
    )  # [B, T, win_len]
    out = overlap_add(frames, k.hop)  # [B, L]

    win_sq = (k.window**2)[None, None, :]  # [1, 1, win_len]
    coff = overlap_add(jnp.broadcast_to(win_sq, (1, T, k.win_len)), k.hop)
    out = out / (coff + 1e-8)

    trim = k.win_len - k.hop
    if trim:
        out = out[..., trim:-trim]
    # trim == 0 (no-overlap framing, win_len == hop): `[0:-0]` would be an
    # EMPTY slice silently discarding the whole synthesis — keep it all
    return out[:, None, :]  # [B, 1, L] to mirror the reference conv output


# ---------------------------------------------------------------------------
# Framework-STFT path (FullSubNet) — torch.stft / torch.istft semantics
# ---------------------------------------------------------------------------

def _centered_window(win_len: int, n_fft: int) -> np.ndarray:
    """Hann window zero-padded to n_fft, centered (torch.stft semantics)."""
    w = np.zeros(n_fft, dtype=np.float32)
    left = (n_fft - win_len) // 2
    # torch.hann_window(win_len) is periodic: 0.5 - 0.5 cos(2 pi n / N)
    n = np.arange(win_len)
    w[left : left + win_len] = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_len)
    return w


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length"))
def stft(
    y: jnp.ndarray,
    n_fft: int = 512,
    hop_length: int = 300,
    win_length: int = 400,
) -> jnp.ndarray:
    """torch.stft-equivalent analysis (center=True, reflect pad, onesided).

    reference: tools_for_model.py:628-648 (the FullSubNet feature path,
    hop ``int(win_len * ola_ratio)`` = 300 under the default config).

    Args:
      y: [B, L] waveforms.
    Returns:
      [B, n_fft//2+1, T] complex64 STFT coefficients.
    """
    if y.ndim == 1:
        y = y[None]
    window = jnp.asarray(_centered_window(win_length, n_fft))
    pad = n_fft // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    frames = _frame(y, n_fft, hop_length)  # [B, T, n_fft]
    frames = frames * window[None, None, :]
    return jnp.swapaxes(jnp.fft.rfft(frames, n=n_fft), -1, -2)  # [B, F, T]


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "length"))
def istft(
    features: jnp.ndarray,
    n_fft: int = 512,
    hop_length: int = 300,
    win_length: int = 400,
    length: int | None = None,
) -> jnp.ndarray:
    """torch.istft-equivalent synthesis with least-squares window norm.

    reference: tools_for_model.py:651-680.

    Args:
      features: [B, F, T] complex or [B, F, T, 2] real/imag stacked.
    Returns:
      [B, length] waveforms.
    """
    if features.ndim == 4:  # [B, F, T, 2] real/imag last
        features = jax.lax.complex(features[..., 0], features[..., 1])
    window = jnp.asarray(_centered_window(win_length, n_fft))
    B, F, T = features.shape
    frames = jnp.fft.irfft(jnp.swapaxes(features, -1, -2), n=n_fft)  # [B, T, n_fft]
    frames = frames * window[None, None, :]
    out = overlap_add(frames, hop_length)
    env = overlap_add(
        jnp.broadcast_to((window**2)[None, None, :], (1, T, n_fft)), hop_length
    )
    out = out / jnp.where(env > 1e-11, env, 1.0)
    pad = n_fft // 2
    out = out[..., pad:]
    if length is not None:
        out = out[..., :length]
        if out.shape[-1] < length:
            # torch.istft zero-fills a requested length beyond the
            # reconstructable span rather than returning a short array
            out = jnp.pad(out, ((0, 0), (0, length - out.shape[-1])))
    else:
        out = out[..., : out.shape[-1] - pad]
    return out


def mag_phase(complex_tensor: jnp.ndarray):
    """(|X|, angle(X)) (reference: tools_for_model.py:683)."""
    return jnp.abs(complex_tensor), jnp.angle(complex_tensor)
