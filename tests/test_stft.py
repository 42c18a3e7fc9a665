"""Golden tests for the DSP layer.

The oracle is local torch (CPU): we re-execute the *semantics* the reference
defines — conv1d with an rFFT basis (reference: tools_for_model.py:16-112)
and torch.stft/istft (reference: tools_for_model.py:628-680) — and require
our JAX kernels to match numerically.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from scipy.signal import get_window

from se_tpu.dsp import (
    make_conv_stft_kernels,
    conv_stft,
    conv_stft_mag_phase,
    conv_istft,
    frame_stft,
    frame_istft,
    overlap_add,
)

WIN_LEN, HOP, FFT_LEN = 400, 100, 512


def _torch_conv_stft_kernel(invers=False):
    """Oracle kernel, built the way the reference builds it."""
    window = get_window("hann", WIN_LEN, fftbins=True)
    fourier_basis = np.fft.rfft(np.eye(FFT_LEN))[:WIN_LEN]
    kernel = np.concatenate(
        [np.real(fourier_basis), np.imag(fourier_basis)], 1
    ).T
    if invers:
        kernel = np.linalg.pinv(kernel).T
    kernel = kernel * window
    return (
        torch.from_numpy(kernel[:, None, :].astype(np.float32)),
        torch.from_numpy(window[None, :, None].astype(np.float32)),
    )


def _torch_conv_stft(x):
    kernel, _ = _torch_conv_stft_kernel()
    xt = torch.from_numpy(x).float().unsqueeze(1)
    xt = F.pad(xt, [WIN_LEN - HOP, WIN_LEN - HOP])
    return F.conv1d(xt, kernel, stride=HOP).numpy()


def _torch_conv_istft(spec):
    kernel, window = _torch_conv_stft_kernel(invers=True)
    st = torch.from_numpy(spec).float()
    out = F.conv_transpose1d(st, kernel, stride=HOP)
    t = window.repeat(1, 1, st.size(-1)) ** 2
    enframe = torch.eye(WIN_LEN)[:, None, :]
    coff = F.conv_transpose1d(t, enframe, stride=HOP)
    out = out / (coff + 1e-8)
    return out[..., WIN_LEN - HOP : -(WIN_LEN - HOP)].numpy()


@pytest.fixture(scope="module")
def kernels():
    return make_conv_stft_kernels(WIN_LEN, HOP, FFT_LEN, "hanning")


def test_overlap_add_matches_naive(rng):
    frames = rng.standard_normal((2, 7, 400)).astype(np.float32)
    hop = 100
    got = np.asarray(overlap_add(frames, hop))
    want = np.zeros((2, 6 * hop + 400), np.float32)
    for t in range(7):
        want[:, t * hop : t * hop + 400] += frames[:, t]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_overlap_add_non_divisible(rng):
    frames = rng.standard_normal((1, 5, 512)).astype(np.float32)
    hop = 300
    got = np.asarray(overlap_add(frames, hop))
    want = np.zeros((1, 4 * hop + 512), np.float32)
    for t in range(5):
        want[:, t * hop : t * hop + 512] += frames[:, t]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv_stft_matches_reference_semantics(rng, kernels):
    x = rng.standard_normal((3, 16000)).astype(np.float32)
    want = _torch_conv_stft(x)
    got = np.asarray(conv_stft(x, kernels))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-4)


def test_conv_istft_matches_reference_semantics(rng, kernels):
    x = rng.standard_normal((2, 16000)).astype(np.float32)
    spec = _torch_conv_stft(x)
    want = _torch_conv_istft(spec)
    got = np.asarray(conv_istft(spec, kernels))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_conv_stft_roundtrip(rng, kernels):
    """Analysis -> synthesis must reconstruct the waveform."""
    x = rng.standard_normal((1, 16000)).astype(np.float32) * 0.5
    spec = conv_stft(x, kernels)
    y = np.asarray(conv_istft(spec, kernels))[:, 0]
    # interior samples reconstruct; edges are affected by OLA normalisation
    np.testing.assert_allclose(y[:, 400:-400], x[:, 400:-400], atol=1e-3)


def test_conv_stft_mag_phase(rng, kernels):
    x = rng.standard_normal((1, 8000)).astype(np.float32)
    spec = _torch_conv_stft(x)
    dim = FFT_LEN // 2 + 1
    real, imag = spec[:, :dim], spec[:, dim:]
    mags, phase = conv_stft_mag_phase(x, kernels)
    np.testing.assert_allclose(
        np.asarray(mags), np.sqrt(real**2 + imag**2), atol=2e-3
    )


def test_frame_stft_matches_torch(rng):
    y = rng.standard_normal((2, 48000)).astype(np.float32)
    want = torch.stft(
        torch.from_numpy(y),
        512,
        300,
        400,
        window=torch.hann_window(400),
        return_complex=True,
    ).numpy()
    got = np.asarray(frame_stft(y, 512, 300, 400))
    assert got.shape == want.shape == (2, 257, 161)
    np.testing.assert_allclose(got.real, want.real, atol=2e-3)
    np.testing.assert_allclose(got.imag, want.imag, atol=2e-3)


def test_frame_istft_matches_torch(rng):
    y = rng.standard_normal((2, 48000)).astype(np.float32)
    spec_t = torch.stft(
        torch.from_numpy(y),
        512,
        300,
        400,
        window=torch.hann_window(400),
        return_complex=True,
    )
    want = torch.istft(
        spec_t, 512, 300, 400, window=torch.hann_window(400), length=48000
    ).numpy()
    got = np.asarray(frame_istft(spec_t.numpy(), 512, 300, 400, length=48000))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_frame_istft_real_imag_input(rng):
    y = rng.standard_normal((1, 16000)).astype(np.float32)
    spec = np.asarray(frame_stft(y, 512, 300, 400))
    stacked = np.stack([spec.real, spec.imag], axis=-1)
    a = np.asarray(frame_istft(spec, length=16000))
    b = np.asarray(frame_istft(stacked, length=16000))
    np.testing.assert_allclose(a, b, atol=1e-6)
