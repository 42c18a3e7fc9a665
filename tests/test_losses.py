"""Loss tests, pinned to the reference's golden values.

The si_sdr doctest values come from the reference docstring
(tools_for_loss.py:57-74) — the only numeric golden vectors the reference
ships.
"""

import numpy as np
import torch
import jax.numpy as jnp

from se_tpu.losses import sdr, si_snr, si_sdr, mse, lms_loss
from se_tpu.losses.lms import mel_filterbank


def _ref():
    np.random.seed(0)
    return np.random.randn(100)


def test_si_sdr_golden_values():
    reference = _ref()
    assert np.isinf(float(si_sdr(reference, reference)))
    assert np.isinf(float(si_sdr(reference, reference * 2)))
    np.testing.assert_allclose(
        float(si_sdr(reference, np.flip(reference))), -25.127672346460717, rtol=1e-5
    )
    np.testing.assert_allclose(
        float(si_sdr(reference, reference + np.flip(reference))),
        0.481070445785553,
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(si_sdr(reference, reference + 0.5)), 6.3704606032577304, rtol=1e-5
    )
    np.testing.assert_allclose(
        float(si_sdr(reference, reference * 2 + 1)), 6.3704606032577304, rtol=1e-5
    )


def _torch_sdr(s1, s2, eps=1e-8):
    t1, t2 = torch.from_numpy(s1), torch.from_numpy(s2)
    sn = torch.sum(t1 * t1, -1, keepdim=True)
    d = t1 - t2
    sd = torch.sum(d * d, -1, keepdim=True)
    return float(torch.mean(10 * torch.log10(sn**2 / (sd**2 + eps))))


def _torch_si_snr(s1, s2, eps=1e-8):
    t1, t2 = torch.from_numpy(s1), torch.from_numpy(s2)
    dot = torch.sum(t1 * t2, -1, keepdim=True)
    nrm = torch.sum(t2 * t2, -1, keepdim=True)
    s_t = dot / (nrm + eps) * t2
    e_n = t1 - s_t
    snr = 10 * torch.log10(
        torch.sum(s_t * s_t, -1, keepdim=True)
        / (torch.sum(e_n * e_n, -1, keepdim=True) + eps)
        + eps
    )
    return float(torch.mean(snr))


def test_sdr_si_snr_match_reference_formulas(rng):
    s1 = rng.standard_normal((4, 1000)).astype(np.float64)
    s2 = (s1 + 0.3 * rng.standard_normal((4, 1000))).astype(np.float64)
    np.testing.assert_allclose(float(sdr(s1, s2)), _torch_sdr(s1, s2), rtol=1e-6)
    np.testing.assert_allclose(
        float(si_snr(s1, s2)), _torch_si_snr(s1, s2), rtol=1e-6
    )


def test_mse(rng):
    a = rng.standard_normal((3, 5)).astype(np.float32)
    b = rng.standard_normal((3, 5)).astype(np.float32)
    np.testing.assert_allclose(float(mse(a, b)), np.mean((a - b) ** 2), rtol=1e-6)


def test_mel_filterbank_matches_reference_construction():
    """Oracle: rebuild the reference melFilterBank math in pure python."""
    import math

    def ref_fb(numCoeffs, fftSize, fs=16000):
        def f2m(f):
            return 1127.01048 * math.log(1 + f / 700.0)

        def m2f(m):
            return 700 * (math.exp(m / 1127.01048) - 1)

        maxHz = fs / 2
        numFFTBins = int(fftSize / 2) + 1
        maxMel, minMel = f2m(maxHz), f2m(0)
        centers = [
            float(i) * (maxMel - minMel) / (numCoeffs + 1) + minMel
            for i in range(numCoeffs + 2)
        ]
        centers = [math.floor(numFFTBins * m2f(m) / maxHz) for m in centers]
        mat = np.zeros((numCoeffs, numFFTBins))
        for i in range(1, numCoeffs + 1):
            s, m, e = int(centers[i - 1]), int(centers[i]), int(centers[i + 1])
            for j in range(s, m):
                mat[i - 1, j] = (float(j) - s) / (m - s)
            for j in range(m, e):
                mat[i - 1, j] = 1 - (float(j) - m) / (e - m)
        return mat

    for n in (16, 32, 64):
        np.testing.assert_allclose(
            mel_filterbank(n, 512, 16000), ref_fb(n, 512), atol=1e-6
        )


def test_lms_loss_basic(rng):
    mags = np.abs(rng.standard_normal((2, 257, 31))).astype(np.float32)
    assert float(lms_loss(mags, mags)) < 1e-3
    other = np.abs(rng.standard_normal((2, 257, 31))).astype(np.float32)
    assert float(lms_loss(mags, other)) > float(lms_loss(mags, mags))
