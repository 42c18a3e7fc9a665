"""Baseline-only torch restatements of the perceptual losses, used by
tools/measure_torch_baseline.py to construct the PyTorch reference
throughput rows for the perceptual trainer modes (BASELINE.md).

NOT framework code and NOT a parity oracle — the numeric oracles live in
tests/oracles/ (asteroid_pmsqe.py) and the framework implementations in
se_tpu/losses/.  These exist so the perceptual bench series have an
honest torch-cost baseline measured the way the reference would run:

* LMS (reference: tools_for_loss.py:100-249): per-utterance python loop
  and the mel filterbank REBUILT on every transform call — both
  reference-code costs, kept because the baseline measures the reference
  implementation as it ships.
* PMSQE (reference: tools_for_loss.py:253-268 via asteroid's
  SingleSrcPMSQE): asteroid is vectorized torch, so this restatement is
  the vectorized form (same computational sequence as
  se_tpu/losses/pmsqe.py, identity-permutation PIT — see that module's
  docstring for the chunking semantics).
"""

import sys
import os

import numpy as np
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from se_tpu.losses.lms import mel_filterbank  # noqa: E402
from se_tpu.eval import p862_tables as T  # noqa: E402

MEL_SCALES = (16, 32, 64)


def lms_loss_torch(clean_mags: torch.Tensor, est_mags: torch.Tensor,
                   fft_size: int = 512, fs: int = 16000) -> torch.Tensor:
    """Reference-style LMS: loop over utterances, rebuild filterbanks per
    transform call (tools_for_loss.py:194-198, :242-249)."""
    F = fft_size // 2 + 1

    def transform(mags_ft):
        outs = []
        for s in MEL_SCALES:
            fb = torch.from_numpy(
                np.ascontiguousarray(mel_filterbank(s, fft_size, fs).T)
            )  # rebuilt every call — reference quirk
            spec = mags_ft.reshape(-1, F) / fft_size
            outs.append(torch.log(torch.clamp(spec @ fb, min=0.0) + 1e-7))
        return outs

    dists = []
    for b in range(clean_mags.shape[0]):
        pv_t = transform(clean_mags[b])
        pv_p = transform(est_mags[b])
        per_scale = [
            torch.mean(torch.sqrt(torch.mean((p - t) ** 2, -1) + 1e-7))
            for t, p in zip(pv_t, pv_p)
        ]
        dists.append(torch.mean(torch.stack(per_scale)))
    return torch.mean(torch.stack(dists))


# ---- PMSQE (vectorized, mirrors se_tpu/losses/pmsqe.py) -----------------

FS, NFFT, HOP, NB = 16000, 512, 256, T.NB
SP, SL = 6.910853e-006, 1.866055e-001

_ABS_THRESH = torch.tensor(np.asarray(T.ABS_THRESH_POWER, np.float32))
_WIDTH = torch.tensor(np.asarray(T.WIDTH_OF_BAND_BARK, np.float32))
_CENTRE = np.asarray(T.CENTRE_OF_BAND_BARK, np.float32)
_ZWICKER = torch.tensor(
    0.23 * np.minimum(
        np.where(_CENTRE < 4.0, 6.0 / (_CENTRE + 2.0), 1.0), 2.0
    ) ** 0.15
).float()


def _bark_matrix():
    m = np.zeros((NFFT // 2 + 1, NB), np.float32)
    edges = np.concatenate(
        [[0], np.cumsum(np.asarray(T.NR_OF_HZ_BANDS_PER_BARK_BAND))]
    ).astype(int)
    corr = np.asarray(T.POW_DENS_CORRECTION_FACTOR)
    for b in range(NB):
        m[edges[b]: edges[b + 1], b] = corr[b] * SP
    return torch.from_numpy(m)


def _mask_sll():
    m = np.zeros(NFFT // 2 + 1, np.float32)
    m[11] = 0.5 * 25.0 / 31.25
    m[12:104] = 1.0
    m[104] = 0.5
    return torch.from_numpy(m * 2.0 * 2.0 / NFFT**2)


_BARK_M = _bark_matrix()
_MASK_SLL = _mask_sll()
_SQRT_HANN = torch.from_numpy(
    (np.hanning(NFFT + 1)[:-1] ** 0.5).astype(np.float32))


def _mag_spectra(wav: torch.Tensor) -> torch.Tensor:
    B, L = wav.shape
    n_frames = (L - NFFT) // HOP + 1
    idx = (torch.arange(n_frames)[:, None] * HOP
           + torch.arange(NFFT)[None, :])
    frames = wav[:, idx] * _SQRT_HANN[None, None, :]
    spec = torch.fft.rfft(frames, n=NFFT)
    return torch.sqrt(spec.real**2 + spec.imag**2 + 1e-8)


def _total_audible(bark, factor):
    aud = torch.where(
        bark[..., 1:] > factor * _ABS_THRESH[None, None, 1:],
        bark[..., 1:], torch.zeros(()),
    )
    return torch.sum(aud, -1)


def _loudness(bark):
    t = _ABS_THRESH[None, None, :]
    z = _ZWICKER[None, None, :]
    loud = SL * (t / 0.5) ** z * ((0.5 + 0.5 * bark / t) ** z - 1.0)
    return torch.where(bark > t, torch.clamp(loud, min=0.0),
                       torch.zeros(()))


def pmsqe_loss_torch(ref_wav: torch.Tensor, deg_wav: torch.Tensor,
                     alpha: float = 0.1, beta: float = 0.309):
    B, L = ref_wav.shape
    if L > FS:
        n_sec = L // FS
        ref_wav = ref_wav[:, : n_sec * FS].reshape(B * n_sec, FS)
        deg_wav = deg_wav[:, : n_sec * FS].reshape(B * n_sec, FS)

    s_ref, s_deg = _mag_spectra(ref_wav), _mag_spectra(deg_wav)
    s_ref = s_ref * (1e7 / torch.mean(s_ref @ _MASK_SLL, -1))[:, None, None]
    s_deg = s_deg * (1e7 / torch.mean(s_deg @ _MASK_SLL, -1))[:, None, None]
    bark_ref, bark_deg = s_ref @ _BARK_M, s_deg @ _BARK_M

    silent = (_total_audible(bark_ref, 100.0) < 1e7)[..., None]
    th100 = 100.0 * _ABS_THRESH[None, None, :]
    num = torch.sum(torch.where(~silent & (bark_ref > th100), bark_ref,
                                torch.zeros(())), 1)
    den = torch.sum(torch.where(~silent & (bark_deg > th100), bark_deg,
                                torch.zeros(())), 1)
    eq = torch.clamp((num + 1000.0) / (den + 1000.0), 0.01, 100.0)
    bark_deg = bark_deg * eq[:, None, :]

    ta_ref = _total_audible(bark_ref, 1.0)
    g = torch.clamp(
        (ta_ref + 5e3) / (_total_audible(bark_deg, 1.0) + 5e3), 3e-4, 5.0
    )[..., None]
    bark_deg = bark_deg * g

    loud_ref, loud_deg = _loudness(bark_ref), _loudness(bark_deg)
    d = loud_deg - loud_ref
    m = 0.25 * torch.minimum(loud_deg, loud_ref)
    d = torch.where(d > m, d - m,
                    torch.where(d < -m, d + m, torch.zeros(())))
    ratio = ((bark_deg + 50.0) / (bark_ref + 50.0)) ** 1.2
    asym = torch.where(ratio < 3.0, torch.zeros(()),
                       torch.clamp(ratio, max=12.0))

    w = _WIDTH[None, None, 1:]
    total_w = torch.sum(_WIDTH[1:])
    d_sym = (torch.sqrt(
        torch.sum((torch.abs(d[..., 1:]) * w) ** 2, -1) / total_w
    ) * total_w)
    d_asym = torch.sum(torch.abs((d * asym)[..., 1:]) * w, -1)
    h = ((ta_ref + 1e5) / 1e7) ** 0.04
    wd = torch.clamp(d_sym / h, max=45.0)
    wda = torch.clamp(d_asym / h, max=45.0)
    return alpha * torch.mean(wd) + beta * torch.mean(wda)
