"""PMSQE: perceptually-motivated speech quality loss (differentiable).

A JAX implementation of the PESQ-inspired training objective of
Martin-Donas et al. 2018 ("A Deep Learning Loss Function Based on the
Perceptual Evaluation of the Speech Quality"), the loss the reference pulls
in through asteroid's SingleSrcPMSQE with a 512/256 STFT front-end and
1-second waveform chunking (reference: tools_for_loss.py:255-269).

Built on the same published ITU-T P.862 constants and operations as the
framework's PESQ implementation (se_tpu/eval/pesq_np.py) — bark grouping,
absolute thresholds, Zwicker loudness, deadzone and asymmetry — but
expressed in smooth jnp ops so gradients flow to the enhancement model.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..eval import p862_tables as T

FS = 16000
NFFT = 512
HOP = 256
NB = T.NB
SP = 6.910853e-006
SL = 1.866055e-001

_ABS_THRESH = np.asarray(T.ABS_THRESH_POWER)
_POW_CORR = np.asarray(T.POW_DENS_CORRECTION_FACTOR)
_WIDTH_BARK = np.asarray(T.WIDTH_OF_BAND_BARK)
_CENTRE_BARK = np.asarray(T.CENTRE_OF_BAND_BARK)
_NR_HZ = np.asarray(T.NR_OF_HZ_BANDS_PER_BARK_BAND)


@lru_cache(maxsize=1)
def _bark_matrix():
    """[NFFT//2, NB] 0/1 grouping matrix with Sp/correction folded in.

    Cached as numpy (jnp arrays created inside a trace leak tracers)."""
    m = np.zeros((NFFT // 2, NB), np.float32)
    edges = np.concatenate([[0], np.cumsum(_NR_HZ)]).astype(int)
    for b in range(NB):
        m[edges[b] : edges[b + 1], b] = _POW_CORR[b] * SP
    return m


@lru_cache(maxsize=1)
def _consts():
    h = np.where(_CENTRE_BARK < 4.0, 6.0 / (_CENTRE_BARK + 2.0), 1.0)
    h = np.minimum(h, 2.0) ** 0.15
    return (_ABS_THRESH, 0.23 * h, _WIDTH_BARK)


def _sqrt_hann(n: int) -> np.ndarray:
    return np.sqrt(0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n))


def _power_spectra(wav: jnp.ndarray) -> jnp.ndarray:
    """[B, L] -> [B, T, NFFT//2] power spectra of sqrt-hann frames."""
    w = _sqrt_hann(NFFT).astype(np.float32)
    B, L = wav.shape
    n_frames = (L - NFFT) // HOP + 1
    idx = jnp.arange(n_frames)[:, None] * HOP + jnp.arange(NFFT)[None, :]
    frames = wav[:, idx] * w[None, None, :]
    spec = jnp.fft.rfft(frames, n=NFFT)
    return (spec.real**2 + spec.imag**2)[..., : NFFT // 2]


def _loudness(bark: jnp.ndarray) -> jnp.ndarray:
    thresh, zwicker, _ = _consts()
    t = thresh[None, None, :]
    z = zwicker[None, None, :]
    loud = SL * (t / 0.5) ** z * ((0.5 + 0.5 * bark / t) ** z - 1.0)
    return jnp.where(bark > t, jnp.maximum(loud, 0.0), 0.0)


def pmsqe_loss(
    ref_wav: jnp.ndarray,
    deg_wav: jnp.ndarray,
    alpha: float = 0.1,
    beta: float = 0.309,
    bark_eq: bool = True,
    gain_eq: bool = True,
) -> jnp.ndarray:
    """Mean per-frame PMSQE distortion between [B, T] waveforms.

    The reference reshapes waveforms into 1-second segments before
    scoring (tools_for_loss.py:264-265: ``view(N, -1, cfg.fs)``) and the
    level alignment and bark/gain equalization statistics are therefore
    per-SEGMENT time averages, not per-utterance ones.  We reproduce
    that: utterances whose length is a whole number of seconds are
    scored as independent 1-second chunks; utterances longer than a
    second but NOT a whole number of seconds are trimmed to the
    whole-second prefix first (the reference's ``view`` would error on
    such lengths, so per-segment statistics are the only semantics it
    ever exhibits — trimming guarantees them here too).  Sub-second
    utterances are scored whole.  (The reference additionally wraps the
    loss in a PIT permutation over chunks; the identity permutation is
    the minimiser for time-ordered chunks of one source, so it is not
    reproduced.)
    """
    if ref_wav.ndim == 1:
        ref_wav = ref_wav[None]
        deg_wav = deg_wav[None]

    # 1-second chunking (reference semantics): fold whole seconds into
    # the batch so every time-averaged statistic is per-chunk
    B, L = ref_wav.shape
    if L > FS:
        n_sec = L // FS
        ref_wav = ref_wav[:, : n_sec * FS].reshape(B * n_sec, FS)
        deg_wav = deg_wav[:, : n_sec * FS].reshape(B * n_sec, FS)

    p_ref = _power_spectra(ref_wav)  # [B, T, F]
    p_deg = _power_spectra(deg_wav)
    bark_m = _bark_matrix()
    thresh, _, width = _consts()

    bark_ref = p_ref @ bark_m  # [B, T, NB]
    bark_deg = p_deg @ bark_m

    # level alignment to the PESQ standard listening level
    audible_ref = jnp.where(
        bark_ref > thresh[None, None, :] * 100.0, bark_ref, 0.0
    )
    level = jnp.mean(jnp.sum(audible_ref, axis=-1), axis=-1)  # [B]
    scale = 1e7 / (level[:, None, None] + 1e3)
    bark_ref = bark_ref * scale
    bark_deg = bark_deg * scale

    if bark_eq:
        # per-utterance bark-band frequency equalization of the reference
        avg_ref = jnp.mean(bark_ref, axis=1, keepdims=True)
        avg_deg = jnp.mean(bark_deg, axis=1, keepdims=True)
        x = jnp.clip((avg_deg + 1000.0) / (avg_ref + 1000.0), 0.01, 100.0)
        bark_ref = bark_ref * x

    if gain_eq:
        # per-frame gain equalization of the degraded signal
        ta_ref = jnp.sum(
            jnp.where(bark_ref > thresh[None, None, :], bark_ref, 0.0), -1
        )
        ta_deg = jnp.sum(
            jnp.where(bark_deg > thresh[None, None, :], bark_deg, 0.0), -1
        )
        g = jnp.clip(
            (ta_ref + 5e3) / (ta_deg + 5e3), 3e-4, 5.0
        )[..., None]
        bark_deg = bark_deg * g

    loud_ref = _loudness(bark_ref)
    loud_deg = _loudness(bark_deg)

    d = loud_deg - loud_ref
    m = 0.25 * jnp.minimum(loud_deg, loud_ref)
    d = jnp.where(d > m, d - m, jnp.where(d < -m, d + m, 0.0))

    w = width[None, None, :]
    total_w = jnp.sum(width)
    d_sym = jnp.sqrt(jnp.sum((jnp.abs(d) * w) ** 2, -1) / total_w) * total_w

    ratio = ((bark_deg + 50.0) / (bark_ref + 50.0)) ** 1.2
    asym = jnp.where(ratio < 3.0, 0.0, jnp.minimum(ratio, 12.0))
    d_asym = jnp.sum(jnp.abs(d * asym) * w, -1)

    per_frame = alpha * d_sym + beta * d_asym
    return jnp.mean(per_frame)
