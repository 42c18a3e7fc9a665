"""Test-only oracle: restatement of the reference's PMSQE loss path —
``Encoder(STFTFB(512, 512, stride=256))`` + ``transforms.mag`` +
``PITLossWrapper(SingleSrcPMSQE(), pit_from='pw_pt')`` over 1-second chunks
(reference: tools_for_loss.py:253-268) — in loop-style numpy/torch.

asteroid is not installable in this environment (zero egress), so this is a
from-knowledge restatement of the pipeline, anchored at three levels:

* the FRONT-END (1-second ``view(N, -1, fs)`` chunking, STFT geometry
  512/256 with asteroid's periodic sqrt-hann default window, the
  ``transforms.mag`` MAGNITUDE — not power — input quirk, and pairwise-PIT
  chunk matching) is read directly off the reference's own call site and
  asteroid's published SingleSrcPMSQE docstring example, which the
  reference copies verbatim;
* every shared PSYCHOACOUSTIC step (bark grouping with power-density
  corrections, absolute thresholds, Zwicker loudness, audible power,
  deadzone masking, asymmetry ratio, width-weighted pseudo-Lp norms, the
  ((P+1e5)/1e7)^0.04 frame weighting with the 45 cap, and the equalizer
  floors/ceilings 0.01/100, 3e-4/5, +1000, +5e3) is pinned to the ITU
  P.862 implementation in this repo that was validated to +-0.0001 MOS
  against the reference's own PESQ.so (se_tpu/eval/pesq_np.py) — the
  PMSQE paper (Martin-Donas et al., IEEE SPL 2018) defines the loss as
  exactly these per-frame PESQ stages without time alignment;
* the one constant that could NOT be recovered (the absolute scale folded
  into the SLL band mask) is DERIVED instead: the mask is the P.862
  fix_power_level 350-3250 Hz band with Parseval-exact conversion from
  half-spectrum |FFT|^2 sums to per-sample time power
  (2 * window_correction / N^2), so the standard-listening-level stage
  estimates precisely the quantity P.862's fix_power_level measures.

Deviations of PMSQE from P.862 that are part of the loss's published
definition (and reproduced here): no time alignment / VAD / silence skip,
stateless per-frame gain compensation (no 0.8/0.2 smoothing), frequency
equalization applied to the DEGRADED spectra, and plain frame averaging
instead of Lpq syllable aggregation.

This module must NEVER be imported by framework code — it pins
``se_tpu/losses/pmsqe.py`` numerically (tests/test_pmsqe.py).
"""

from __future__ import annotations

import itertools

import numpy as np

from se_tpu.eval import p862_tables as T

FS = 16000
NFFT = 512
HOP = 256
NB = T.NB  # 49 bark bands (published ITU-T P.862 constants, validated
#            against the reference's PESQ.so — see module docstring)
SP = 6.910853e-006
SL = 1.866055e-001
ALPHA = 0.1
BETA = 0.309
WINDOW_CORRECTION = 2.0  # sqrt-hann: 1 / mean(w^2) = 1 / mean(hann) = 2

ABS_THRESH = np.asarray(T.ABS_THRESH_POWER, np.float64)
POW_CORR = np.asarray(T.POW_DENS_CORRECTION_FACTOR, np.float64)
WIDTH_BARK = np.asarray(T.WIDTH_OF_BAND_BARK, np.float64)
CENTRE_BARK = np.asarray(T.CENTRE_OF_BAND_BARK, np.float64)
NR_HZ = np.asarray(T.NR_OF_HZ_BANDS_PER_BARK_BAND, int)


def _sqrt_hann_periodic(n):
    """asteroid STFTFB default window: np.hanning(n + 1)[:-1] ** 0.5."""
    return np.hanning(n + 1)[:-1] ** 0.5


def stft_mag(wav):
    """[L] -> [T, 257] magnitude spectra, asteroid Encoder semantics:
    no padding, frame starts k*256, transforms.mag eps inside the sqrt."""
    w = _sqrt_hann_periodic(NFFT)
    n_frames = (len(wav) - NFFT) // HOP + 1
    out = np.empty((n_frames, NFFT // 2 + 1))
    for t in range(n_frames):
        spec = np.fft.rfft(wav[t * HOP : t * HOP + NFFT] * w)
        out[t] = np.sqrt(spec.real**2 + spec.imag**2 + 1e-8)
    return out


def _mask_sll():
    """P.862 fix_power_level band (350..3250 Hz) as a bin mask, scaled so
    that mask . |FFT|^2 is the frame's per-sample time power in that band
    (Parseval: P = 2/(N^2 mean(w^2)) * sum_half |X|^2)."""
    m = np.zeros(NFFT // 2 + 1)  # bin spacing fs/nfft = 31.25 Hz
    m[11] = 0.5 * 25.0 / 31.25  # partial bin at the 350 Hz band edge
    m[12:104] = 1.0
    m[104] = 0.5  # partial bin at the 3250 Hz edge
    return m * WINDOW_CORRECTION * 2.0 / NFFT**2


def magnitude_at_sll(spectra):
    """Scale spectra so the estimated 350-3250 Hz time power is 1e7
    (P.862 fix_power_level target), averaged over all frames."""
    mask = _mask_sll()
    frame_pow = np.array([float(np.dot(sp, mask)) for sp in spectra])
    mean_pow = float(np.mean(frame_pow))
    return spectra * (10000000.0 / mean_pow)


def bark_computation(spectra):
    """[T, 257] -> [T, 49]: P.862 freq warping over bins 0..255 (the
    Nyquist bin is outside the 49-band Hz partition, as in pesq_np)."""
    edges = np.concatenate([[0], np.cumsum(NR_HZ)]).astype(int)
    out = np.empty((spectra.shape[0], NB))
    for t in range(spectra.shape[0]):
        for b in range(NB):
            out[t, b] = (
                np.sum(spectra[t, edges[b] : edges[b + 1]]) * POW_CORR[b] * SP
            )
    return out


def total_audible(bark_frame, factor):
    """Audible power of one frame: bands 1..48 above factor*threshold."""
    tot = 0.0
    for b in range(1, NB):
        if bark_frame[b] > factor * ABS_THRESH[b]:
            tot += bark_frame[b]
    return tot


def bark_freq_equalization(ref_bark, deg_bark):
    """Partial frequency-response compensation, applied to the DEGRADED
    spectra (PMSQE form of P.862's per-band compensation; same +1000
    floor and [0.01, 100] clip, P.862 gating of active frames/bands)."""
    n_frames = ref_bark.shape[0]
    silent = np.array(
        [total_audible(ref_bark[t], 100.0) < 1e7 for t in range(n_frames)]
    )
    eq = np.ones(NB)
    for b in range(NB):
        num = den = 0.0
        for t in range(n_frames):
            if silent[t]:
                continue
            if ref_bark[t, b] > 100.0 * ABS_THRESH[b]:
                num += ref_bark[t, b]
            if deg_bark[t, b] > 100.0 * ABS_THRESH[b]:
                den += deg_bark[t, b]
        eq[b] = min(max((num + 1000.0) / (den + 1000.0), 0.01), 100.0)
    return deg_bark * eq[None, :]


def bark_gain_equalization(ref_bark, deg_bark):
    """Per-frame audible-power gain compensation of the degraded spectra
    (P.862's short-term gain compensation without the 0.8/0.2 smoothing)."""
    out = deg_bark.copy()
    for t in range(deg_bark.shape[0]):
        ta_ref = total_audible(ref_bark[t], 1.0)
        ta_deg = total_audible(deg_bark[t], 1.0)
        g = (ta_ref + 5e3) / (ta_deg + 5e3)
        out[t] = deg_bark[t] * min(max(g, 3e-4), 5.0)
    return out


def loudness(bark):
    """Zwicker-law loudness density (P.862 intensity warping)."""
    h = np.where(CENTRE_BARK < 4.0, 6.0 / (CENTRE_BARK + 2.0), 1.0)
    zwicker = 0.23 * np.minimum(h, 2.0) ** 0.15
    out = np.zeros_like(bark)
    for t in range(bark.shape[0]):
        for b in range(NB):
            if bark[t, b] > ABS_THRESH[b]:
                loud = (
                    SL
                    * (ABS_THRESH[b] / 0.5) ** zwicker[b]
                    * (
                        (0.5 + 0.5 * bark[t, b] / ABS_THRESH[b]) ** zwicker[b]
                        - 1.0
                    )
                )
                out[t, b] = max(loud, 0.0)
    return out


def _pseudo_lp(d_frame, p):
    """Width-weighted p-norm over bands 1..48 (P.862 Lp form)."""
    total_w = float(np.sum(WIDTH_BARK[1:]))
    acc = 0.0
    for b in range(1, NB):
        acc += (abs(d_frame[b]) * WIDTH_BARK[b]) ** p
    return (acc / total_w) ** (1.0 / p) * total_w


def pmsqe_single(est_spectra, ref_spectra, bark_eq=True, gain_eq=True):
    """One (est, ref) chunk pair of [T, 257] magnitude spectra -> scalar
    alpha*D + beta*DA (the SingleSrcPMSQE per-pair value)."""
    ref_sll = magnitude_at_sll(ref_spectra)
    est_sll = magnitude_at_sll(est_spectra)

    ref_bark = bark_computation(ref_sll)
    est_bark = bark_computation(est_sll)

    if bark_eq:
        est_bark = bark_freq_equalization(ref_bark, est_bark)
    if gain_eq:
        est_bark = bark_gain_equalization(ref_bark, est_bark)

    loud_ref = loudness(ref_bark)
    loud_est = loudness(est_bark)

    n_frames = ref_bark.shape[0]
    wd = np.empty(n_frames)
    wda = np.empty(n_frames)
    for t in range(n_frames):
        # deadzone-masked loudness difference
        d = np.empty(NB)
        for b in range(NB):
            diff = loud_est[t, b] - loud_ref[t, b]
            m = 0.25 * min(loud_est[t, b], loud_ref[t, b])
            if diff > m:
                d[b] = diff - m
            elif diff < -m:
                d[b] = diff + m
            else:
                d[b] = 0.0
        # asymmetry factor from the compensated power densities
        da = np.empty(NB)
        for b in range(NB):
            ratio = ((est_bark[t, b] + 50.0) / (ref_bark[t, b] + 50.0)) ** 1.2
            asym = 0.0 if ratio < 3.0 else min(ratio, 12.0)
            da[b] = d[b] * asym
        d_frame = _pseudo_lp(d, 2.0)
        da_frame = _pseudo_lp(da, 1.0)
        # P.862 per-frame weighting by reference audible power, capped
        h = ((total_audible(ref_bark[t], 1.0) + 1e5) / 1e7) ** 0.04
        wd[t] = min(d_frame / h, 45.0)
        wda[t] = min(da_frame / h, 45.0)

    return ALPHA * float(np.mean(wd)) + BETA * float(np.mean(wda))


def pmsqe_ref(est_wav, ref_wav, bark_eq=True, gain_eq=True):
    """Full reference path: [B, L] waveforms -> scalar loss.

    Mirrors tools_for_loss.py:257-268: view(B, -1, fs) chunking, STFT +
    magnitude per chunk, then PITLossWrapper('pw_pt') semantics — the
    pairwise loss matrix over chunks-as-sources, the best permutation per
    batch item, and the mean best loss over the batch."""
    est_wav = np.asarray(est_wav, np.float64)
    ref_wav = np.asarray(ref_wav, np.float64)
    B, L = est_wav.shape
    assert L % FS == 0, "reference view(N, -1, fs) requires whole seconds"
    n_src = L // FS
    est_chunks = est_wav.reshape(B, n_src, FS)
    ref_chunks = ref_wav.reshape(B, n_src, FS)

    batch_losses = []
    for b in range(B):
        est_specs = [stft_mag(est_chunks[b, i]) for i in range(n_src)]
        ref_specs = [stft_mag(ref_chunks[b, j]) for j in range(n_src)]
        pw = np.empty((n_src, n_src))
        for i in range(n_src):
            for j in range(n_src):
                pw[i, j] = pmsqe_single(
                    est_specs[i], ref_specs[j], bark_eq, gain_eq
                )
        best = min(
            float(np.mean([pw[pi, j] for j, pi in enumerate(perm)]))
            for perm in itertools.permutations(range(n_src))
        )
        batch_losses.append(best)
    return float(np.mean(batch_losses))
