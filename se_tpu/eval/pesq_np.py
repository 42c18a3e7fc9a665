"""PESQ — ITU-T P.862.2 (wideband, 16 kHz) in pure numpy.

An independent implementation of the published Recommendation: level
alignment, input filtering, voice-activity detection, two-stage time
alignment, the 49-band bark psychoacoustic model, and the wideband
MOS-LQO mapping.  Validated end-to-end against the reference oracle
binary (reference: PESQ.so, called per tools_for_estimate.py:51-75).

Constants are the published P.862 tables (se_tpu/eval/p862_tables.py).
This module is the algorithmic specification; native/pesq/pesq.cc is the
optimised C++ port used in the validation hot loop.

Validation status vs the ITU oracle binary (tools/pesq_oracle_battery.py):
identical/gain-scaled pairs are exact; time-ALIGNED degradations (additive
noise at any SNR, gain modulation, different signals, spectral shaping)
agree within ~0.002-0.03 MOS — the regime of enhancement validation, where
model outputs are sample-aligned with the clean reference.  Signals with
bulk time shifts score systematically differently (the oracle's
utterance-based split alignment interacts with signal edges in ways this
implementation approximates with a global fine alignment); if
PESQ-of-delayed-signals matters for a use case, extend the alignment to
the per-utterance machinery.
"""

from __future__ import annotations

import numpy as np

from . import p862_tables as T

FS = 16000
DOWNSAMPLE = T.DOWNSAMPLE  # 64
NB = T.NB  # 49
SEARCHBUFFER = 75
DATAPADDING_MSECS = 320
ALIGN_NFFT = T.ALIGN_NFFT  # 1024
NF = DOWNSAMPLE * 8  # 512 analysis window
TARGET_POWER = 1e7

SP = 6.910853e-006  # Sp, 16 kHz model
SL = 1.866055e-001  # Sl, 16 kHz model

ABS_THRESH = np.asarray(T.ABS_THRESH_POWER)
POW_CORR = np.asarray(T.POW_DENS_CORRECTION_FACTOR)
WIDTH_BARK = np.asarray(T.WIDTH_OF_BAND_BARK)
CENTRE_BARK = np.asarray(T.CENTRE_OF_BAND_BARK)
NR_HZ_BANDS = np.asarray(T.NR_OF_HZ_BANDS_PER_BARK_BAND)
ALIGN_FILTER_DB = np.asarray(T.ALIGN_FILTER_DB)
WB_IIR = np.asarray(T.WB_IN_IIR_HSOS[0])


def _datapadding_samples() -> int:
    return DATAPADDING_MSECS * (FS // 1000)


def _pad_signal(x: np.ndarray) -> np.ndarray:
    buf = SEARCHBUFFER * DOWNSAMPLE
    return np.concatenate(
        [np.zeros(buf), x, np.zeros(buf + _datapadding_samples())]
    )


def _pow_of(x: np.ndarray, start: int, end: int, divisor: int) -> float:
    return float(np.sum(x[start:end] ** 2) / divisor)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _apply_filter_db(x: np.ndarray, nsamples: int, filt: np.ndarray) -> np.ndarray:
    """FFT-domain piecewise-linear dB filter over the active region."""
    buf = SEARCHBUFFER * DOWNSAMPLE
    n = nsamples - 2 * buf + _datapadding_samples()
    pow2 = _next_pow2(n)
    seg = np.zeros(pow2)
    seg[:n] = x[buf : buf + n]
    X = np.fft.rfft(seg)
    freqs = np.arange(len(X)) * float(FS) / pow2
    gains_db = np.interp(freqs, filt[:, 0], filt[:, 1])
    X *= 10.0 ** (gains_db / 20.0)
    out = x.copy()
    out[buf : buf + n] = np.fft.irfft(X, n=pow2)[:n]
    return out


def fix_power_level(x: np.ndarray, nsamples: int) -> np.ndarray:
    """Scale to TARGET_POWER measured above ~300 Hz (P.862 level align)."""
    buf = SEARCHBUFFER * DOWNSAMPLE
    filtered = _apply_filter_db(x, nsamples, ALIGN_FILTER_DB)
    dp = _datapadding_samples()
    power = _pow_of(
        filtered, buf, nsamples - buf + dp, nsamples - 2 * buf + dp
    )
    return x * np.sqrt(TARGET_POWER / power)


def _iir_sos(x: np.ndarray, sos: np.ndarray) -> np.ndarray:
    """Biquad sections h = [b0, b1, b2, a1, a2]."""
    from scipy.signal import lfilter

    y = x
    for sec in np.atleast_2d(sos):
        b = np.array([sec[0], sec[1], sec[2]])
        a = np.array([1.0, sec[3], sec[4]])
        y = lfilter(b, a, y)
    return y


def dc_block(x: np.ndarray, nsamples: int) -> np.ndarray:
    buf = SEARCHBUFFER * DOWNSAMPLE
    out = x.copy()
    region = slice(buf, nsamples - buf)
    facc = np.sum(x[region]) / (nsamples - 2 * buf)
    out[region] = x[region] - facc
    ramp = (np.arange(DOWNSAMPLE) + 0.5) / DOWNSAMPLE
    out[buf : buf + DOWNSAMPLE] *= ramp
    out[nsamples - buf - DOWNSAMPLE : nsamples - buf] *= ramp[::-1]
    return out


def apply_vad(x: np.ndarray, nsamples: int):
    """Frame-power VAD -> (VAD, logVAD) (P.862 apply_VAD)."""
    nwin = nsamples // DOWNSAMPLE
    frames = x[: nwin * DOWNSAMPLE].reshape(nwin, DOWNSAMPLE)
    vad = np.sum(frames**2, axis=1) / DOWNSAMPLE

    level_thresh = float(np.mean(vad))
    level_min = float(np.max(vad)) * 1.0e-4
    if level_min > 0:
        vad = np.maximum(vad, level_min)
    else:
        level_min = 1.0

    # iterative noise-floor refinement
    for _ in range(12):
        below = vad[vad <= level_thresh]
        if len(below) == 0:
            break
        level_noise = float(np.mean(below))
        if abs(level_thresh - 1.001 * level_noise) < 1e-12 * level_thresh:
            break
        level_thresh = 1.001 * level_noise

    # activity smoothing: join short gaps, drop short bursts
    active = vad > level_thresh
    # join gaps of <= 2 windows surrounded by activity
    for i in range(1, nwin - 1):
        if not active[i] and active[i - 1] and (
            active[min(i + 1, nwin - 1)] or active[min(i + 2, nwin - 1)]
        ):
            active[i] = True
    # drop isolated single-window bursts
    for i in range(1, nwin - 1):
        if active[i] and not active[i - 1] and not active[i + 1]:
            active[i] = False

    logvad = np.where(active, np.log(np.maximum(vad / level_thresh, 1e-30)), 0.0)
    logvad = np.maximum(logvad, 0.0)
    return vad, logvad


def crude_align(log_vad_ref: np.ndarray, log_vad_deg: np.ndarray) -> int:
    """Whole-signal crude delay estimate via logVAD cross-correlation.

    Returns the delay estimate in samples.
    """
    nr, nd = len(log_vad_ref), len(log_vad_deg)
    n = max(nr, nd)
    pow2 = _next_pow2(2 * n)
    R = np.fft.rfft(log_vad_ref, pow2)
    D = np.fft.rfft(log_vad_deg, pow2)
    corr = np.fft.irfft(np.conj(R) * D, pow2)
    # lags: positive lag k means deg delayed by k windows
    lags = np.concatenate([np.arange(0, pow2 // 2), np.arange(-pow2 // 2, 0)])
    best = int(np.argmax(corr))
    return int(lags[best]) * DOWNSAMPLE


# ---------------------------------------------------------------------------
# Psychoacoustic model
# ---------------------------------------------------------------------------

def _hann(n: int) -> np.ndarray:
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))


def _short_term_ffts(x: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """|FFT|^2 spectra of Nf-sample hann frames at given start samples."""
    w = _hann(NF)
    idx = starts[:, None] + np.arange(NF)[None, :]
    frames = x[idx] * w[None, :]
    spec = np.fft.rfft(frames, axis=-1)
    return (spec.real**2 + spec.imag**2)[:, : NF // 2]


def _freq_warping(hz_spectrum: np.ndarray) -> np.ndarray:
    """Group Hz bins into the 49 bark bands: [T, Nf/2] -> [T, 49]."""
    edges = np.concatenate([[0], np.cumsum(NR_HZ_BANDS)]).astype(int)
    bands = np.add.reduceat(hz_spectrum, edges[:-1], axis=-1)
    return bands * POW_CORR[None, :] * SP


def _total_audible(pitch_pow: np.ndarray, factor: float) -> np.ndarray:
    """Per-frame audible power, bands 1..Nb-1 above factor*threshold."""
    audible = pitch_pow[:, 1:] > (ABS_THRESH[1:] * factor)[None, :]
    return np.sum(np.where(audible, pitch_pow[:, 1:], 0.0), axis=1)


def _intensity_warping(pitch_pow: np.ndarray) -> np.ndarray:
    """Zwicker-law loudness density per band."""
    h = np.where(CENTRE_BARK < 4.0, 6.0 / (CENTRE_BARK + 2.0), 1.0)
    h = np.minimum(h, 2.0) ** 0.15
    zwicker = 0.23 * h  # modified zwicker power per band
    t = ABS_THRESH[None, :]
    z = zwicker[None, :]
    loud = (
        SL
        * (t / 0.5) ** z
        * ((0.5 + 0.5 * pitch_pow / t) ** z - 1.0)
    )
    return np.where(pitch_pow > t, np.maximum(loud, 0.0), 0.0)


def _pseudo_lp(d: np.ndarray, p: float) -> np.ndarray:
    """Width-weighted p-norm over bands 1..Nb-1, per frame."""
    w = WIDTH_BARK[1:][None, :]
    h = np.abs(d[:, 1:]) * w
    total_w = np.sum(WIDTH_BARK[1:])
    res = (np.sum(h**p, axis=1) / total_w) ** (1.0 / p)
    return res * total_w


def psychoacoustic_model(
    ref: np.ndarray,
    deg: np.ndarray,
    nsamples: int,
    frame_delays: np.ndarray | None = None,
) -> float:
    """Raw P.862 score from aligned padded signals.

    frame_delays: optional per-frame deg sample offsets (time alignment);
    zeros when signals are aligned (the enhancement-validation case).
    """
    buf = SEARCHBUFFER * DOWNSAMPLE
    # frame loop covers the active signal only; the datapadding tail exists
    # for alignment search margins, not for the model
    n_frames = (nsamples - 2 * buf) // (NF // 2) - 1
    starts_ref = buf + np.arange(n_frames) * (NF // 2)
    if frame_delays is None:
        frame_delays = np.zeros(n_frames, dtype=int)
    starts_deg = np.clip(starts_ref + frame_delays, 0, len(deg) - NF)

    hz_ref = _short_term_ffts(ref, starts_ref)
    hz_deg = _short_term_ffts(deg, starts_deg)
    ppd_ref = _freq_warping(hz_ref)  # [T, 49]
    ppd_deg = _freq_warping(hz_deg)

    # silent-frame classification for the frequency compensation average
    silent = _total_audible(ppd_ref, 1e2) < 1e7
    n_total = n_frames

    # time-averaged audible spectra: per-band gating above 100x threshold,
    # non-silent frames only, divisor is the TOTAL frame count
    mask = (~silent)[:, None] & (ppd_ref > 100.0 * ABS_THRESH[None, :])
    avg_ref = np.sum(np.where(mask, ppd_ref, 0.0), axis=0) / n_total
    mask_d = (~silent)[:, None] & (ppd_deg > 100.0 * ABS_THRESH[None, :])
    avg_deg = np.sum(np.where(mask_d, ppd_deg, 0.0), axis=0) / n_total

    # partial frequency-response compensation (applied to ref)
    x = np.clip((avg_deg + 1000.0) / (avg_ref + 1000.0), 0.01, 100.0)
    mod_ref = ppd_ref * x[None, :]

    # partial short-term gain compensation (applied to DEG, matching ref)
    ta_ref = _total_audible(mod_ref, 1.0)
    ta_deg = _total_audible(ppd_deg, 1.0)
    raw_scale = (ta_ref + 5e3) / (ta_deg + 5e3)
    scale = np.empty(n_frames)
    old = 1.0
    for f in range(n_frames):
        s = raw_scale[f]
        if f > 0:
            s = 0.2 * old + 0.8 * s
        old = s
        scale[f] = min(max(s, 3e-4), 5.0)
    mod_deg = ppd_deg * scale[:, None]

    loud_ref = _intensity_warping(mod_ref)
    loud_deg = _intensity_warping(mod_deg)

    d = loud_deg - loud_ref
    m = 0.25 * np.minimum(loud_deg, loud_ref)
    d = np.where(d > m, d - m, np.where(d < -m, d + m, 0.0))

    # asymmetry factor from the (compensated) power densities
    ratio = ((mod_deg + 50.0) / (mod_ref + 50.0)) ** 1.2
    asym = np.where(ratio < 3.0, 0.0, np.minimum(ratio, 12.0))

    frame_dist = _pseudo_lp(d, 2.0)
    frame_dist_asym = _pseudo_lp(d * asym, 1.0)

    # bad-interval realignment on the RAW disturbances: heavily disturbed
    # stretches are re-searched for a better deg alignment and keep the
    # minimum disturbance (P.862 bad-frame processing)
    frame_dist, frame_dist_asym = _reprocess_bad_intervals(
        ref, deg, starts_ref, frame_delays, x, scale, ta_ref,
        frame_dist, frame_dist_asym,
    )

    # per-frame weighting by reference power, then cap
    h = ((ta_ref + 1e5) / 1e7) ** 0.04
    frame_dist = np.minimum(frame_dist / h, 45.0)
    frame_dist_asym = np.minimum(frame_dist_asym / h, 45.0)

    d_ind = _lpq_weight(frame_dist)
    a_ind = _lpq_weight(frame_dist_asym)
    return 4.5 - 0.1 * d_ind - 0.0309 * a_ind


THRESHOLD_BAD_FRAMES = 30.0
SMEAR_RANGE = 2
MIN_BAD_INTERVAL = 5


def _frame_pair_disturbance(ref_frame_spec, deg_frame_spec, comp_x):
    """Raw disturbance of one frame, recomputing the local gain scale."""
    ppd_ref = _freq_warping(ref_frame_spec[None, :])[0]
    ppd_deg = _freq_warping(deg_frame_spec[None, :])[0]
    mod_ref = ppd_ref * comp_x
    ta_ref = float(_total_audible(mod_ref[None, :], 1.0)[0])
    ta_deg = float(_total_audible(ppd_deg[None, :], 1.0)[0])
    scale = min(max((ta_ref + 5e3) / (ta_deg + 5e3), 3e-4), 5.0)
    mod_deg = ppd_deg * scale
    loud_ref = _intensity_warping(mod_ref[None, :])[0]
    loud_deg = _intensity_warping(mod_deg[None, :])[0]
    d = loud_deg - loud_ref
    m = 0.25 * np.minimum(loud_deg, loud_ref)
    d = np.where(d > m, d - m, np.where(d < -m, d + m, 0.0))
    ratio = ((mod_deg + 50.0) / (mod_ref + 50.0)) ** 1.2
    asym = np.where(ratio < 3.0, 0.0, np.minimum(ratio, 12.0))
    fd = float(_pseudo_lp(d[None, :], 2.0)[0])
    fda = float(_pseudo_lp((d * asym)[None, :], 1.0)[0])
    return fd, fda


BAD_INTERVAL_SEARCH = 2048  # samples of margin each side of a bad interval


def compute_delay(t1: np.ndarray, t2: np.ndarray, start: int, stop: int,
                  search_range: int):
    """P.862 compute_delay: rectified FFT cross-correlation of two series.

    Returns (best_delay, best_correlation).  Verified numerically exact
    against the oracle's exported compute_delay.
    """
    n = stop - start
    pow2 = _next_pow2(2 * search_range + n)
    e1 = np.sum(t1[start:stop].astype(np.float64) ** 2)
    e2 = np.sum(t2[start:stop].astype(np.float64) ** 2)
    norm = np.sqrt(e1 * e2)
    if norm <= 0:
        return 0, 0.0
    x1 = np.zeros(pow2)
    x2 = np.zeros(pow2)
    x1[:n] = np.abs(t1[start:stop])
    x2[:n] = np.abs(t2[start:stop])
    corr = np.fft.irfft(
        np.conj(np.fft.rfft(x1)) * np.fft.rfft(x2), pow2
    )
    lags = np.arange(-search_range, search_range + 1)
    vals = corr[lags % pow2]
    best = int(np.argmax(vals))
    return int(lags[best]), float(vals[best] / norm)


def _reprocess_bad_intervals(ref, deg, starts_ref, frame_delays, comp_x,
                             comp_scale, ta_ref_arr, frame_dist, frame_dist_asym):
    """P.862 bad-frame processing: find heavily disturbed intervals,
    re-search the deg alignment with compute_delay over a +-2048 sample
    margin, and keep the per-frame minimum disturbance."""
    n_frames = len(frame_dist)
    bad = frame_dist > THRESHOLD_BAD_FRAMES
    if not np.any(bad):
        return frame_dist, frame_dist_asym
    # morphological closing: a frame is smeared-bad if itself bad or if bad
    # frames exist within SMEAR_RANGE on BOTH sides
    smeared = np.zeros(n_frames, bool)
    for f in range(n_frames):
        lo, hi = max(0, f - SMEAR_RANGE), min(n_frames, f + SMEAR_RANGE + 1)
        left = np.any(bad[lo : f + 1])
        right = np.any(bad[f:hi])
        smeared[f] = left and right

    buf = SEARCHBUFFER * DOWNSAMPLE
    active_lo = buf
    active_hi = min(len(ref), len(deg)) - buf

    w = _hann(NF)
    frame_dist = frame_dist.copy()
    frame_dist_asym = frame_dist_asym.copy()

    f = 0
    while f < n_frames:
        if not smeared[f]:
            f += 1
            continue
        g = f
        while g < n_frames and smeared[g]:
            g += 1
        if g - f >= MIN_BAD_INTERVAL:
            s0 = int(starts_ref[f])
            s1 = int(starts_ref[g - 1]) + NF
            n_int = s1 - s0
            # extended +-2048 copies, clamped to the active region
            idx = np.clip(
                np.arange(s0 - BAD_INTERVAL_SEARCH, s1 + BAD_INTERVAL_SEARCH),
                active_lo, active_hi - 1,
            )
            seg_ref = ref[idx]
            d0 = int(frame_delays[f])
            idx_d = np.clip(idx + d0, active_lo, active_hi - 1)
            seg_deg = deg[idx_d]
            delta, corr = compute_delay(
                seg_ref, seg_deg, 0, len(seg_ref), BAD_INTERVAL_SEARCH
            )
            if corr < 0.5:
                delta = 0
            if delta != 0:
                new_delay = d0 + delta
                for fr in range(f, g):
                    sr = int(starts_ref[fr])
                    sd = sr + new_delay
                    if sd < 0 or sd + NF > len(deg):
                        continue
                    rspec = np.abs(
                        np.fft.rfft(ref[sr : sr + NF] * w)
                    )[: NF // 2] ** 2
                    dspec = np.abs(
                        np.fft.rfft(deg[sd : sd + NF] * w)
                    )[: NF // 2] ** 2
                    fd, fda = _frame_pair_disturbance(rspec, dspec, comp_x)
                    frame_dist[fr] = min(frame_dist[fr], fd)
                    frame_dist_asym[fr] = min(frame_dist_asym[fr], fda)
        f = g
    return frame_dist, frame_dist_asym


def _lpq_weight(frame_dist: np.ndarray, p_syl: float = 6.0, p_time: float = 2.0,
                frames_per_syllable: int = 20) -> float:
    n = len(frame_dist)
    result_time = 0.0
    total_time_weight = 0.0
    for start in range(0, n, frames_per_syllable // 2):
        seg = frame_dist[start : start + frames_per_syllable]
        if len(seg) == 0:
            continue
        # divisor is the full window length even for the truncated tail
        r = (float(np.sum(seg**p_syl)) / frames_per_syllable) ** (1.0 / p_syl)
        result_time += r**p_time
        total_time_weight += 1.0
    return (result_time / total_time_weight) ** (1.0 / p_time)


def _wb_mos_mapping(raw: float) -> float:
    return 0.999 + 4.0 / (1.0 + np.exp(-1.3669 * raw + 3.8224))


def pesq_wb_np(clean: np.ndarray, degraded: np.ndarray) -> float:
    """End-to-end P.862.2 wideband PESQ MOS-LQO at 16 kHz."""
    ref = _pad_signal(np.asarray(clean, np.float64))
    deg = _pad_signal(np.asarray(degraded, np.float64))
    nr = len(clean) + 2 * SEARCHBUFFER * DOWNSAMPLE
    nd = len(degraded) + 2 * SEARCHBUFFER * DOWNSAMPLE

    ref = fix_power_level(ref, nr)
    deg = fix_power_level(deg, nd)

    # P.862.2 wideband input filter (single IIR section)
    ref = _iir_sos(ref, WB_IIR)
    deg = _iir_sos(deg, WB_IIR)

    ref = dc_block(ref, nr)
    deg = dc_block(deg, nd)

    _, logvad_ref = apply_vad(ref, nr)
    _, logvad_deg = apply_vad(deg, nd)
    delay = crude_align(logvad_ref, logvad_deg)

    n = min(nr, nd)
    buf = SEARCHBUFFER * DOWNSAMPLE
    # sample-accurate refinement of the crude (window-granular) estimate —
    # the role of the reference's per-utterance split alignment
    lo, hi = buf, n - buf
    if 0 <= lo + delay and hi + delay <= len(deg):
        fine, corr = compute_delay(
            ref[lo:hi], deg[lo + delay : hi + delay], 0, hi - lo,
            2 * DOWNSAMPLE,
        )
        if corr >= 0.5:
            delay += fine

    n_frames = (n - 2 * SEARCHBUFFER * DOWNSAMPLE) // (NF // 2) - 1
    frame_delays = np.full(n_frames, delay, dtype=int)
    raw = psychoacoustic_model(ref, deg, n, frame_delays)
    return float(_wb_mos_mapping(raw))


def pesq_np(clean: np.ndarray, degraded: np.ndarray, fs: int = 16000) -> float:
    """fs-dispatching entry matching the reference front-end's nb/wb split
    (reference: tools_for_estimate.py:40-45)."""
    if fs == 16000:
        return pesq_wb_np(clean, degraded)
    raise NotImplementedError(f"PESQ model for fs={fs} not implemented")
