"""Loop-style transliteration of the reference's ``composite.m`` — TEST ORACLE.

The reference computes WSS / LLR / segSNR and the CSIG/CBAK/COVL
regressions by shipping 562 lines of MATLAB/Octave out-of-process through
oct2py (/root/reference/tools_for_estimate.py:19-30 ->
/root/reference/composite.m).  Octave and oct2py are absent from this
image, so the framework implementation (`se_tpu/eval/composite.py`, numpy;
`native/composite/composite.cc`, C++) could previously only be pinned to
itself.  This module closes that gap the same way `tests/oracles/
pystoi_ref.py` and `asteroid_pmsqe.py` do: an INDEPENDENT, deliberately
literal restatement of the absent oracle, written per-frame / per-band with
1-based index arithmetic mapped mechanically from the .m source, against
which the vectorised framework code is numerically pinned.

Transliteration rules (provenance ladder):
* Every function mirrors one .m function line-for-line; citations are to
  /root/reference/composite.m.
* MATLAB ``for frame_count = 1:num_frames`` with a non-integer bound
  iterates ``floor(num_frames)`` times (colon semantics).
* MATLAB ``round`` rounds half away from zero (``floor(x + 0.5)`` for
  positive x) — NOT Python/numpy banker's rounding.
* ``&`` inside a while condition short-circuits in MATLAB/Octave, so the
  left peak search exits at n==0 without evaluating ``slope(0)``
  (composite.m:317).
* 1-based arrays are kept 1-based via explicit ``-1`` offsets so each line
  can be eyeballed against the .m.

This file is a TEST-ONLY oracle, not framework code.
"""

from __future__ import annotations

import numpy as np

NUM_CRIT = 25

# composite.m:191-215
CENT_FREQ = [
    50.0000, 120.000, 190.000, 260.000, 330.000, 400.000, 470.000,
    540.000, 617.372, 703.378, 798.717, 904.128, 1020.38, 1148.30,
    1288.72, 1442.54, 1610.70, 1794.16, 1993.93, 2211.08, 2446.71,
    2701.97, 2978.04, 3276.17, 3597.63,
]
BANDWIDTH = [
    70.0000, 70.0000, 70.0000, 70.0000, 70.0000, 70.0000, 70.0000,
    77.3724, 86.0056, 95.3398, 105.411, 116.256, 127.914, 140.423,
    153.823, 168.154, 183.457, 199.776, 217.153, 235.631, 255.255,
    276.072, 298.126, 321.465, 346.136,
]


def matlab_round(x: float) -> int:
    """MATLAB round(): half away from zero (positive args here)."""
    return int(np.floor(x + 0.5))


def _hann_matlab(winlength: int) -> np.ndarray:
    """0.5*(1 - cos(2*pi*(1:winlength)'/(winlength+1))) (composite.m:245)."""
    k = np.arange(1, winlength + 1, dtype=np.float64)
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * k / (winlength + 1)))


def wss_ref(clean_speech: np.ndarray, processed_speech: np.ndarray,
            sample_rate: int) -> np.ndarray:
    """composite.m:151-382, literal per-frame / per-band loops."""
    clean_speech = np.asarray(clean_speech, np.float64)
    processed_speech = np.asarray(processed_speech, np.float64)
    clean_length = len(clean_speech)

    winlength = matlab_round(30 * sample_rate / 1000)  # :175
    skiprate = int(np.floor(winlength / 4))            # :176
    max_freq = sample_rate / 2                         # :177
    num_crit = NUM_CRIT                                # :178
    n_fft = 2 ** int(np.ceil(np.log2(2 * winlength)))  # :182 nextpow2
    n_fftby2 = n_fft // 2                              # :183
    Kmax = 20.0                                        # :184
    Klocmax = 1.0                                      # :185

    min_factor = np.exp(-30.0 / (2.0 * 2.303))         # :226
    # crit_filter(i,:) per band (composite.m:228-236); keep the loop.
    crit_filter = np.zeros((num_crit, n_fftby2))
    for i in range(1, num_crit + 1):
        f0 = (CENT_FREQ[i - 1] / max_freq) * n_fftby2
        bw = (BANDWIDTH[i - 1] / max_freq) * n_fftby2
        norm_factor = np.log(BANDWIDTH[0]) - np.log(BANDWIDTH[i - 1])
        j = np.arange(0, n_fftby2, dtype=np.float64)
        filt = np.exp(-11.0 * (((j - np.floor(f0)) / bw) ** 2) + norm_factor)
        crit_filter[i - 1, :] = filt * (filt > min_factor)

    num_frames = int(np.floor(clean_length / skiprate
                              - (winlength / skiprate)))  # :243 + colon floor
    start = 1                                            # :244 (1-based)
    window = _hann_matlab(winlength)                     # :245

    distortion = np.zeros(num_frames)
    for frame_count in range(1, num_frames + 1):
        clean_frame = clean_speech[start - 1:start - 1 + winlength] * window
        processed_frame = (
            processed_speech[start - 1:start - 1 + winlength] * window
        )

        clean_spec = np.abs(np.fft.fft(clean_frame, n_fft)) ** 2     # :264
        processed_spec = np.abs(np.fft.fft(processed_frame, n_fft)) ** 2

        clean_energy = np.zeros(num_crit)
        processed_energy = np.zeros(num_crit)
        for i in range(1, num_crit + 1):                              # :280-285
            clean_energy[i - 1] = np.sum(
                clean_spec[:n_fftby2] * crit_filter[i - 1, :])
            processed_energy[i - 1] = np.sum(
                processed_spec[:n_fftby2] * crit_filter[i - 1, :])
        clean_energy = 10 * np.log10(np.maximum(clean_energy, 1e-10))  # :286
        processed_energy = 10 * np.log10(
            np.maximum(processed_energy, 1e-10))                       # :287

        # slope(k) = energy(k+1) - energy(k), k = 1..num_crit-1 (:293-296)
        clean_slope = clean_energy[1:] - clean_energy[:-1]
        processed_slope = processed_energy[1:] - processed_energy[:-1]

        clean_loc_peak = np.zeros(num_crit - 1)
        processed_loc_peak = np.zeros(num_crit - 1)
        for i in range(1, num_crit):                                  # :305
            # clean signal (:309-321); E(k)=energy[k-1], S(k)=slope[k-1]
            if clean_slope[i - 1] > 0:       # search right
                n = i
                while n < num_crit and clean_slope[n - 1] > 0:
                    n = n + 1
                clean_loc_peak[i - 1] = clean_energy[(n - 1) - 1]     # :314
            else:                            # search left
                n = i
                while n > 0 and clean_slope[n - 1] <= 0:
                    n = n - 1
                clean_loc_peak[i - 1] = clean_energy[(n + 1) - 1]     # :320
            # processed signal (:325-337)
            if processed_slope[i - 1] > 0:
                n = i
                while n < num_crit and processed_slope[n - 1] > 0:
                    n = n + 1
                processed_loc_peak[i - 1] = processed_energy[(n - 1) - 1]
            else:
                n = i
                while n > 0 and processed_slope[n - 1] <= 0:
                    n = n - 1
                processed_loc_peak[i - 1] = processed_energy[(n + 1) - 1]

        dBMax_clean = np.max(clean_energy)                            # :346
        dBMax_processed = np.max(processed_energy)                    # :347
        Wmax_clean = Kmax / (Kmax + dBMax_clean
                             - clean_energy[: num_crit - 1])          # :357
        Wlocmax_clean = Klocmax / (Klocmax + clean_loc_peak
                                   - clean_energy[: num_crit - 1])    # :359
        W_clean = Wmax_clean * Wlocmax_clean
        Wmax_processed = Kmax / (Kmax + dBMax_processed
                                 - processed_energy[: num_crit - 1])  # :363
        Wlocmax_processed = Klocmax / (
            Klocmax + processed_loc_peak
            - processed_energy[: num_crit - 1])                       # :365
        W_processed = Wmax_processed * Wlocmax_processed
        W = (W_clean + W_processed) / 2.0                             # :369

        d = np.sum(W * (clean_slope[: num_crit - 1]
                        - processed_slope[: num_crit - 1]) ** 2)      # :371
        distortion[frame_count - 1] = d / np.sum(W)                   # :378
        start = start + skiprate                                      # :380
    return distortion


def _lpcoeff_ref(speech_frame: np.ndarray, model_order: int):
    """composite.m:458-487, literal."""
    winlength = len(speech_frame)
    R = np.zeros(model_order + 1)
    for k in range(1, model_order + 2):                               # :465-468
        R[k - 1] = np.sum(speech_frame[: winlength - k + 1]
                          * speech_frame[k - 1:])

    a = np.ones(model_order)                                          # :474
    E = np.zeros(model_order + 1)
    rcoeff = np.zeros(model_order)
    E[0] = R[0]                                                       # :475
    for i in range(1, model_order + 1):                               # :476-483
        a_past = a[: i - 1].copy()
        # sum(a_past(1:i-1) .* R(i:-1:2))
        sum_term = np.sum(a_past * R[i - 1:0:-1]) if i > 1 else 0.0
        rcoeff[i - 1] = (R[i] - sum_term) / E[i - 1]
        a[i - 1] = rcoeff[i - 1]
        if i > 1:
            a[: i - 1] = a_past - rcoeff[i - 1] * a_past[::-1]
        E[i] = (1 - rcoeff[i - 1] * rcoeff[i - 1]) * E[i - 1]

    acorr = R
    refcoeff = rcoeff
    lpparams = np.concatenate(([1.0], -a))                            # :487
    return acorr, refcoeff, lpparams


def llr_ref(clean_speech: np.ndarray, processed_speech: np.ndarray,
            sample_rate: int) -> np.ndarray:
    """composite.m:385-455, literal per-frame loop."""
    clean_speech = np.asarray(clean_speech, np.float64)
    processed_speech = np.asarray(processed_speech, np.float64)
    clean_length = len(clean_speech)

    winlength = matlab_round(30 * sample_rate / 1000)                 # :408
    skiprate = int(np.floor(winlength / 4))                           # :409
    P = 10 if sample_rate < 10000 else 16                             # :410-414

    num_frames = int(np.floor(clean_length / skiprate
                              - (winlength / skiprate)))              # :420
    start = 1
    window = _hann_matlab(winlength)                                  # :422

    distortion = np.zeros(num_frames)
    for frame_count in range(1, num_frames + 1):
        clean_frame = clean_speech[start - 1:start - 1 + winlength] * window
        processed_frame = (
            processed_speech[start - 1:start - 1 + winlength] * window
        )

        R_clean, _, A_clean = _lpcoeff_ref(clean_frame, P)            # :441
        _, _, A_processed = _lpcoeff_ref(processed_frame, P)          # :443

        toep = _toeplitz_ref(R_clean)
        numerator = A_processed @ toep @ A_processed                  # :450
        denominator = A_clean @ toep @ A_clean                        # :451
        distortion[frame_count - 1] = np.log(numerator / denominator)  # :452
        start = start + skiprate
    return distortion


def _toeplitz_ref(r: np.ndarray) -> np.ndarray:
    n = len(r)
    out = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            out[i, j] = r[abs(i - j)]
    return out


def snr_ref(clean_speech: np.ndarray, processed_speech: np.ndarray,
            sample_rate: int):
    """composite.m:492-562, literal."""
    clean_speech = np.asarray(clean_speech, np.float64)
    processed_speech = np.asarray(processed_speech, np.float64)
    clean_length = len(clean_speech)

    overall_snr = 10 * np.log10(
        np.sum(clean_speech ** 2)
        / np.sum((clean_speech - processed_speech) ** 2))             # :516

    winlength = matlab_round(30 * sample_rate / 1000)                 # :525
    skiprate = int(np.floor(winlength / 4))                           # :526
    MIN_SNR = -10.0                                                   # :527
    MAX_SNR = 35.0                                                    # :528

    num_frames = int(np.floor(clean_length / skiprate
                              - (winlength / skiprate)))              # :534
    start = 1
    window = _hann_matlab(winlength)                                  # :536

    eps = np.finfo(np.float64).eps
    segmental_snr = np.zeros(num_frames)
    for frame_count in range(1, num_frames + 1):
        clean_frame = clean_speech[start - 1:start - 1 + winlength] * window
        processed_frame = (
            processed_speech[start - 1:start - 1 + winlength] * window
        )
        signal_energy = np.sum(clean_frame ** 2)                      # :554
        noise_energy = np.sum((clean_frame - processed_frame) ** 2)   # :555
        s = 10 * np.log10(signal_energy / (noise_energy + eps) + eps)  # :556
        s = max(s, MIN_SNR)                                           # :557
        s = min(s, MAX_SNR)                                           # :558
        segmental_snr[frame_count - 1] = s
        start = start + skiprate
    return overall_snr, segmental_snr


def composite_ref(data1: np.ndarray, data2: np.ndarray, srate: int):
    """composite.m:40-89 top level (wav decode aside): returns
    (Csig, Cbak, Covl, segSNR) with pesq_mos = 0, exactly as the .m
    computes before the Python side re-adds the PESQ terms
    (/root/reference/tools_for_estimate.py:27-29)."""
    alpha = 0.95                                                      # :40
    length = min(len(data1), len(data2))                              # :52
    eps = np.finfo(np.float64).eps
    data1 = np.asarray(data1, np.float64)[:length] + eps              # :53
    data2 = np.asarray(data2, np.float64)[:length] + eps              # :54

    wss_dist_vec = np.sort(wss_ref(data1, data2, srate))              # :59-60
    wss_dist = np.mean(
        wss_dist_vec[: matlab_round(len(wss_dist_vec) * alpha)])      # :61

    LLRs = np.sort(llr_ref(data1, data2, srate))                      # :65-66
    LLR_len = matlab_round(len(LLRs) * alpha)                         # :67
    llr_mean = np.mean(LLRs[:LLR_len])                                # :68

    _, segsnr_dist = snr_ref(data1, data2, srate)                     # :72
    segSNR = np.mean(segsnr_dist)                                     # :74

    pesq_mos = 0.0                                                    # :79

    Csig = 3.093 - 1.029 * llr_mean + 0.603 * pesq_mos - 0.009 * wss_dist
    Csig = min(5.0, max(1.0, Csig))                                   # :84-85
    Cbak = 1.634 + 0.478 * pesq_mos - 0.007 * wss_dist + 0.063 * segSNR
    Cbak = min(5.0, max(1.0, Cbak))                                   # :86-87
    Covl = 1.594 + 0.805 * pesq_mos - 0.512 * llr_mean - 0.007 * wss_dist
    Covl = min(5.0, max(1.0, Covl))                                   # :88-89
    return Csig, Cbak, Covl, segSNR
