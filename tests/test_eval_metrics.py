"""Sanity + property tests for the evaluation stack (STOI, composite, SNR)."""

import numpy as np
import pytest

from se_tpu.eval.stoi import stoi
from se_tpu.eval.composite import (
    wss,
    llr,
    snr_measures,
    composite_measures,
    _lpcoeff,
    _toeplitz,
)
from se_tpu.eval.metrics import cal_snr


def _speechlike(rng, n=32000, fs=16000):
    """Modulated multi-tone 'speech': broadbandish, non-stationary."""
    t = np.arange(n) / fs
    env = 0.5 + 0.5 * np.sin(2 * np.pi * 3 * t)
    sig = sum(
        np.sin(2 * np.pi * f * t + rng.uniform(0, 6)) / (i + 1)
        for i, f in enumerate((220, 440, 880, 1320, 2500))
    )
    sig = env * sig + 0.01 * rng.standard_normal(n)
    return (0.3 * sig / np.max(np.abs(sig))).astype(np.float64)


def test_stoi_clean_is_high(rng):
    x = _speechlike(rng)
    assert stoi(x, x, 16000) > 0.99


def test_stoi_monotonic_with_noise(rng):
    x = _speechlike(rng)
    scores = []
    for snr_db in (20, 5, -5):
        noise = rng.standard_normal(len(x))
        noise *= np.sqrt(np.mean(x**2) / np.mean(noise**2) * 10 ** (-snr_db / 10))
        scores.append(stoi(x, x + noise, 16000))
    assert scores[0] > scores[1] > scores[2], scores
    assert scores[0] > 0.7  # tonal test signals score lower than speech
    assert scores[2] < 0.6


def test_stoi_numerical_parity_vs_pystoi_restatement(rng):
    """Golden pin of se_tpu.eval.stoi against the loop-style pystoi 0.3.3
    restatement (tests/oracles/pystoi_ref.py) — the scorer the reference
    calls (tools_for_estimate.py:90-95, extended=False).  Covers noisy
    mixtures at several SNRs, identical/scaled pairs, silence-heavy
    signals (VAD mask active) and a short utterance; this resolves the
    band-edge/VAD/frame-count off-by-ones property tests cannot see."""
    from tests.oracles.pystoi_ref import stoi as ref_stoi

    cases = []
    x = _speechlike(rng)
    for snr_db in (15, 5, 0, -5):
        noise = rng.standard_normal(len(x))
        noise *= np.sqrt(
            np.mean(x**2) / np.mean(noise**2) * 10 ** (-snr_db / 10)
        )
        cases.append((x, x + noise))
    cases.append((x, x))  # identical
    cases.append((x, 0.3 * x))  # pure gain
    sil = _speechlike(rng).copy()
    sil[:12000] *= 1e-4  # leading near-silence: VAD mask engages
    cases.append((sil, sil + 0.02 * rng.standard_normal(len(sil))))
    short = _speechlike(rng, n=12000)
    cases.append((short, short + 0.05 * rng.standard_normal(12000)))

    for clean, deg in cases:
        mine = stoi(clean, deg, 16000)
        ref = ref_stoi(clean, deg, 16000)
        assert mine == pytest.approx(ref, abs=1e-10), (mine, ref)


def test_stoi_resampler_matches_octave_window(rng):
    """The 16 kHz -> 10 kHz front-end must use pystoi's Octave-compatible
    Kaiser window, not scipy's default firwin design."""
    from tests.oracles.pystoi_ref import resample_oct
    from se_tpu.eval.stoi import _oct_window
    from scipy.signal import resample_poly

    x = _speechlike(rng)
    mine = resample_poly(x, 5, 8, window=_oct_window(10000, 16000))
    ref = resample_oct(x, 10000, 16000)
    np.testing.assert_allclose(mine, ref, atol=1e-14)


def test_estoi_numerical_parity_vs_pystoi_restatement(rng):
    """extended=True (ESTOI) against the pystoi restatement.  pystoi adds
    ``standard_normal * eps`` dither inside its row/column normalisation;
    at eps ~2.2e-16 its effect on the score is below 1e-12, so the
    deterministic implementation pins to 1e-9."""
    from tests.oracles.pystoi_ref import stoi as ref_stoi

    x = _speechlike(rng)
    for snr_db in (15, 0, -5):
        noise = rng.standard_normal(len(x))
        noise *= np.sqrt(
            np.mean(x**2) / np.mean(noise**2) * 10 ** (-snr_db / 10)
        )
        y = x + noise
        np.testing.assert_allclose(
            stoi(x, y, 16000, extended=True),
            ref_stoi(x, y, 16000, extended=True),
            atol=1e-9,
        )


def test_stoi_degenerate_inputs_match_pystoi_guard(rng):
    """Short or mostly-silent signals must return pystoi's 1e-5 guard
    value (fewer than N=30 STFT frames after silence removal), never
    crash the validation scoring thread."""
    from tests.oracles.pystoi_ref import stoi as ref_stoi

    # one 0.2 s burst in 3 s of digital silence: VAD drops most frames
    x = np.zeros(48000)
    t = np.arange(3200) / 16000.0
    x[10000:13200] = 0.3 * np.sin(2 * np.pi * 300 * t)
    y = x + 1e-6 * rng.standard_normal(len(x))
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        assert stoi(x, y, 16000) == ref_stoi(x, y, 16000) == 1e-5
        # sub-frame-length signal
        x2 = 0.1 * rng.standard_normal(3000)
        y2 = x2 + 0.01 * rng.standard_normal(3000)
        assert stoi(x2, y2, 16000) == ref_stoi(x2, y2, 16000) == 1e-5
    # pure silence must not crash either
    z = np.zeros(48000)
    assert np.isfinite(stoi(z, z, 16000))


def test_wss_zero_for_identical(rng):
    x = _speechlike(rng)
    d = wss(x, x, 16000)
    assert np.allclose(d, 0, atol=1e-8)


def test_llr_zero_for_identical(rng):
    x = _speechlike(rng)
    d = llr(x, x, 16000)
    assert np.allclose(d, 0, atol=1e-8)


def test_seg_snr_capped_for_identical(rng):
    x = _speechlike(rng)
    overall, seg = snr_measures(x, x + 1e-12, 16000)
    assert np.all(seg == 35.0)


def test_composite_degrades_with_noise(rng):
    x = _speechlike(rng)
    noise = 0.05 * rng.standard_normal(len(x))
    csig1, cbak1, covl1, seg1 = composite_measures(x, x + 0.001 * noise, 16000)
    csig2, cbak2, covl2, seg2 = composite_measures(x, x + noise, 16000)
    assert seg1 > seg2
    assert cbak1 >= cbak2


def test_composite_numerical_parity_vs_octave_restatement(rng):
    """Golden pin of WSS/LLR/segSNR and the CSIG/CBAK/COVL assembly against
    the loop-style literal transliteration of composite.m
    (tests/oracles/octave_composite.py) — the Octave program the reference
    executes through oct2py (tools_for_estimate.py:19-30).  This is what
    caught (a) the WSS right-search taking the band AT the local peak where
    composite.m:314 takes the band one BELOW it, and (b) Python banker's
    round vs MATLAB half-away rounding in the trimmed-mean lengths."""
    from tests.oracles.octave_composite import (
        composite_ref,
        llr_ref,
        snr_ref,
        wss_ref,
    )

    x = _speechlike(rng)
    fs = 16000
    cases = [x + 0.001 * rng.standard_normal(len(x))]
    for snr_db in (15, 0):
        noise = rng.standard_normal(len(x))
        noise *= np.sqrt(
            np.mean(x**2) / np.mean(noise**2) * 10 ** (-snr_db / 10)
        )
        cases.append(x + noise)
    # ragged length (frame-count floor semantics) and a short utterance
    cases.append((x + 0.05 * rng.standard_normal(len(x)))[: len(x) - 731])
    for y in cases:
        c = x[: len(y)]
        np.testing.assert_allclose(
            wss(c, y, fs), wss_ref(c, y, fs), rtol=1e-10, atol=1e-10
        )
        np.testing.assert_allclose(
            llr(c, y, fs), llr_ref(c, y, fs), rtol=1e-8, atol=1e-10
        )
        overall, seg = snr_measures(c, y, fs)
        overall_r, seg_r = snr_ref(c, y, fs)
        np.testing.assert_allclose(overall, overall_r, rtol=1e-12)
        np.testing.assert_allclose(seg, seg_r, rtol=1e-12, atol=1e-12)
        ref = np.asarray(composite_ref(c, y, fs))
        for prefer_native in (False, True):
            got = np.asarray(
                composite_measures(c, y, fs, prefer_native=prefer_native)
            )
            np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9)


def test_lpcoeff_matches_direct_solve(rng):
    """LPC via Levinson-Durbin must solve the Toeplitz normal equations."""
    frames = rng.standard_normal((3, 480))
    R, A = _lpcoeff(frames, 16)
    for t in range(3):
        toep = _toeplitz(R[t][:-1])
        rhs = R[t][1:]
        a_direct = np.linalg.solve(toep, rhs)
        np.testing.assert_allclose(-A[t][1:], a_direct, rtol=1e-6, atol=1e-8)


def test_cal_snr_reference_formula(rng):
    clean = _speechlike(rng)
    noise = 0.1 * rng.standard_normal(len(clean))
    val = cal_snr(clean + noise, clean)
    expect = 10 * np.log10(
        np.sum(np.mean((clean - clean.mean()) ** 2))
        / np.sum(np.mean((noise - noise.mean()) ** 2))
        + 1e-8
    )
    np.testing.assert_allclose(val, expect, atol=0.3)


def test_check_object_metrics_cli(tmp_path, rng):
    """Offline checker end-to-end: wav pair -> PESQ/STOI/CSIG/CBAK/COVL."""
    from se_tpu.data.synth import write_wav
    from se_tpu.eval.check_object_metrics import check_pair, check_dirs

    clean = _speechlike(rng)
    enhanced = clean + 0.01 * rng.standard_normal(len(clean))
    cp = str(tmp_path / "target_x.wav")
    ep = str(tmp_path / "estimated_x.wav")
    write_wav(cp, clean, 16000)
    write_wav(ep, enhanced, 16000)

    pesq_s, stoi_s, csig, cbak, covl, ssnr = check_pair(cp, ep)
    assert 1.0 <= pesq_s <= 4.7
    assert 0.0 < stoi_s <= 1.0
    assert 1.0 <= cbak  # can exceed 5 (reference PESQ re-add quirk)
    assert np.isfinite([csig, covl, ssnr]).all()

    # directory mode with target->estimated name matching
    tdir, edir = tmp_path / "targets", tmp_path / "estimates"
    tdir.mkdir(), edir.mkdir()
    write_wav(str(tdir / "target_a.wav"), clean, 16000)
    write_wav(str(edir / "estimated_a.wav"), enhanced, 16000)
    results = check_dirs(str(tdir), str(edir))
    assert len(results) == 1


def test_pesq_fallback_when_native_unavailable(rng, monkeypatch):
    """Without the native library, cal_pesq must return numpy-spec scores,
    never silent zeros (round-1 regression: train/loop.py wrote 0.0)."""
    from se_tpu.eval import metrics, pesq_native
    from se_tpu.eval.pesq_np import pesq_np

    x = _speechlike(rng, n=16000)
    noisy = x + 0.05 * rng.standard_normal(len(x))

    monkeypatch.setattr(pesq_native, "available", lambda: False)
    scores = metrics.cal_pesq([noisy], [x], 16000, workers=1)
    assert scores[0] != 0.0
    assert scores[0] == pytest.approx(pesq_np(x, noisy, 16000), abs=1e-9)


def test_scoring_pool_restores_parent_env(monkeypatch):
    """The reused spawn pool scrubs PALLAS_AXON_POOL_IPS / forces
    JAX_PLATFORMS=cpu only while its workers start; both must be back to
    their prior values afterwards (a leaked JAX_PLATFORMS=cpu would make
    every LATER subprocess of the training process silently run CPU JAX)."""
    import os

    from se_tpu.eval import metrics

    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "203.0.113.7")
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    # a fresh pool for a worker count nothing else uses, so _pool takes
    # the creation path even when other tests already scored with 2
    workers = 3
    metrics._POOLS.pop(workers, None)
    try:
        pids = metrics._pool(workers).map(metrics._sleep_marker, [0.0] * workers)
        assert len(set(pids)) >= 1  # workers actually ran
        assert os.environ["PALLAS_AXON_POOL_IPS"] == "203.0.113.7"
        assert "JAX_PLATFORMS" not in os.environ
        assert metrics._pool(workers) is metrics._POOLS[workers]  # reused
    finally:
        ex = metrics._POOLS.pop(workers, None)
        if ex is not None:
            ex.shutdown(wait=False, cancel_futures=True)
