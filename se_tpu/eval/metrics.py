"""Metric front-end: PESQ / STOI / SNR / composite scoring.

reference: tools_for_estimate.py.  The reference scores every validation
batch in a serial per-utterance python loop (:79-95); here the per-utterance
scorers fan out over host CPUs (multiprocessing) since they cannot run on
TPU.  PESQ is the framework's own native ITU-T P.862 implementation
(native/pesq, loaded via ctypes) — the reference ships a prebuilt binary
only.
"""

from __future__ import annotations

import os
from concurrent.futures import ProcessPoolExecutor
from typing import List, Sequence

import numpy as np

from .stoi import stoi as _stoi
from . import pesq_native


def run_pesq_waveforms(dirty_wav: np.ndarray, clean_wav: np.ndarray,
                       fs: int = 16000) -> float:
    """PESQ MOS-LQO of a degraded waveform vs its clean reference
    (reference: tools_for_estimate.py:68-75).

    Dispatches to the native C++ library when available, else to the
    numpy P.862 spec (identical scores, ~60x slower) — never zeros.
    """
    clean = np.asarray(clean_wav, np.float64)
    dirty = np.asarray(dirty_wav, np.float64)
    if pesq_native.available():
        return pesq_native.pesq(clean, dirty, fs)
    from .pesq_np import pesq_np

    return pesq_np(clean, dirty, fs)


def _pesq_one(args):
    dirty, clean, fs = args
    return run_pesq_waveforms(dirty, clean, fs)


def _stoi_one(args):
    est, clean, fs = args
    return _stoi(clean, est, fs, extended=False)


_POOLS: dict = {}


def _sleep_marker(seconds: float) -> int:
    """Warm-up task: forces the executor to actually start its workers
    (they spawn lazily) while the parent's environment is scrubbed."""
    import time

    time.sleep(seconds)
    return os.getpid()


def _pool(workers: int) -> ProcessPoolExecutor:
    """Lazily-created, REUSED scoring pool per worker count.  Validation
    calls _map twice per batch (PESQ + STOI); creating a fresh spawn pool
    each call would pay worker startup + numpy/scipy import on the
    scoring pipeline's critical path every batch.  concurrent.futures
    registers an atexit shutdown for the kept executors.

    Worker environment: this container's sitecustomize imports JAX and
    registers the tunnelled axon TPU in EVERY interpreter that sees
    ``PALLAS_AXON_POOL_IPS`` — a scoring worker must not open its own
    TPU client (slow startup; fails outright during tunnel flaps).  The
    variable is scrubbed from the parent env while the pool's workers
    start (spawned children inherit the env at their creation), then
    restored."""
    ex = _POOLS.get(workers)
    if ex is None:
        # spawn context: never fork a process holding a live TPU client;
        # the scorers only import numpy/scipy/ctypes
        import multiprocessing

        saved = os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        saved_platforms = os.environ.get("JAX_PLATFORMS")
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        try:
            ctx = multiprocessing.get_context("spawn")
            ex = ProcessPoolExecutor(max_workers=workers, mp_context=ctx)
            # force every worker to spawn NOW, under the scrubbed env:
            # concurrent sleep tasks cannot be served by fewer workers
            list(ex.map(_sleep_marker, [0.05] * workers))
        finally:
            if saved is not None:
                os.environ["PALLAS_AXON_POOL_IPS"] = saved
            if saved_platforms is None:
                # restore: a later subprocess of THIS process must not
                # inherit a forced-CPU JAX just because scoring ran once
                os.environ.pop("JAX_PLATFORMS", None)
        _POOLS[workers] = ex
    return ex


def _map(fn, jobs, workers: int | None):
    if workers is None:
        workers = 0
    if workers <= 1 or len(jobs) <= 1:
        return [fn(j) for j in jobs]
    from concurrent.futures.process import BrokenProcessPool

    try:
        return list(_pool(workers).map(fn, jobs))
    except BrokenProcessPool:
        # one dead worker (native-scorer segfault, OOM kill) must not
        # disable scoring for the rest of a run: rebuild the pool once,
        # then fall back to serial scoring for these jobs
        _POOLS.pop(workers, None)
        try:
            return list(_pool(workers).map(fn, jobs))
        except BrokenProcessPool:
            _POOLS.pop(workers, None)
            return [fn(j) for j in jobs]


def cal_pesq(dirty_wavs: Sequence[np.ndarray], clean_wavs: Sequence[np.ndarray],
             fs: int = 16000, workers: int | None = None) -> List[float]:
    """Batch PESQ (reference: tools_for_estimate.py:79-84), parallel."""
    jobs = [(d, c, fs) for d, c in zip(dirty_wavs, clean_wavs)]
    return _map(_pesq_one, jobs, workers)


def cal_stoi(estimated_speechs: Sequence[np.ndarray],
             clean_speechs: Sequence[np.ndarray], fs: int = 16000,
             workers: int | None = None) -> List[float]:
    """Batch STOI (reference: tools_for_estimate.py:90-95), parallel."""
    jobs = [(e, c, fs) for e, c in zip(estimated_speechs, clean_speechs)]
    return _map(_stoi_one, jobs, workers)


def cal_snr(s1: np.ndarray, s2: np.ndarray, eps: float = 1e-8) -> float:
    """SNR of noisy s1 given signal s2 (reference: tools_for_estimate.py:101-117)."""
    signal = s2
    signal_diff = signal - np.mean(signal)
    var_signal = np.sum(np.mean(signal_diff**2))
    noise = s1 - signal
    noise_diff = noise - np.mean(noise)
    var_noise = np.sum(np.mean(noise_diff**2))
    if var_noise == 0:
        return 100.0  # clean
    return float(10 * np.log10(var_signal / var_noise + eps))


def cal_snr_array(estimated_speechs, clean_speechs) -> List[float]:
    return [cal_snr(e, c) for e, c in zip(estimated_speechs, clean_speechs)]


def composite(clean_path: str, enhanced_path: str):
    """CSIG/CBAK/COVL/segSNR with PESQ re-weighting
    (reference: tools_for_estimate.py:24-30).  Native WSS/LLR/segSNR replace
    the reference's Octave round-trip (composite.m via oct2py)."""
    from .composite import composite_measures
    from ..data.synth import read_wav

    clean, fs1 = read_wav(clean_path)
    enhanced, fs2 = read_wav(enhanced_path)
    assert fs1 == fs2
    pesq_score = run_pesq_waveforms(enhanced, clean, fs1)
    csig, cbak, covl, ssnr = composite_measures(clean, enhanced, fs1)
    csig += 0.603 * pesq_score
    cbak += 0.478 * pesq_score
    covl += 0.805 * pesq_score
    return csig, cbak, covl, ssnr
