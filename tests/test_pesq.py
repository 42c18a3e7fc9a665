"""PESQ (P.862.2 wideband) tests.

When the reference oracle binary is present (/root/reference/PESQ.so) the
implementation is compared against it directly; pinned golden values keep
the regression meaningful without it.
"""

import ctypes
import os

import numpy as np
import pytest

from se_tpu.eval.pesq_np import pesq_wb_np, compute_delay
from tools.pesq_oracle_battery import speechlike

ORACLE = "/root/reference/PESQ.so"


def _oracle():
    lib = ctypes.CDLL(ORACLE)
    lib.pesq.restype = ctypes.c_double

    def fn(clean, deg):
        c = np.ascontiguousarray(clean, np.float64)
        d = np.ascontiguousarray(deg, np.float64)
        return lib.pesq(
            ctypes.c_void_p(c.ctypes.data),
            ctypes.c_void_p(d.ctypes.data),
            ctypes.c_long(len(c)),
            ctypes.c_long(len(d)),
        )

    return fn


def test_identical_is_max():
    x = speechlike(np.random.default_rng(1))
    assert abs(pesq_wb_np(x, x) - 4.6439) < 1e-3


def test_gain_invariance():
    x = speechlike(np.random.default_rng(2))
    np.testing.assert_allclose(pesq_wb_np(x, 2 * x), pesq_wb_np(x, x), atol=1e-3)


def test_monotonic_with_noise():
    rng = np.random.default_rng(3)
    x = speechlike(rng)
    scores = []
    for snr in (30, 15, 5):
        n = rng.standard_normal(len(x))
        n *= np.sqrt(np.mean(x**2) / np.mean(n**2) * 10 ** (-snr / 10))
        scores.append(pesq_wb_np(x, x + n))
    assert scores[0] > scores[1] > scores[2], scores


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="oracle not present")
def test_oracle_parity_aligned_cases():
    """Aligned degradations must match the ITU oracle closely."""
    oracle = _oracle()
    rng = np.random.default_rng(7)
    x = speechlike(rng)
    cases = [("identical", x.copy())]
    for snr in (30, 20, 10, 0):
        n = rng.standard_normal(len(x))
        n *= np.sqrt(np.mean(x**2) / np.mean(n**2) * 10 ** (-snr / 10))
        cases.append((f"awgn_{snr}", x + n))
    for name, deg in cases:
        o = oracle(x, deg)
        m = pesq_wb_np(x, deg)
        assert abs(m - o) < 0.01, (name, o, m)


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="oracle not present")
def test_compute_delay_exact_vs_oracle():
    lib = ctypes.CDLL(ORACLE)
    F = ctypes.POINTER(ctypes.c_float)
    lib.compute_delay.restype = ctypes.c_long
    lib.compute_delay.argtypes = [ctypes.c_long] * 3 + [F, F, F]
    rng = np.random.default_rng(0)
    t1 = rng.standard_normal(20000).astype(np.float32)
    t2 = np.zeros_like(t1)
    t2[137:] = t1[:-137]
    bc = (ctypes.c_float * 1)()
    d = lib.compute_delay(
        2000, 12000, 800, t1.ctypes.data_as(F), t2.ctypes.data_as(F), bc
    )
    md, mc = compute_delay(t1, t2, 2000, 12000, 800)
    assert md == np.int32(d)
    np.testing.assert_allclose(mc, bc[0], atol=1e-4)


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="oracle not present")
def test_oracle_parity_full_battery_native():
    """The COMPLETE parity battery (aligned, bulk shifts, multi-utterance,
    piecewise/decreasing delays, unrelated signals) vs the ITU oracle at
    +-0.001 MOS, via the native implementation (the numpy spec agrees
    with it; see tools/pesq_oracle_battery.py for both)."""
    from se_tpu.eval import pesq_native
    from tools.pesq_oracle_battery import battery

    if not pesq_native.available():
        pytest.skip("native metrics library unavailable")
    oracle = _oracle()
    rng = np.random.default_rng(7)
    for name, c, d in battery(rng):
        o = oracle(c, d)
        m = pesq_native.pesq(c, d, 16000)
        assert abs(m - o) < 0.001, (name, o, m)
