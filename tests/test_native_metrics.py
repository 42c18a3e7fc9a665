"""Native (C++) metrics must agree with the validated numpy specs."""

import ctypes
import os
import subprocess

import numpy as np
import pytest

from se_tpu.eval import pesq_native
from se_tpu.eval.pesq_np import pesq_wb_np
from se_tpu.eval.composite import composite_measures
from tools.pesq_oracle_battery import speechlike

ROOT = os.path.join(os.path.dirname(__file__), "..")


@pytest.fixture(scope="module", autouse=True)
def build_native():
    subprocess.run(["make", "-C", os.path.join(ROOT, "native"), "-s"], check=True)


def test_pesq_native_matches_numpy():
    rng = np.random.default_rng(11)
    x = speechlike(rng)
    noise = rng.standard_normal(len(x))
    for snr in (30, 10):
        n = noise * np.sqrt(
            np.mean(x**2) / np.mean(noise**2) * 10 ** (-snr / 10)
        )
        want = pesq_wb_np(x, x + n)
        got = pesq_native.pesq(x, x + n, 16000)
        np.testing.assert_allclose(got, want, atol=2e-3)


def test_pesq_native_identical():
    x = speechlike(np.random.default_rng(5))
    assert abs(pesq_native.pesq(x, x, 16000) - 4.6439) < 1e-3


def test_composite_native_matches_numpy():
    lib = ctypes.CDLL(os.path.join(ROOT, "native", "libse_metrics.so"))
    lib.composite_measures_c.restype = None
    lib.composite_measures_c.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_long,
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_double),
    ]
    rng = np.random.default_rng(13)
    x = speechlike(rng)
    y = x + 0.02 * rng.standard_normal(len(x))
    out = (ctypes.c_double * 4)()
    xc = np.ascontiguousarray(x)
    yc = np.ascontiguousarray(y)
    lib.composite_measures_c(
        xc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        yc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(x),
        16000,
        out,
    )
    want = composite_measures(x, y, 16000)
    np.testing.assert_allclose(list(out), list(want), atol=1e-4)
