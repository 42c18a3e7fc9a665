"""ctypes binding to the framework's native ITU-T P.862 (PESQ) library.

The reference ships only a prebuilt binary (PESQ.so, reference:
tools_for_estimate.py:51-75); this framework builds its own implementation
from source (native/pesq/*.cc, ``make -C native``) into
``native/libse_metrics.so``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "libse_metrics.so"),
    os.path.join(os.path.dirname(__file__), "libse_metrics.so"),
]


def _build():
    root = os.path.join(os.path.dirname(__file__), "..", "..", "native")
    if os.path.exists(os.path.join(root, "Makefile")):
        subprocess.run(["make", "-C", root, "-s"], check=True)


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    for p in _LIB_PATHS:
        if os.path.exists(p):
            _LIB = ctypes.CDLL(os.path.abspath(p))
            break
    else:
        try:
            _build()
        except Exception as e:  # pragma: no cover
            raise RuntimeError(
                "native metrics library not found and build failed; run "
                "`make -C native`"
            ) from e
        _LIB = ctypes.CDLL(os.path.abspath(_LIB_PATHS[0]))
    _LIB.pesq_measure_wb.restype = ctypes.c_double
    _LIB.pesq_measure_wb.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_long,
        ctypes.c_long,
        ctypes.c_long,
    ]
    return _LIB


def pesq(clean: np.ndarray, degraded: np.ndarray, fs: int = 16000) -> float:
    """PESQ MOS of ``degraded`` against ``clean`` (16 kHz model)."""
    lib = _load()
    c = np.ascontiguousarray(clean, np.float64)
    d = np.ascontiguousarray(degraded, np.float64)
    return float(
        lib.pesq_measure_wb(
            c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            d.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            len(c),
            len(d),
            fs,
        )
    )


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False
