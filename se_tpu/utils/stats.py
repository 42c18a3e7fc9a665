"""Per-utterance data statistics (reference: tools_for_model.py:1192-1241).

Utility only — not on the main training path in the reference either.
"""

from __future__ import annotations

import numpy as np


def get_mu_sig(data):
    """Mean and standard deviation vectors per utterance (float16).

    Unit variance is assigned where sigma < 1e-5, as in the reference.
    """
    mu = [np.mean(d, 0) for d in data]
    sig = [np.sqrt(np.mean(np.square(d - m), 0)) for d, m in zip(data, mu)]
    sig = [np.where(s < 1e-5, 1.0, s) for s in sig]
    return (
        [np.float16(m) for m in mu],
        [np.float16(s) for s in sig],
    )


def get_statistics_inp(inp):
    return get_mu_sig(inp)
