"""Utility-module coverage: data statistics and profiling hooks."""

import os
import time

import numpy as np

from se_tpu.utils.stats import get_mu_sig, get_statistics_inp
from se_tpu.obs.profiling import StepTimer, device_trace


def test_get_mu_sig_matches_loop_reference():
    """Per-utterance mean/std in float16 with the sigma<1e-5 -> 1.0 guard
    (reference: tools_for_model.py:1192-1225)."""
    rng = np.random.default_rng(0)
    data = [rng.standard_normal((50, 8)).astype(np.float32) for _ in range(3)]
    # make one feature column constant to exercise the unit-variance guard
    data[1][:, 2] = 0.25

    mu, sig = get_mu_sig(data)
    assert len(mu) == len(sig) == 3
    for m, s, d in zip(mu, sig, data):
        assert m.dtype == np.float16 and s.dtype == np.float16
        np.testing.assert_allclose(
            np.asarray(m, np.float32), d.mean(0), atol=2e-3
        )
    # constant column -> sigma forced to exactly 1.0
    assert sig[1][2] == np.float16(1.0)
    # alias used by the reference
    mu2, sig2 = get_statistics_inp(data)
    for a, b in zip(mu, mu2):
        np.testing.assert_array_equal(a, b)


def test_step_timer_accumulates():
    t = StepTimer()
    for _ in range(3):
        with t:
            time.sleep(0.01)
    assert t.n == 3
    assert t.last >= 0.009
    assert 0.009 <= t.mean <= 1.0


def test_device_trace_writes_profile(tmp_path):
    import jax.numpy as jnp

    logdir = str(tmp_path / "trace")
    with device_trace(logdir):
        jnp.ones((8, 8)).sum().block_until_ready()
    # a plugins/profile/<run> directory with at least one artifact
    found = []
    for root, _, files in os.walk(logdir):
        found.extend(files)
    assert found, "no trace artifacts written"
