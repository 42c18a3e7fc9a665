"""End-to-end train-step smoke tests: the tutorial CRN config
(SE_tutorials.ipynb: CRN + E mask + MSE + synthetic data) must train and the
loss must decrease.  This is the reference's only integration path
(SURVEY.md section 4), reproduced for every trainer variant."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from se_tpu.train import create_train_state, make_train_step, make_eval_step
from tests.test_models import small_cfg


def _batch(cfg, batch=2, seconds=1, seed=0):
    rng = np.random.default_rng(seed)
    L = cfg.stft.fs * seconds
    clean = rng.standard_normal((batch, L)).astype(np.float32) * 0.05
    noise = rng.standard_normal((batch, L)).astype(np.float32) * 0.05
    return jnp.asarray(clean + noise), jnp.asarray(clean)


def _train_n(cfg, n=4):
    model, state = create_train_state(cfg)
    step = make_train_step(cfg, model)
    noisy, clean = _batch(cfg)
    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(n):
        key, sub = jax.random.split(key)
        state, metrics = step(state, noisy, clean, sub)
        losses.append(float(metrics["loss"]))
    return losses, (model, state)


def test_crn_tutorial_loss_decreases():
    cfg = small_cfg(model="CRN", lstm="real", loss="MSE")
    losses, _ = _train_n(cfg, n=5)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_dccrn_sdr_trains():
    cfg = small_cfg(model="DCCRN", loss="SDR")
    losses, _ = _train_n(cfg, n=3)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_fullsubnet_mse_trains():
    cfg = small_cfg(model="FullSubNet", loss="MSE")
    losses, _ = _train_n(cfg, n=3)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_dccrn_direct_trains():
    cfg = small_cfg(
        model="DCCRN", masking_mode="Direct(None make)", loss="MSE"
    )
    losses, _ = _train_n(cfg, n=3)
    assert np.isfinite(losses).all()


def test_crn_direct_trains():
    cfg = small_cfg(
        model="CRN", lstm="real", masking_mode="Direct(None make)", loss="MSE"
    )
    losses, _ = _train_n(cfg, n=3)
    assert np.isfinite(losses).all()


def test_eval_step_returns_wavs():
    cfg = small_cfg(model="CRN", lstm="real", loss="MSE")
    model, state = create_train_state(cfg)
    eval_step = make_eval_step(cfg, model)
    noisy, clean = _batch(cfg)
    metrics, outputs = eval_step(state, noisy, clean)
    assert np.isfinite(float(metrics["loss"]))
    assert outputs.shape == noisy.shape


def test_fullsubnet_eval_enhances_waveform():
    cfg = small_cfg(model="FullSubNet", loss="MSE")
    model, state = create_train_state(cfg)
    eval_step = make_eval_step(cfg, model)
    noisy, clean = _batch(cfg)
    metrics, outputs = eval_step(state, noisy, clean)
    assert outputs.shape == noisy.shape
    assert np.isfinite(np.asarray(outputs)).all()


def test_dccrn_bf16_compute_trains():
    """bf16 activations (f32 params/optimizer/BN stats) must also train —
    the TPU-native mixed-precision path bench.py reports."""
    cfg = small_cfg(model="DCCRN", loss="SDR").replace(
        compute_dtype="bfloat16"
    )
    losses, _ = _train_n(cfg, n=4)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
