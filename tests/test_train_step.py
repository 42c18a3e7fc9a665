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


def test_grad_accum_matches_sequential_microbatches():
    """grad_accum=A must equal the hand-rolled loop: per-micro-batch
    grads averaged, batch stats threaded through the chunks, one Adam
    update."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from se_tpu.train import create_train_state, make_train_step
    from se_tpu.train.steps import _loss_and_outputs
    from tests.test_models import small_cfg

    import dataclasses
    import optax

    cfg = small_cfg(model="DCCRN", loss="SDR")
    cfg2 = cfg.replace(train=dataclasses.replace(cfg.train, grad_accum=2))
    model, state = create_train_state(cfg)
    _, state2 = create_train_state(cfg2)
    # SGD makes the update linear in the gradient, so the comparison is
    # not hostage to Adam's sign-sensitivity on near-zero gradients
    tx = optax.sgd(1e-2)
    state = state.replace(tx=tx, opt_state=tx.init(state.params))
    state2 = state2.replace(tx=tx, opt_state=tx.init(state2.params))
    noisy, clean = _batch(cfg, batch=4)
    key = jax.random.PRNGKey(7)

    # hand-rolled: two micro-batches of 2, stats threaded, grads averaged
    keys = jax.random.split(key, 2)
    bs = state.batch_stats
    grads_sum = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    loss_sum = 0.0
    for i in range(2):
        def loss_fn(params, bs=bs, i=i):
            return _loss_and_outputs(
                cfg, model, params, bs, noisy[2 * i : 2 * i + 2],
                clean[2 * i : 2 * i + 2], train=True, dropout_rng=keys[i],
            )
        (loss, (_, _, bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grads_sum = jax.tree_util.tree_map(
            lambda a, g: a + g, grads_sum, grads
        )
        loss_sum += float(loss)
    grads_avg = jax.tree_util.tree_map(lambda g: g / 2, grads_sum)
    manual = state.apply_gradients(grads_avg, new_batch_stats=bs)

    step2 = make_train_step(cfg2, model)
    accum_state, metrics = step2(state2, noisy, clean, key)

    np.testing.assert_allclose(
        float(metrics["loss"]), loss_sum / 2, rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(manual.params),
        jax.tree_util.tree_leaves(accum_state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(manual.batch_stats),
        jax.tree_util.tree_leaves(accum_state.batch_stats),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        )


def test_adam_mu_dtype_bfloat16():
    """adam_mu_dtype stores the first moment in bf16 and still trains."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from se_tpu.train import create_train_state, make_train_step
    from tests.test_models import small_cfg

    import dataclasses
    cfg = small_cfg(model="DCCRN", loss="SDR")
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, adam_mu_dtype="bfloat16"))
    model, state = create_train_state(cfg)
    mu_leaves = jax.tree_util.tree_leaves(state.opt_state[0].mu)
    assert all(l.dtype == jnp.bfloat16 for l in mu_leaves)
    nu_leaves = jax.tree_util.tree_leaves(state.opt_state[0].nu)
    assert all(l.dtype == jnp.float32 for l in nu_leaves)
    step = make_train_step(cfg, model)
    noisy, clean = _batch(cfg)
    losses = []
    for i in range(6):
        state, m = step(state, noisy, clean, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
