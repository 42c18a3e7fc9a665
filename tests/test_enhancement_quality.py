"""End-to-end efficacy: a briefly-trained DCCRN must IMPROVE PESQ and
STOI of noisy speech — the framework's whole purpose, verified with its
own metric stack."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from se_tpu.train import create_train_state, make_train_step, make_eval_step
from se_tpu.eval.pesq_native import pesq, available
from se_tpu.eval.stoi import stoi
from tests.test_models import small_cfg
from tools.pesq_oracle_battery import speechlike


@pytest.mark.skipif(not available(), reason="native PESQ not built")
def test_training_improves_pesq_and_stoi():
    rng = np.random.default_rng(0)
    B, L = 4, 16000

    def make_batch(seed):
        r = np.random.default_rng(seed)
        clean = np.stack(
            [0.5 * speechlike(r, n=L, f0=100 + 30 * i) for i in range(B)]
        )
        noise = 0.08 * r.standard_normal((B, L))
        return (clean + noise).astype(np.float32), clean.astype(np.float32)

    cfg = small_cfg(model="DCCRN", loss="SI-SNR")
    model, state = create_train_state(cfg)
    step = make_train_step(cfg, model)
    key = jax.random.PRNGKey(0)
    for i in range(60):
        noisy, clean = make_batch(i % 8)
        key, sub = jax.random.split(key)
        state, metrics = step(state, jnp.asarray(noisy), jnp.asarray(clean), sub)
    final_loss = float(metrics["loss"])

    # held-out batch
    noisy, clean = make_batch(99)
    eval_step = make_eval_step(cfg, model)
    _, enhanced = eval_step(state, jnp.asarray(noisy), jnp.asarray(clean))
    enhanced = np.asarray(enhanced)

    pesq_noisy = np.mean([pesq(clean[i], noisy[i]) for i in range(B)])
    pesq_enh = np.mean([pesq(clean[i], enhanced[i]) for i in range(B)])
    stoi_noisy = np.mean([stoi(clean[i], noisy[i], 16000) for i in range(B)])
    stoi_enh = np.mean([stoi(clean[i], enhanced[i], 16000) for i in range(B)])

    assert np.isfinite(final_loss)
    assert pesq_enh > pesq_noisy + 0.05, (pesq_noisy, pesq_enh)
    assert stoi_enh > stoi_noisy - 0.02, (stoi_noisy, stoi_enh)
