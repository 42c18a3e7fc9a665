"""Benchmark: DCCRN train & enhance throughput (3-s utterances / sec / chip).

Runs the flagship configuration (DCCRN, complex LSTM, E-mask, SDR loss,
3-second 16 kHz utterances — reference defaults config.py:35-58) as jitted
steps on the available accelerator and prints one JSON line per metric
(train last — it is the headline number).  The headline train metric uses
bf16 activations with f32 params/optimizer/BN statistics — the TPU-native
mixed-precision production path (convergence covered by
tests/test_train_step.py::test_dccrn_bf16_compute_trains); the f32 step
is also reported.

Batch sizes are the measured single-chip sweet spots on v5e (round 2:
B=112 train / B=96 enhance with the block-kernel complex convs; the
reference default of 10 underutilises the chip).

``vs_baseline`` compares against the strongest measurable PyTorch
reference-architecture run on this host (tools/measure_torch_baseline.py,
recorded in BASELINE.md) — the upstream repo publishes no numbers
(SURVEY.md section 6).
"""

from __future__ import annotations

import json
import time

import numpy as np

# torch-CPU reference DCCRN throughput on this host (1-core; eager beats
# torch.compile here — tools/measure_torch_baseline.py), utterances/sec.
BASELINE_TRAIN_UTT_PER_SEC = 0.155
BASELINE_ENHANCE_UTT_PER_SEC = 0.737

TRAIN_BATCH = 112
ENHANCE_BATCH = 96


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from se_tpu.config import Config
    from se_tpu.train import create_train_state, make_train_step
    from se_tpu.train.steps import make_eval_step

    cfg = Config()  # DCCRN / SDR / complex / E
    model, state = create_train_state(cfg)
    L = cfg.stft.fs * 3
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def batch(B):
        return (
            jnp.asarray((rng.standard_normal((B, L)) * 0.1).astype(np.float32)),
            jnp.asarray((rng.standard_normal((B, L)) * 0.1).astype(np.float32)),
        )

    # -- enhance (inference) ------------------------------------------------
    noisy, clean = batch(ENHANCE_BATCH)
    eval_step = make_eval_step(cfg, model)
    m, out = eval_step(state, noisy, clean)
    float(m["loss"])  # sync (block_until_ready unreliable on axon)
    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        m, out = eval_step(state, noisy, clean)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / n_iters
    enh = ENHANCE_BATCH / dt
    print(
        json.dumps(
            {
                "metric": "dccrn_enhance_utterances_per_sec_per_chip",
                "value": round(enh, 3),
                "unit": "3s-utterances/sec/chip",
                "vs_baseline": round(enh / BASELINE_ENHANCE_UTT_PER_SEC, 3),
            }
        )
    )

    # -- train (f32) ----------------------------------------------------------
    noisy, clean = batch(TRAIN_BATCH)
    step = make_train_step(cfg, model)
    state, m = step(state, noisy, clean, key)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, m = step(state, noisy, clean, key)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / n_iters
    tr = TRAIN_BATCH / dt
    print(
        json.dumps(
            {
                # historical series name: f32 since round 1 (the bf16
                # production path reports under its own *_bf16_* name so
                # the precision of this series never silently changes)
                "metric": "dccrn_train_utterances_per_sec_per_chip",
                "value": round(tr, 3),
                "unit": "3s-utterances/sec/chip",
                "vs_baseline": round(tr / BASELINE_TRAIN_UTT_PER_SEC, 3),
            }
        )
    )

    # -- train (bf16 activations, f32 params/optimizer/BN — the TPU-native
    # mixed-precision path; convergence covered by
    # tests/test_train_step.py::test_dccrn_bf16_compute_trains) -- headline
    cfg16 = cfg.replace(compute_dtype="bfloat16")
    model16, state16 = create_train_state(cfg16)
    step16 = make_train_step(cfg16, model16)
    state16, m = step16(state16, noisy, clean, key)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state16, m = step16(state16, noisy, clean, key)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / n_iters
    tr16 = TRAIN_BATCH / dt
    print(
        json.dumps(
            {
                "metric": "dccrn_train_bf16_utterances_per_sec_per_chip",
                "value": round(tr16, 3),
                "unit": "3s-utterances/sec/chip",
                "vs_baseline": round(tr16 / BASELINE_TRAIN_UTT_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
