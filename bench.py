"""Benchmark: DCCRN train-step throughput (3-s utterances / sec / chip).

Runs the flagship configuration (DCCRN, complex LSTM, E-mask, SDR loss,
3-second 16 kHz utterances — reference defaults config.py:35-58) as a
jitted train step on the available accelerator and prints ONE JSON line.
Batch 40 is the measured single-chip throughput sweet spot on v5e (the
reference default of 10 underutilises the chip; 64+ exceeds HBM without
rematerialisation); the metric is utterances/sec/chip either way.

``vs_baseline`` compares against the PyTorch reference architecture
executed on this host's CPU (tools/measure_torch_baseline.py; recorded in
BASELINE.md) — the only measurable reference since the upstream repo
publishes no numbers (SURVEY.md section 6).
"""

from __future__ import annotations

import json
import time

import numpy as np

# torch-CPU reference DCCRN train-step throughput on this host
# (tools/measure_torch_baseline.py; 1-core CPU), utterances/sec.
BASELINE_UTT_PER_SEC = 0.100


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from se_tpu.config import Config
    from se_tpu.train import create_train_state, make_train_step

    cfg = Config()  # DCCRN / SDR / complex / E
    model, state = create_train_state(cfg)
    step = make_train_step(cfg, model)

    B, L = 40, cfg.stft.fs * 3
    rng = np.random.default_rng(0)
    noisy = jnp.asarray((rng.standard_normal((B, L)) * 0.1).astype(np.float32))
    clean = jnp.asarray((rng.standard_normal((B, L)) * 0.1).astype(np.float32))
    key = jax.random.PRNGKey(0)

    # warmup + compile (float() forces a device sync; block_until_ready is
    # not reliable on the tunnelled axon platform)
    state, m = step(state, noisy, clean, key)
    float(m["loss"])

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, m = step(state, noisy, clean, key)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / n_iters

    utt_per_sec = B / dt
    print(
        json.dumps(
            {
                "metric": "dccrn_train_utterances_per_sec_per_chip",
                "value": round(utt_per_sec, 3),
                "unit": "3s-utterances/sec/chip",
                "vs_baseline": round(utt_per_sec / BASELINE_UTT_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
