"""Batch/dtype throughput sweep for one model family on the current device.

Usage:
    python tools/model_sweep.py MODEL DTYPE MODE BATCH [BATCH ...]

MODEL in {DCCRN, CRN, FullSubNet}; DTYPE in {f32, bf16};
MODE in {train, enhance}.  Prints one line per batch:
``batch=N  utt/s=X``.  Reuses bench.py's timing harness (scalar fetch
sync; the tunnelled axon platform makes block_until_ready unreliable).
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> None:
    model, dtype, mode = sys.argv[1], sys.argv[2], sys.argv[3]
    batches = [int(b) for b in sys.argv[4:]]

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    from se_tpu.config import Config

    kw = {}
    if model == "CRN":
        kw = dict(model="CRN", lstm="real", loss="MSE")
    elif model == "FullSubNet":
        kw = dict(model="FullSubNet", loss="MSE")
    if dtype == "bf16":
        kw["compute_dtype"] = "bfloat16"
    cfg = Config(**kw)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    for b in batches:
        try:
            if mode == "train":
                v = bench._bench_train(cfg, b, key, rng)
            else:
                v = bench._bench_enhance(cfg, b, rng)
            print(f"{model} {dtype} {mode} batch={b}  utt/s={v:.1f}", flush=True)
        except Exception as e:  # noqa: BLE001 - report OOM per batch, keep sweeping
            print(f"{model} {dtype} {mode} batch={b}  FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
