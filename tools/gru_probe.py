"""FullSubNet sequence_model="GRU" throughput: fused Pallas GRU cell vs
the lax.scan cell, on the current device.

Usage: PYTHONPATH=. python tools/gru_probe.py [MODE] [BATCH] [DTYPE]
  MODE  train | enhance   (default enhance)
  BATCH default 32
  DTYPE f32 | bf16        (default bf16)
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "enhance"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    dtype = sys.argv[3] if len(sys.argv) > 3 else "bf16"

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    from se_tpu.config import Config

    kw = dict(model="FullSubNet", loss="MSE", sequence_model="GRU")
    if dtype == "bf16":
        kw["compute_dtype"] = "bfloat16"
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    for pallas in ("off", "on"):
        cfg = Config(**kw, use_pallas_lstm=pallas)
        try:
            if mode == "train":
                v = bench._bench_train(cfg, batch, key, rng)
            else:
                v = bench._bench_enhance(cfg, batch, rng)
            print(f"FSN-GRU {dtype} {mode} B={batch} pallas={pallas}  "
                  f"utt/s={v:.1f}", flush=True)
        except Exception as e:  # OOM at real batches is a result, not a crash
            print(f"FSN-GRU {dtype} {mode} B={batch} pallas={pallas}  "
                  f"FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
