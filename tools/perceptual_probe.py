"""Measure DCCRN perceptual-mode (LMS / PMSQE) train throughput on TPU.

Finds the working batch + throughput for the bench.py perceptual series
(reference perceptual trainers: trainer.py:45-82).

Run ON TPU: PYTHONPATH=". ..." python tools/perceptual_probe.py [LMS|PMSQE] [B ...]
"""

import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402


def main():
    from se_tpu.config import Config
    from se_tpu.train import create_train_state, make_train_step

    perceptual = sys.argv[1] if len(sys.argv) > 1 else "LMS"
    batches = [int(b) for b in sys.argv[2:]] or [64, 96, 128]
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    for B in batches:
        cfg = Config(perceptual=perceptual, compute_dtype="bfloat16")
        try:
            model, state = create_train_state(cfg)
            L = cfg.stft.fs * 3
            noisy = jnp.asarray(
                (rng.standard_normal((B, L)) * 0.1).astype(np.float32))
            clean = jnp.asarray(
                (rng.standard_normal((B, L)) * 0.1).astype(np.float32))
            step = make_train_step(cfg, model)
            state, m = step(state, noisy, clean, key)
            loss = float(m["loss"])
            t0 = time.perf_counter()
            for _ in range(10):
                state, m = step(state, noisy, clean, key)
            loss = float(m["loss"])
            dt = (time.perf_counter() - t0) / 10
            print(f"{perceptual} B={B}: {B / dt:.1f} utt/s  "
                  f"({dt * 1e3:.1f} ms/step, loss {loss:.4f})", flush=True)
        except Exception as e:
            print(f"{perceptual} B={B}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
