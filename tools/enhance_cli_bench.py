"""End-to-end serving receipt for ``enhance.py --batch``.

Measures WALL-CLOCK time of the whole CLI (checkpoint restore, wav IO,
compile, device dispatches, int16 writes) enhancing a synthetic corpus of
mixed-length files, --batch 1 vs --batch N, on whatever backend the
container gives (the tunnelled TPU v5e under axon).  This is the
user-facing number the per-model utt/s table in docs/PERF.md feeds:
the batch path issues ~N-fold fewer dispatches, which matters doubly on
the tunnelled chip (3-4 ms per-dispatch floor, docs/PERF.md).

Usage:  PYTHONPATH=. python tools/enhance_cli_bench.py [n_files] [batch] [model]
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..")


def main():
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    model = sys.argv[3] if len(sys.argv) > 3 else "DCCRN"

    sys.path.insert(0, ROOT)
    from se_tpu.config import Config
    from se_tpu.data.synth import write_wav
    from se_tpu.train.checkpoint import save_checkpoint
    from se_tpu.train.state import create_train_state

    cfg = Config(model=model, loss="MSE" if model != "DCCRN" else "SDR")
    _, state = create_train_state(cfg)

    with tempfile.TemporaryDirectory() as tmp:
        ckpt_dir = os.path.join(tmp, "ck")
        os.makedirs(ckpt_dir)
        save_checkpoint(ckpt_dir, state, epoch=1)

        rng = np.random.default_rng(0)
        # mixed real-world-ish lengths: 2-4 s, several 1-s buckets
        files = []
        for i in range(n_files):
            L = int(rng.integers(32000, 64001))
            path = os.path.join(tmp, f"f{i:03d}.wav")
            write_wav(path, rng.standard_normal(L) * 0.05, 16000)
            files.append(path)

        env = dict(os.environ)
        # persistent compile cache (same one bench.py uses) so tunnel
        # retries and the second leg skip recompilation
        env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
        results = {}
        for tag, flags in [("batch1", []), (f"batch{batch}", ["--batch", str(batch)])]:
            out_dir = os.path.join(tmp, f"out_{tag}")
            t0 = time.time()
            r = subprocess.run(
                [
                    sys.executable, "enhance.py",
                    "--checkpoint", os.path.join(ckpt_dir, "chkpt_1"),
                    "--model", model, "--jit",
                    "--compute-dtype", "bfloat16",
                    *flags, *files, "--out-dir", out_dir,
                ],
                cwd=ROOT, env=env, capture_output=True, text=True,
            )
            dt = time.time() - t0
            if r.returncode != 0:
                print(r.stderr[-3000:])
                raise SystemExit(f"{tag} failed")
            results[tag] = dt
            print(f"{model} {tag}: {dt:.1f} s wall for {n_files} files "
                  f"({n_files / dt:.2f} files/s)")
        speedup = results["batch1"] / results[f"batch{batch}"]
        print(f"--batch {batch} end-to-end CLI speedup: {speedup:.2f}x")


if __name__ == "__main__":
    main()
