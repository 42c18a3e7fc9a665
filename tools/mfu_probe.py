"""XLA-counted FLOPs per step/utterance for any model family.

Usage:
    python tools/mfu_probe.py [MODEL] [DTYPE] [B_TRAIN] [B_ENHANCE]

Defaults: DCCRN f32 112 96.  Compile-only (cost_analysis on the lowered
step); combine the flops/utterance figure with bench.py throughput for
MFU:  MFU = flops/utt * utt/s / peak  (v5e: 197e12 bf16, 98.5e12 f32).
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from se_tpu.config import Config
from se_tpu.train import create_train_state, make_train_step
from se_tpu.train.steps import make_eval_step

model_name = sys.argv[1] if len(sys.argv) > 1 else "DCCRN"
dtype = sys.argv[2] if len(sys.argv) > 2 else "f32"
b_train = int(sys.argv[3]) if len(sys.argv) > 3 else 112
b_enh = int(sys.argv[4]) if len(sys.argv) > 4 else 96

kw = {}
if model_name == "CRN":
    kw = dict(model="CRN", lstm="real", loss="MSE")
elif model_name == "FullSubNet":
    kw = dict(model="FullSubNet", loss="MSE")
elif model_name == "FullSubNetGRU":
    kw = dict(model="FullSubNet", loss="MSE", sequence_model="GRU")
if dtype == "bf16":
    kw["compute_dtype"] = "bfloat16"
# Pallas kernel FLOPs are invisible to XLA cost_analysis; count on the
# scan-cell lowering (same useful FLOPs — docs/PERF.md).
kw["use_pallas_lstm"] = "off"
cfg = Config(**kw)

model, state = create_train_state(cfg)
L = cfg.stft.fs * 3
rng = np.random.default_rng(0)

for name, B in [("train", b_train), ("enhance", b_enh)]:
    noisy = jnp.asarray((rng.standard_normal((B, L)) * 0.1).astype(np.float32))
    clean = jnp.asarray((rng.standard_normal((B, L)) * 0.1).astype(np.float32))
    if name == "train":
        step = make_train_step(cfg, model)
        lowered = jax.jit(lambda s, n, c, k: step(s, n, c, k)).lower(
            state, noisy, clean, jax.random.PRNGKey(0))
    else:
        estep = make_eval_step(cfg, model)
        lowered = jax.jit(lambda s, n, c: estep(s, n, c)).lower(state, noisy, clean)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list): ca = ca[0]
    flops = ca.get("flops", float("nan"))
    print(f"{model_name} {dtype} {name} B={B} flops/step={flops:.3e} "
          f"flops/utt={flops / B:.3e}")
