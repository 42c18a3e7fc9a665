import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import time, json
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from se_tpu.config import Config
from se_tpu.train import create_train_state, make_train_step
from se_tpu.train.steps import make_eval_step

cfg = Config()
model, state = create_train_state(cfg)
L = cfg.stft.fs * 3
rng = np.random.default_rng(0)

for name, B, make in [("train", 112, None), ("enhance", 96, None)]:
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
    print(name, "B=", B, "flops/step=", flops, "flops/utt=", flops / B)
