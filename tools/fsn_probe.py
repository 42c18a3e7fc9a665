"""Where does the FullSubNet step's time go?  Times the full enhance /
train steps and the fb/sb recurrences standalone at matching shapes.

    python tools/fsn_probe.py [enhance|train] [B] [f32|bf16]

Timing via scalar fetch (axon tunnel: block_until_ready unreliable).
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

mode = sys.argv[1] if len(sys.argv) > 1 else "enhance"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
dtype = sys.argv[3] if len(sys.argv) > 3 else "bf16"

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from se_tpu.config import Config
from se_tpu.models.layers import SequenceModel

kw = dict(model="FullSubNet", loss="MSE")
if dtype == "bf16":
    kw["compute_dtype"] = "bfloat16"
cfg = Config(**kw)
fsn = cfg.fullsubnet
F = cfg.stft.num_freqs
L = cfg.stft.fs * 3
T = L // cfg.stft.torch_hop + 1
cdt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
print(f"B={B} F={F} T={T} dtype={dtype} fb_H={fsn.fb_model_hidden_size} "
      f"sb_H={fsn.sb_model_hidden_size}")

rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda a: float(jnp.asarray(a).reshape(-1)[0]), out
    )
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda a: float(jnp.asarray(a).reshape(-1)[0]), out
    )
    return (time.perf_counter() - t0) / iters


def seq_model(name, in_size, hidden, n_batch, out_size):
    m = SequenceModel(
        input_size=in_size, output_size=out_size, hidden_size=hidden,
        num_layers=2, sequence_model=fsn.sequence_model
        if hasattr(fsn, "sequence_model") else "LSTM",
        output_activate_function=None,
        use_pallas=cfg.use_pallas_lstm,
    )
    x = jnp.asarray(rng.standard_normal((n_batch, in_size, T)), cdt)
    v = m.init(key, x)

    @jax.jit
    def f(v, x):
        return m.apply(v, x)

    ms = timeit(f, v, x) * 1e3
    print(f"{name}: in={in_size} H={hidden} rows={n_batch} -> {ms:.2f} ms")
    return ms


# standalone recurrences at the step's true shapes
fb_ms = seq_model("fb_model", F, fsn.fb_model_hidden_size, B, F)
sb_in = (fsn.sb_num_neighbors * 2 + 1) + (fsn.fb_num_neighbors * 2 + 1)
sb_ms = seq_model("sb_model", sb_in, fsn.sb_model_hidden_size, B * F, 2)

# whole step
from se_tpu.train import create_train_state, make_train_step
from se_tpu.train.steps import make_eval_step

model, state = create_train_state(cfg)
noisy = jnp.asarray((rng.standard_normal((B, L)) * 0.1).astype(np.float32))
clean = jnp.asarray((rng.standard_normal((B, L)) * 0.1).astype(np.float32))
if mode == "train":
    step = make_train_step(cfg, model)
    # the jitted step DONATES the state (steps.py donate_argnums=(0,)):
    # the timing loop must carry it, or every call after the first
    # enqueues a deleted buffer (surfaces through the axon tunnel as an
    # opaque INVALID_ARGUMENT on the next fetch)
    carry = {"s": state}

    def _train_once():
        carry["s"], metrics = step(carry["s"], noisy, clean, key)
        return metrics["loss"]

    step_ms = timeit(_train_once) * 1e3
else:
    estep = make_eval_step(cfg, model)
    step_ms = timeit(lambda: estep(state, noisy, clean)[0]["loss"]) * 1e3
print(f"full {mode} step: {step_ms:.2f} ms  "
      f"(fb {100*fb_ms/step_ms:.0f}%, sb {100*sb_ms/step_ms:.0f}% as "
      f"forward-only shares)")
