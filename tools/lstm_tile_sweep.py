"""Sweep the in-projection LSTM kernel's batch-tile size on the current
device at FullSubNet sub-band shapes.

    python tools/lstm_tile_sweep.py [TILE ...]

Times one 2-layer stack of fused_lstm_scan_inproj calls at
rows=8224, In=32, H=384, T=161 (the B=32 sb shape) per tile size.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from se_tpu.ops import pallas_lstm

T, Bb, In, H = 161, 8224, 32, 384
tiles = [int(t) for t in sys.argv[1:]] or [192, 512, 1032, 2056, 4112, 8224]

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((T, 1, Bb, In)), jnp.bfloat16)
wih = jnp.asarray(rng.standard_normal((1, In, 4 * H)) * 0.05, jnp.float32)
b = jnp.zeros((1, 4 * H), jnp.float32)
whh = jnp.asarray(rng.standard_normal((1, H, 4 * H)) * 0.02, jnp.float32)
h0 = jnp.zeros((1, Bb, H), jnp.float32)
c0 = jnp.zeros((1, Bb, H), jnp.float32)


@jax.jit
def two_layer(x):
    y1, _ = pallas_lstm.fused_lstm_scan_inproj(x, wih, b, whh, h0, c0)
    # layer 2 consumes layer 1's output (In = H for layer 2: reuse whh
    # as its w_ih just for timing purposes)
    whh_as_wih = jnp.broadcast_to(whh, (1, H, 4 * H))
    y2, _ = pallas_lstm.fused_lstm_scan_inproj(
        y1, whh_as_wih, b, whh, h0, c0)
    return y2


ref = None
for tile in tiles:
    pallas_lstm._inproj_target = (lambda t: (lambda H: t))(tile)
    two_layer._clear_cache()
    try:
        y = two_layer(x)
        float(jnp.asarray(y).reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(10):
            y = two_layer(x)
        float(jnp.asarray(y).reshape(-1)[0])
        ms = (time.perf_counter() - t0) / 10 * 1e3
        if ref is None:
            ref = np.asarray(y, np.float32)
            err = 0.0
        else:
            err = float(np.max(np.abs(np.asarray(y, np.float32) - ref)))
        print(f"tile={tile:5d}  {ms:7.2f} ms  max|dy|={err:.2e}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"tile={tile:5d}  FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)
