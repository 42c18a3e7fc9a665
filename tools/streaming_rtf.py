"""Streaming (serving) benchmark: per-chunk latency and real-time factor.

Measures the chunked carried-state enhancement path the way a serving
deployment runs it: B concurrent streams, one jitted step per audio
chunk, a scalar fetch per step (the host must see the samples to ship
them).  Reports per-chunk wall latency (mean/p95), the real-time factor
(chunk duration / latency), and the implied concurrent real-time stream
capacity of one chip.

The reference has no streaming or serving path at all (enhancement only
happens inside its validation loop, reference: trainer.py:188-239);
this benchmarks a capability of this framework's own streaming executors.

Usage: PYTHONPATH=. python tools/streaming_rtf.py [MODEL] [B] [CHUNK_MS]
  MODEL    DCCRN | CRN | FullSubNet   (default DCCRN)
  B        concurrent streams         (default 32)
  CHUNK_MS chunk size in ms           (default 100)

The streaming executors run f32 only: they are sample-exact vs the f32
batch forward (their correctness contract), and the per-chunk latency is
dominated by the sequential per-frame scan, not FLOPs (docs/PERF.md), so
a bf16 activation path would change numerics without moving latency.

Note (axon): the tunnelled single-chip TPU adds a ~3-4 ms per-dispatch
floor, which is part of honest serving latency here but would not exist
on a locally attached chip.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    model_name = sys.argv[1] if len(sys.argv) > 1 else "DCCRN"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    chunk_ms = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    if len(sys.argv) > 4 and sys.argv[4] != "float32":
        raise SystemExit(
            "streaming executors are f32-only (exactness contract vs the "
            "batch forward; latency is scan-bound, not FLOP-bound — see "
            "module docstring)"
        )
    dtype = "float32"

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from se_tpu.config import Config, FullSubNetConfig
    from se_tpu.models.factory import init_model, build_model

    fs = 16000
    n_warm, n_meas = 10, 50
    rng = np.random.default_rng(0)

    def make_runner(step_chunk, fetch_value, pool_chunk):
        """Shared chunk-runner scaffolding: a pre-generated input pool
        (host-side RNG synthesis must not be timed on this 1-core host),
        a run_chunk(fetch=) closure and a fetch_last for the pipelined
        device-time window."""
        pool = [
            jnp.asarray(
                (rng.standard_normal((B, pool_chunk)) * 0.1).astype(np.float32)
            )
            for _ in range(4)
        ]
        box = {"n": 0, "last": None}

        def run_chunk(fetch=True):
            box["n"] += 1
            out = step_chunk(pool[box["n"] % len(pool)])
            box["last"] = out
            if fetch:
                fetch_value(out)

        def fetch_last():
            fetch_value(box["last"])

        return run_chunk, fetch_last

    if model_name == "FullSubNet":
        from functools import partial

        from se_tpu.dsp.streaming_stft import StreamingStft
        from se_tpu.models.streaming_fullsubnet import StreamingFullSubNet

        cfg = Config(
            model="FullSubNet", loss="MSE", compute_dtype=dtype,
            fullsubnet=FullSubNetConfig(norm_type="cumulative_laplace_norm"),
        )
        variables = init_model(cfg, build_model(cfg), batch=2, seconds=1)
        stream = StreamingFullSubNet(cfg)
        s = cfg.stft
        hop = s.torch_hop
        chunk = max(1, chunk_ms * fs // 1000 // hop) * hop
        step = jax.jit(partial(stream.apply, method="enhance_chunk"))
        ana = StreamingStft(s.fft_len, hop, s.win_len)

        st = {"a": None, "m": None}

        def step_chunk(seg):
            frames, st["a"] = ana.push(seg, st["a"])
            e, st["m"] = step(variables, frames, st["m"])
            return e

        run_chunk, fetch_last = make_runner(
            step_chunk,
            lambda e: float(jnp.real(e[0, 0, -1])),  # fetch = samples shipped
            chunk,
        )
        # prime the analysis buffer so every measured push yields frames
        run_chunk()
    else:
        from se_tpu.models.streaming import StreamingDCCRN
        from se_tpu.models.streaming_crn import StreamingCRN

        lstm = "complex" if model_name == "DCCRN" else "real"
        cfg = Config(model=model_name, lstm=lstm, compute_dtype=dtype)
        variables = init_model(cfg, build_model(cfg), batch=2, seconds=1)
        stream = (
            StreamingDCCRN(cfg) if model_name == "DCCRN" else StreamingCRN(cfg)
        )
        hop = cfg.stft.win_inc
        chunk = max(1, chunk_ms * fs // 1000 // hop) * hop
        step = jax.jit(stream.apply)

        st = {"s": None}

        def step_chunk(seg):
            spec, st["s"] = step(variables, seg, st["s"])
            return spec

        run_chunk, fetch_last = make_runner(
            step_chunk, lambda spec: float(spec[0, 0, -1]), chunk
        )

    for _ in range(n_warm):
        run_chunk()
    lat = []
    for _ in range(n_meas):
        t0 = time.perf_counter()
        run_chunk()
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.asarray(lat)
    # pipelined device time: dispatch a window of steps, fetch once — this
    # removes the tunnel round-trip that dominates the per-step latency
    # above (a locally attached chip would see ~this per chunk); best of 3
    # windows because the tunnel occasionally stalls a whole window
    dev = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(20):
            run_chunk(fetch=False)
        fetch_last()
        dev.append((time.perf_counter() - t0) / 20 * 1e3)
    dev_ms = min(dev)
    chunk_dur_ms = chunk / fs * 1e3
    rtf = chunk_dur_ms / lat.mean()
    dev_rtf = chunk_dur_ms / dev_ms
    print(
        f"{model_name} {dtype} B={B} chunk={chunk} samples "
        f"({chunk_dur_ms:.0f} ms)\n"
        f"per-chunk latency mean {lat.mean():.2f} ms | p50 "
        f"{np.percentile(lat, 50):.2f} | p95 {np.percentile(lat, 95):.2f} "
        f"(includes the axon tunnel round-trip)\n"
        f"real-time factor {rtf:.1f}x -> ~{int(B * rtf)} concurrent "
        f"real-time streams/chip at this batch (tunnel-bound)\n"
        f"device time {dev_ms:.2f} ms/chunk -> device-side capacity "
        f"~{int(B * dev_rtf)} streams/chip (locally attached bound)"
    )


if __name__ == "__main__":
    main()
