"""Streaming enhancement demo: frame-by-frame DCCRN over chunked audio.

Shows the carried-state API: chunks of any hop-multiple length stream
through the model with bit-identical results to whole-utterance
processing (interior frames), at a fixed 6-frame (60 ms) algorithmic
latency.

Run: python examples/streaming_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from se_tpu.config import Config, DccrnConfig
    from se_tpu.models import build_model
    from se_tpu.models.streaming import StreamingDCCRN
    from se_tpu.models.factory import init_model

    cfg = Config(
        dccrn=DccrnConfig(kernel_num=(8, 16, 16, 32, 32, 32), rnn_units=32)
    )
    variables = init_model(cfg, build_model(cfg), batch=1, seconds=1)
    stream = StreamingDCCRN(cfg)

    # synthesise 2 s of noisy audio
    rng = np.random.default_rng(0)
    t = np.arange(32000) / 16000
    clean = 0.3 * np.sin(2 * np.pi * 440 * t) * np.clip(
        np.sin(2 * np.pi * 3 * t), 0, None
    )
    noisy = (clean + 0.05 * rng.standard_normal(len(t))).astype(np.float32)

    # feed in 100 ms chunks with carried state
    chunk = 1600
    state = None
    out_frames = []
    for start in range(0, len(noisy), chunk):
        seg = jnp.asarray(noisy[None, start : start + chunk])
        spec, state = stream.apply(variables, seg, state)
        out_frames.append(np.asarray(spec))
        print(f"chunk @{start / 16000:.2f}s -> {spec.shape[-1]} frames")

    all_spec = jnp.concatenate([jnp.asarray(f) for f in out_frames], axis=-1)
    wav = stream.bind(variables).synthesize(all_spec)
    print(f"streamed {len(out_frames)} chunks -> {wav.shape[-1]} samples "
          f"(60 ms latency)")


if __name__ == "__main__":
    main()
