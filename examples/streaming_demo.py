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
    from se_tpu.dsp import make_conv_stft_kernels
    from se_tpu.dsp.streaming_stft import StreamingConvIstft
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

    # feed in 100 ms chunks with carried state, emitting finalized
    # samples per chunk (streaming synthesis, no end-of-utterance pass)
    s = cfg.stft
    syn = StreamingConvIstft(
        make_conv_stft_kernels(s.win_len, s.win_inc, s.fft_len, s.window)
    )
    chunk = 1600
    state, sstate = None, None
    n_chunks, n_samples = 0, 0
    for start in range(0, len(noisy), chunk):
        seg = jnp.asarray(noisy[None, start : start + chunk])
        spec, state = stream.apply(variables, seg, state)
        samples, sstate = syn.push(spec, sstate)
        samples = jnp.clip(samples, -1.0, 1.0)
        n_chunks += 1
        n_samples += samples.shape[-1]
        print(
            f"chunk @{start / 16000:.2f}s -> {spec.shape[-1]} frames, "
            f"{samples.shape[-1]} samples out"
        )
    tail = syn.flush(sstate)
    n_samples += tail.shape[-1]
    print(f"streamed {n_chunks} chunks -> {n_samples} samples "
          f"(60 ms model latency + one-frame OLA latency)")


if __name__ == "__main__":
    main()
