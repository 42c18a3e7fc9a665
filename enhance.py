"""Enhancement inference CLI: load a trained checkpoint and enhance wavs.

The reference exposes no inference script (enhancement happens inside the
validation loop); this is the drop-in inference surface users expect.

Usage:
    python enhance.py --checkpoint models/RUN/chkpt_opt \
        --model DCCRN [--masking-mode E] [--lstm complex] \
        noisy1.wav [noisy2.wav ...] --out-dir enhanced/
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("wavs", nargs="+")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--model", default="DCCRN", choices=["DCCRN", "CRN", "FullSubNet"])
    p.add_argument("--masking-mode", default="E")
    p.add_argument("--lstm", default="complex")
    p.add_argument("--out-dir", default="enhanced")
    p.add_argument(
        "--jit",
        action=argparse.BooleanOptionalAction,
        default=None,
        help="jit the forward with 1-second length bucketing (one compile "
        "per bucket, reused across files).  Default: on for accelerator "
        "backends, off for CPU.",
    )
    p.add_argument(
        "--streaming",
        action="store_true",
        help="chunked carried-state inference (DCCRN/CRN): processes the "
        "wav in --chunk-ms pieces with a fixed algorithmic latency, "
        "interior-exact vs whole-utterance processing.",
    )
    p.add_argument("--chunk-ms", type=int, default=100)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from se_tpu.config import Config
    from se_tpu.models import build_model
    from se_tpu.train.state import create_train_state
    from se_tpu.train.checkpoint import restore_checkpoint
    from se_tpu.data.synth import read_wav, write_wav

    cfg = Config(
        model=args.model, masking_mode=args.masking_mode, lstm=args.lstm
    )
    model, state = create_train_state(cfg)
    state, _ = restore_checkpoint(args.checkpoint, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    os.makedirs(args.out_dir, exist_ok=True)

    if cfg.model == "FullSubNet":
        from se_tpu.dsp import frame_stft
        from se_tpu.train.steps import fullsubnet_enhance

        def enhance(wav):
            s = cfg.stft
            noisy_complex = frame_stft(
                wav[None], s.fft_len, s.torch_hop, s.win_len
            )
            mag = jnp.abs(noisy_complex)
            cRM = model.apply(variables, mag, train=False)
            return fullsubnet_enhance(cfg, cRM, noisy_complex, wav.shape[-1])[0]

    else:

        def enhance(wav):
            out = model.apply(variables, wav[None], train=False)
            return out[-1][0]

    use_jit = args.jit
    if use_jit is None:
        use_jit = jax.default_backend() != "cpu"

    if args.streaming:
        if cfg.model == "FullSubNet":
            raise SystemExit(
                "--streaming supports DCCRN and CRN on the waveform CLI; "
                "FullSubNet streams in the STFT-frame domain — use "
                "se_tpu.models.streaming_fullsubnet.StreamingFullSubNet"
                ".enhance_chunk directly."
            )
        from se_tpu.models.streaming import StreamingDCCRN
        from se_tpu.models.streaming_crn import StreamingCRN

        stream = (
            StreamingDCCRN(cfg) if cfg.model == "DCCRN" else StreamingCRN(cfg)
        )
        hop = cfg.stft.win_inc
        chunk = max(1, args.chunk_ms * cfg.stft.fs // 1000 // hop) * hop
        chunk_step = (
            jax.jit(stream.apply) if use_jit else stream.apply
        )

        def enhance(wav):  # noqa: F811 — streaming replaces the closures
            L = wav.shape[-1]
            pad = -(-L // chunk) * chunk - L
            wavp = jnp.pad(wav, (0, pad))[None]
            state, frames = None, []
            for s in range(0, wavp.shape[-1], chunk):
                spec, state = chunk_step(
                    variables, wavp[:, s : s + chunk], state
                )
                frames.append(spec)
            bound = stream.bind(variables)
            # drop the algorithmic-latency frames: the remaining stream is
            # then sample-exact with the batch forward from sample 0
            spec_all = jnp.concatenate(frames, axis=-1)[..., bound.n_stages:]
            y = np.asarray(bound.synthesize(spec_all))[0]
            return y[:L] if len(y) >= L else np.pad(y, (0, L - len(y)))

    elif use_jit:
        # bucket lengths to whole seconds so jax.jit's shape-keyed cache
        # compiles once per bucket instead of once per file; the zero pad
        # only influences the trailing analysis frames and is trimmed off.
        # Exception: FullSubNet's offline_* norms take utterance-GLOBAL
        # statistics (mean over every time frame, se_tpu/ops/norms.py),
        # so padded zero frames would rescale the normalised input for the
        # whole utterance — jit per exact length instead (shape-keyed
        # cache still shares compiles across same-length files).  The
        # cumulative_* norms are causal prefix statistics, so for them the
        # pad really does only touch the trimmed-off tail.
        offline_norm = cfg.model == "FullSubNet" and cfg.fullsubnet.norm_type.startswith("offline")
        bucket = 1 if offline_norm else cfg.stft.fs
        jitted = jax.jit(enhance)

        def enhance(wav):  # noqa: F811 — wraps the eager closure above
            L = wav.shape[-1]
            pad = -(-L // bucket) * bucket - L
            y = jitted(jnp.pad(wav, (0, pad)))
            return np.asarray(y)[:L]

    for path in args.wavs:
        wav, fs = read_wav(path, cfg.stft.fs)
        y = enhance(jnp.asarray(wav.astype(np.float32)))
        out_path = os.path.join(args.out_dir, os.path.basename(path))
        write_wav(out_path, np.asarray(y), cfg.stft.fs)
        print(f"enhanced {path} -> {out_path}")


if __name__ == "__main__":
    main()
