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
    p.add_argument(
        "--sequence-model", default="LSTM", choices=["LSTM", "GRU"],
        help="FullSubNet RNN cell type the checkpoint was trained with",
    )
    p.add_argument("--no-skip", action="store_true",
                   help="checkpoint was trained with skip_type=False")
    p.add_argument("--use-cbn", action="store_true",
                   help="checkpoint was trained with complex batch norm")
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
        help="chunked carried-state inference: processes the wav in "
        "--chunk-ms pieces with a fixed algorithmic latency, exact vs "
        "whole-utterance processing (FullSubNet needs --fsn-norm "
        "cumulative_*).",
    )
    p.add_argument("--chunk-ms", type=int, default=100)
    p.add_argument(
        "--batch", type=int, default=1,
        help="group same-bucket files into device batches of this size "
        "(jit path only; per-file outputs match --batch 1 up to "
        "float-lowering noise — tested to 2 int16 LSBs; every model "
        "processes batch rows independently, and FullSubNet offline "
        "norms take per-sample valid_frames).  The last group of a "
        "bucket is padded by repeating its final row so each bucket "
        "compiles exactly one [batch, len] signature.",
    )
    p.add_argument(
        "--compute-dtype", default="float32",
        choices=["float32", "bfloat16"],
        help="activation dtype for the batch forward (bfloat16 is the "
        "fast TPU path; streaming stays f32 — exactness contract)",
    )
    p.add_argument(
        "--fsn-norm",
        default=None,
        help="FullSubNet norm_type override (e.g. cumulative_laplace_norm "
        "for streaming; the norms are parameter-free statistics, so any "
        "checkpoint accepts any norm).",
    )
    args = p.parse_args()
    if args.batch < 1:
        p.error(f"--batch must be >= 1 (got {args.batch})")

    import jax
    import jax.numpy as jnp

    # flag-combination validity up front, before checkpoint restore or
    # model construction does any work
    use_jit = args.jit
    if use_jit is None:
        use_jit = jax.default_backend() != "cpu"
    if args.batch > 1 and (args.streaming or not use_jit):
        hint = (
            "drop --streaming" if args.streaming
            else ("drop --no-jit" if args.jit is False
                  else "pass --jit (jit defaults off on the CPU backend)")
        )
        p.error(f"--batch needs the jitted bucketed path: {hint}")

    from se_tpu.config import Config, FullSubNetConfig
    from se_tpu.models import build_model
    from se_tpu.train.state import create_train_state
    from se_tpu.train.checkpoint import restore_checkpoint
    from se_tpu.data.synth import read_wav, write_wav

    fsn = (
        FullSubNetConfig(norm_type=args.fsn_norm)
        if args.fsn_norm
        else FullSubNetConfig()
    )
    if args.streaming and args.compute_dtype != "float32":
        raise SystemExit(
            "--streaming runs f32 only (sample-exact vs the f32 batch "
            "forward; latency is not FLOP-bound — docs/PERF.md)"
        )
    from se_tpu.config import DccrnConfig

    cfg = Config(
        model=args.model, masking_mode=args.masking_mode, lstm=args.lstm,
        sequence_model=args.sequence_model,
        skip_type=not args.no_skip,
        dccrn=DccrnConfig(use_cbn=args.use_cbn),
        fullsubnet=fsn, compute_dtype=args.compute_dtype,
    )
    model, state = create_train_state(cfg)
    state, _ = restore_checkpoint(args.checkpoint, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    os.makedirs(args.out_dir, exist_ok=True)

    if cfg.model == "FullSubNet":
        from se_tpu.dsp import frame_stft
        from se_tpu.train.steps import fullsubnet_enhance

        def enhance(wav, valid_frames=None):
            s = cfg.stft
            noisy_complex = frame_stft(
                wav[None], s.fft_len, s.torch_hop, s.win_len
            )
            mag = jnp.abs(noisy_complex)
            cRM = model.apply(
                variables, mag, train=False, valid_frames=valid_frames
            )
            return fullsubnet_enhance(cfg, cRM, noisy_complex, wav.shape[-1])[0]

    else:

        def enhance(wav):
            out = model.apply(variables, wav[None], train=False)
            return out[-1][0]

    if args.streaming and cfg.model == "FullSubNet":
        if not cfg.fullsubnet.norm_type.startswith("cumulative"):
            raise SystemExit(
                "FullSubNet streaming needs a causal norm: pass "
                "--fsn-norm cumulative_laplace_norm (or cumulative_"
                "layer_norm).  The offline_* norms are utterance-global "
                "statistics with no causal form."
            )
        from functools import partial

        from se_tpu.dsp.streaming_stft import StreamingIstft, StreamingStft
        from se_tpu.models.streaming_fullsubnet import StreamingFullSubNet

        stream = StreamingFullSubNet(cfg)
        s = cfg.stft
        hop = s.torch_hop
        chunk = max(1, args.chunk_ms * s.fs // 1000 // hop) * hop
        la = cfg.fullsubnet.look_ahead
        model_step = partial(stream.apply, method="enhance_chunk")
        if use_jit:
            model_step = jax.jit(model_step)

        def enhance(wav):
            # The MODEL runs chunk-streaming with carried state (the
            # expensive part: per-chunk enhance_chunk, one jit signature);
            # enhanced mask frames are collected on the HOST and the OLA
            # synthesis runs once per file.  Host-side frame handling is
            # deliberate: the axon TPU backend intermittently rejects
            # eager complex64 ops with tiny minor dims (UNIMPLEMENTED) —
            # the end-of-stream flush/look-ahead blocks are exactly that
            # shape — while host transfers and complex math inside jit
            # are reliable.  Live serving keeps the fully-incremental
            # push/flush API (StreamingIstft; tests/test_streaming_*).
            L = wav.shape[-1]
            # the analysis needs its first chunk to exceed the reflect pad
            # (fft_len//2 samples); right-pad very short/empty wavs with
            # zeros — causal norms make the trailing pad inert, and the
            # output is trimmed back to L below
            min_len = s.fft_len // 2 + 1
            if L < min_len:
                wav = jnp.pad(wav, (0, min_len - L))
            ana = StreamingStft(s.fft_len, hop, s.win_len)
            syn = StreamingIstft(s.fft_len, hop, s.win_len)
            st = {"a": None, "m": None, "skip": la}
            collected = []

            def feed(frames, keep=None):
                """Run a frame block; collect output columns [drop:keep]
                on the host (``keep`` discards trailing padding frames'
                outputs)."""
                if frames.shape[-1]:
                    e, st["m"] = model_step(variables, frames, st["m"])
                    # drop the stream's look_ahead warm-up outputs (the
                    # batch forward crops these, se_tpu/models/fullsubnet.py)
                    n_keep = e.shape[-1] if keep is None else keep
                    drop = min(st["skip"], n_keep)
                    st["skip"] -= drop
                    collected.append(np.asarray(e)[..., drop:n_keep])

            chunk_T = chunk // hop
            for lo in range(0, wav.shape[-1], chunk):
                frames, st["a"] = ana.push(wav[None, lo : lo + chunk], st["a"])
                feed(frames)
            # End of stream: the batch forward right-pads the magnitudes
            # with look_ahead zero frames so the masks for the final
            # frames are emitted; feed them with the analysis flush in ONE
            # block, zero-padded up to a regular chunk's frame count —
            # the model is causal (cumulative norms, unidirectional RNNs),
            # so the padding frames cannot influence the kept outputs and
            # the block reuses the chunk jit signature.
            tail = np.asarray(ana.flush(st["a"]))
            keep = tail.shape[-1] + la
            pad_T = max(chunk_T, keep) - tail.shape[-1]
            tail = np.concatenate(
                [tail, np.zeros((1, s.num_freqs, pad_T), np.complex64)],
                axis=-1,
            )
            feed(jnp.asarray(tail), keep=keep)
            all_frames = jnp.asarray(np.concatenate(collected, axis=-1))
            y, sstate = syn.push(all_frames, None)
            y = np.concatenate(
                [np.asarray(y), np.asarray(syn.flush(sstate))], axis=-1
            )[0]
            y = y[s.fft_len // 2 : s.fft_len // 2 + L]
            return y if len(y) == L else np.pad(y, (0, L - len(y)))

    elif args.streaming:
        from se_tpu.dsp import make_conv_stft_kernels
        from se_tpu.dsp.streaming_stft import StreamingConvIstft
        from se_tpu.models.streaming import StreamingDCCRN
        from se_tpu.models.streaming_crn import StreamingCRN

        stream = (
            StreamingDCCRN(cfg) if cfg.model == "DCCRN" else StreamingCRN(cfg)
        )
        s_ = cfg.stft
        kernels = make_conv_stft_kernels(
            s_.win_len, s_.win_inc, s_.fft_len, s_.window
        )
        hop = s_.win_inc
        chunk = max(1, args.chunk_ms * cfg.stft.fs // 1000 // hop) * hop
        chunk_step = (
            jax.jit(stream.apply) if use_jit else stream.apply
        )
        from functools import partial as _partial

        flush_step = _partial(stream.apply, method="flush_stream")
        if use_jit:
            flush_step = jax.jit(flush_step)
        n_skip = stream.bind(variables).n_stages

        def enhance(wav):  # noqa: F811 — streaming replaces the closures
            # chunk-streaming end to end: model frames -> OLA synthesis,
            # emitting finalized samples per chunk (the clamp is
            # pointwise, so per-chunk clip == the batch path's clip).
            # End-of-stream exactness (round 5): feed exactly the batch
            # conv-STFT's frame set — the wav plus its win-hop zero
            # right pad (a short final partial chunk, one extra compile
            # per distinct remainder) — then flush_stream emits the
            # decoder cascade's final n_stages frames, which zero-feed
            # cannot produce; the result equals the batch forward over
            # the WHOLE wav (tests/test_streaming.py, test_cli.py).
            L = wav.shape[-1]
            trim = kernels.win_len - kernels.hop
            wavp = jnp.pad(wav, (0, trim))[None]
            syn = StreamingConvIstft(kernels)
            state, sstate, outs = None, None, []
            skip = n_skip  # algorithmic-latency frames: drop as they arrive
            for s in range(0, wavp.shape[-1], chunk):
                spec, state = chunk_step(
                    variables, wavp[:, s : s + chunk], state
                )
                drop = min(skip, spec.shape[-1])
                skip -= drop
                y, sstate = syn.push(spec[..., drop:], sstate)
                outs.append(jnp.clip(y, -1.0, 1.0))
            tail = flush_step(variables, state)
            drop = min(skip, tail.shape[-1])
            y, sstate = syn.push(tail[..., drop:], sstate)
            outs.append(jnp.clip(y, -1.0, 1.0))
            outs.append(jnp.clip(syn.flush(sstate), -1.0, 1.0))
            y = np.asarray(jnp.concatenate(outs, axis=-1))[0][trim:-trim]
            y = y[:L]
            return y if len(y) == L else np.pad(y, (0, L - len(y)))

    elif use_jit:
        # bucket lengths to whole seconds so jax.jit's shape-keyed cache
        # compiles once per bucket instead of once per file; the zero pad
        # only influences the trailing analysis frames and is trimmed off.
        #
        # FullSubNet's offline_* norms take utterance-GLOBAL statistics
        # (mean over every time frame, se_tpu/ops/norms.py), so naive
        # zero-pad would rescale the normalised input for the whole
        # utterance.  The pad-aware path keeps 1-s bucketing exact on the
        # valid prefix: (a) the pad's first fft_len/2 samples REFLECT the
        # signal tail — exactly the continuation torch.stft-style framing
        # reads past the end — so every valid frame is bit-identical to
        # the exact-length run's; (b) the model gets ``valid_frames`` and
        # masks later frames out of the statistics (se_tpu/models/
        # fullsubnet.py).  Only the final analysis window of output can
        # differ (same contract as the conv-STFT models' bucketing).
        offline_norm = cfg.model == "FullSubNet" and cfg.fullsubnet.norm_type.startswith("offline")
        bucket = cfg.stft.fs
        jitted = jax.jit(enhance)
        exact = enhance  # un-jitted closure for the ultra-short fallback
        margin = cfg.stft.fft_len // 2
        # Ultra-short files skip bucketing and run at their exact length
        # (bit-identical to eager; a handful of tiny-shape compiles at
        # most).  FullSubNet: its torch.stft-style framing reflect-pads
        # fft_len/2 samples at BOTH edges, and when the file is shorter
        # than that pad the reflection bounces back and forth through
        # the whole signal — no bucketed buffer can reproduce it.
        # Conv-STFT models: zero-pad bucketing is exact except in the
        # final analysis window, and a sub-win_len file sits ENTIRELY
        # inside that window, so bucketing would buy nothing but a
        # whole-file deviation.
        short_limit = (
            cfg.stft.fft_len // 2 if cfg.model == "FullSubNet"
            else cfg.stft.win_len
        )

        def prepare(wav):
            """[L] wav -> (bucket-padded buffer, valid frame count | None)."""
            L = int(wav.shape[-1])
            wav = np.asarray(wav, np.float32)
            if offline_norm:
                padded = -(-(L + margin) // bucket) * bucket
                # torch.stft's end reflection: x[L+k] = x[L-2-k]
                tail = wav[max(L - 1 - margin, 0):max(L - 1, 0)][::-1]
                buf = np.zeros(padded, wav.dtype)
                buf[:L] = wav
                buf[L:L + len(tail)] = tail
                return buf, 1 + L // cfg.stft.torch_hop
            pad = -(-L // bucket) * bucket - L
            return np.pad(wav, (0, pad)), None

        if offline_norm:
            def enhance(wav):  # noqa: F811 — wraps the eager closure above
                L = int(wav.shape[-1])
                if L <= short_limit:
                    return np.asarray(exact(wav))[:L]
                buf, n_frames = prepare(wav)
                y = jitted(jnp.asarray(buf), jnp.asarray(n_frames))
                return np.asarray(y)[:L]
        else:
            def enhance(wav):  # noqa: F811 — wraps the eager closure above
                L = int(wav.shape[-1])
                if L <= short_limit:
                    return np.asarray(exact(wav))[:L]
                y = jitted(jnp.asarray(prepare(wav)[0]))
                return np.asarray(y)[:L]

        if args.batch > 1:
            # batched core over [B, L] buffers; rows are independent for
            # every model (convs/LSTMs batch per-sample; FullSubNet's
            # offline norms take per-sample valid_frames), so each output
            # row matches its --batch 1 run of the same bucket up to
            # [B, L]-vs-[1, L] XLA float-lowering noise (~1e-7; tested
            # to 2 int16 LSBs in tests/test_cli.py)
            if cfg.model == "FullSubNet":
                def core(wavs, valid_frames=None):
                    s = cfg.stft
                    noisy_complex = frame_stft(
                        wavs, s.fft_len, s.torch_hop, s.win_len
                    )
                    mag = jnp.abs(noisy_complex)
                    cRM = model.apply(
                        variables, mag, train=False,
                        valid_frames=valid_frames,
                    )
                    return fullsubnet_enhance(
                        cfg, cRM, noisy_complex, wavs.shape[-1]
                    )
            else:
                def core(wavs):
                    return model.apply(variables, wavs, train=False)[-1]
            jitted_batch = jax.jit(core)

    def write_out(path, y):
        out_path = os.path.join(args.out_dir, os.path.basename(path))
        write_wav(out_path, np.asarray(y), cfg.stft.fs)
        print(f"enhanced {path} -> {out_path}")

    if args.batch > 1:
        from collections import defaultdict

        # two passes so host memory stays O(batch), not O(corpus): the
        # first pass only records each file's length (the decoded wav is
        # dropped immediately); the second re-reads just one group's
        # files right before stacking them into the device batch
        def padded_len(L: int) -> int:
            if offline_norm:
                return -(-(L + margin) // bucket) * bucket
            return -(-L // bucket) * bucket

        groups = defaultdict(list)  # padded length -> [(path, L)]
        for path in args.wavs:
            wav, _fs = read_wav(path, cfg.stft.fs)
            L = len(wav)
            if L <= short_limit:
                # ultra-short files keep the exact-length eager contract
                wav = wav.astype(np.float32)
                write_out(path, np.asarray(exact(jnp.asarray(wav)))[:L])
                continue
            groups[padded_len(L)].append((path, L))
        for blen in sorted(groups):
            entries = groups[blen]
            for i in range(0, len(entries), args.batch):
                chunk = entries[i : i + args.batch]
                prepped = [
                    prepare(read_wav(path, cfg.stft.fs)[0].astype(np.float32))
                    for path, _ in chunk
                ]
                # repeat the last row so every group of a bucket runs the
                # same [batch, blen] jit signature
                rows = prepped + [prepped[-1]] * (args.batch - len(chunk))
                bufs = jnp.asarray(np.stack([r[0] for r in rows]))
                if offline_norm:
                    nfs = jnp.asarray(np.array([r[1] for r in rows]))
                    ys = np.asarray(jitted_batch(bufs, nfs))
                else:
                    ys = np.asarray(jitted_batch(bufs))
                for (path, L), y in zip(chunk, ys):
                    write_out(path, y[:L])
    else:
        for path in args.wavs:
            wav, _fs = read_wav(path, cfg.stft.fs)
            write_out(path, enhance(jnp.asarray(wav.astype(np.float32))))


if __name__ == "__main__":
    main()
