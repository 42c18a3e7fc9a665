"""Export se_tpu parameter trees as reference PyTorch checkpoints.

The inverse of ``torch_import``: walk a trained {params, batch_stats}
tree and emit a state_dict in the reference's key grammar (the attribute
names of models.py — ``encoder.{i}.0.real_conv.weight``,
``enhance.{l}.real_lstm.weight_ih_l0``, ``fb_model.sequence_model...``),
so a model trained on this framework can be loaded by the reference code
(or any torch tooling built around its checkpoints):

    python -m se_tpu.utils.torch_export \
        --checkpoint models/RUN/chkpt_30 --out chkpt_30.pt \
        --model DCCRN --lstm complex

writes ``torch.save({'model': state_dict, 'optimizer': {}, 'epoch': N})``
— the exact blob shape the reference's resume path consumes
(reference: train_interface.py:101-116 / :166-171).

Weights already live in the torch layout (OIHW convs, [4H, in] gate
matrices, [out, in] linears), so every tensor maps 1:1.  The ConvSTFT /
ConviSTFT basis buffers the reference registers on its modules
(``stft.weight``, ``istft.weight``/``window``/``enframe``) are
deterministic functions of the STFT geometry and are regenerated here
with the reference's own construction (tools_for_model.py:16-33), so
``load_state_dict(strict=True)`` succeeds.  BatchNorm's
``num_batches_tracked`` counters are emitted as zeros (they only matter
for momentum=None schedules, which the reference does not use).

Round-trip invariant (tested): ``import_reference_state_dict(
export_reference_state_dict(tree, cfg), cfg)`` reproduces the tree
exactly, for every model/variant the importer supports.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..config import Config

_LSTM_LEAVES = ("weight_ih", "weight_hh", "bias_ih", "bias_hh")


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _conv_stft_buffers(win_len: int, fft_len: int) -> Dict[str, np.ndarray]:
    """The reference's registered STFT buffers (tools_for_model.py:16-33):
    forward kernel = (rfft basis rows * window), inverse = pinv of the
    forward basis; ConviSTFT additionally registers the window and an
    identity 'enframe' kernel for the OLA envelope."""
    from scipy.signal import get_window

    window = get_window("hann", win_len, fftbins=True)
    basis = np.fft.rfft(np.eye(fft_len))[:win_len]
    kernel = np.concatenate([basis.real, basis.imag], 1).T
    inv = np.linalg.pinv(kernel).T * window
    fwd = kernel * window
    return {
        "stft.weight": fwd[:, None, :].astype(np.float32),
        "istft.weight": inv[:, None, :].astype(np.float32),
        "istft.window": window[None, :, None].astype(np.float32),
        "istft.enframe": np.eye(win_len, dtype=np.float32)[:, None, :],
    }


def _export_bn(out, prefix, name, params, bstats):
    """One BatchNorm2d or ComplexBatchNorm group (inverse of
    torch_import._bn_group)."""
    p = params[name]
    if "Wrr" in p:  # ComplexBatchNorm
        for n in ("Wrr", "Wri", "Wii", "Br", "Bi"):
            out[f"{prefix}.{n}"] = _np(p[n])
        st = bstats[name]["state"]
        for n in ("RMr", "RMi", "RVrr", "RVri", "RVii"):
            out[f"{prefix}.{n}"] = _np(getattr(st, n))
    else:
        out[f"{prefix}.weight"] = _np(p["weight"])
        out[f"{prefix}.bias"] = _np(p["bias"])
        bs = bstats[name]
        out[f"{prefix}.running_mean"] = _np(bs["running_mean"])
        out[f"{prefix}.running_var"] = _np(bs["running_var"])
        out[f"{prefix}.num_batches_tracked"] = np.zeros((), np.int64)


def _stage_count(params, section: str) -> int:
    return sum(1 for k in params if k.startswith(f"{section}_")
               and k.endswith("_conv"))


def export_dccrn(params, bstats, cfg: Config) -> Dict[str, np.ndarray]:
    out = {}
    for i in range(_stage_count(params, "encoder")):
        c = params[f"encoder_{i}_conv"]
        for part in ("real", "imag"):
            out[f"encoder.{i}.0.{part}_conv.weight"] = _np(c[f"{part}_weight"])
            out[f"encoder.{i}.0.{part}_conv.bias"] = _np(c[f"{part}_bias"])
        _export_bn(out, f"encoder.{i}.1", f"encoder_{i}_bn", params, bstats)
        out[f"encoder.{i}.2.weight"] = _np(params[f"encoder_{i}_prelu"]["weight"])

    if "tranform" in params:  # real-LSTM bottleneck (models.py:97-105)
        for leaf, arr in params["enhance"].items():
            out[f"enhance.{leaf}"] = _np(arr)
        out["tranform.weight"] = _np(params["tranform"]["weight"])
        out["tranform.bias"] = _np(params["tranform"]["bias"])
    else:  # complex NavieComplexLSTM stack
        li = 0
        while f"enhance_{li}" in params:
            blk = params[f"enhance_{li}"]
            for part in ("real", "imag"):
                for leaf in _LSTM_LEAVES:
                    out[f"enhance.{li}.{part}_lstm.{leaf}_l0"] = _np(
                        blk[f"{part}_{leaf}"]
                    )
            for trans in ("r_trans", "i_trans"):
                if trans in blk:
                    out[f"enhance.{li}.{trans}.weight"] = _np(
                        blk[trans]["weight"])
                    out[f"enhance.{li}.{trans}.bias"] = _np(blk[trans]["bias"])
            li += 1

    for i in range(_stage_count(params, "decoder")):
        c = params[f"decoder_{i}_conv"]
        for part in ("real", "imag"):
            out[f"decoder.{i}.0.{part}_conv.weight"] = _np(c[f"{part}_weight"])
            out[f"decoder.{i}.0.{part}_conv.bias"] = _np(c[f"{part}_bias"])
        if f"decoder_{i}_bn" in params:
            _export_bn(out, f"decoder.{i}.1", f"decoder_{i}_bn", params,
                       bstats)
            out[f"decoder.{i}.2.weight"] = _np(
                params[f"decoder_{i}_prelu"]["weight"])

    out.update(_conv_stft_buffers(cfg.stft.win_len, cfg.stft.fft_len))
    return out


def export_crn(params, bstats, cfg: Config) -> Dict[str, np.ndarray]:
    out = {}
    for i in range(_stage_count(params, "encoder")):
        c = params[f"encoder_{i}_conv"]
        out[f"encoder.{i}.0.conv.weight"] = _np(c["weight"])
        out[f"encoder.{i}.0.conv.bias"] = _np(c["bias"])
        _export_bn(out, f"encoder.{i}.1", f"encoder_{i}_bn", params, bstats)
        out[f"encoder.{i}.2.weight"] = _np(params[f"encoder_{i}_prelu"]["weight"])

    for leaf, arr in params["enhance"].items():
        out[f"enhance.{leaf}"] = _np(arr)
    out["tranform.weight"] = _np(params["tranform"]["weight"])
    out["tranform.bias"] = _np(params["tranform"]["bias"])

    for i in range(_stage_count(params, "decoder")):
        c = params[f"decoder_{i}_conv"]
        # skip_type wraps the conv in RealConvTranspose2d (``.conv``); the
        # no-skip variant is a bare nn.ConvTranspose2d (models.py:403-436)
        prefix = f"decoder.{i}.0.conv" if cfg.skip_type else f"decoder.{i}.0"
        out[f"{prefix}.weight"] = _np(c["weight"])
        out[f"{prefix}.bias"] = _np(c["bias"])
        if f"decoder_{i}_bn" in params:
            _export_bn(out, f"decoder.{i}.1", f"decoder_{i}_bn", params,
                       bstats)
            out[f"decoder.{i}.2.weight"] = _np(
                params[f"decoder_{i}_prelu"]["weight"])

    out.update(_conv_stft_buffers(cfg.stft.win_len, cfg.stft.fft_len))
    return out


def export_fullsubnet(params, bstats, cfg: Config) -> Dict[str, np.ndarray]:
    out = {}
    for branch in ("fb_model", "sb_model"):
        seq = params[branch]["sequence_model"]
        for leaf, arr in seq.items():  # weight_ih_l0 ... bias_hh_l1
            out[f"{branch}.sequence_model.{leaf}"] = _np(arr)
        fc = params[branch]["fc_output_layer"]
        out[f"{branch}.fc_output_layer.weight"] = _np(fc["weight"])
        out[f"{branch}.fc_output_layer.bias"] = _np(fc["bias"])
    return out


def export_reference_state_dict(params, batch_stats, cfg: Config):
    """{params, batch_stats} -> reference-grammar state_dict (numpy
    values; cast to torch tensors by ``save_reference_checkpoint``)."""
    exporter = {
        "DCCRN": export_dccrn,
        "CRN": export_crn,
        "FullSubNet": export_fullsubnet,
    }[cfg.model]
    return exporter(params, batch_stats, cfg)


def save_reference_checkpoint(path: str, params, batch_stats, cfg: Config,
                              epoch: int = 0) -> str:
    """Write a ``chkpt_N.pt``-shaped blob the reference's resume loads."""
    import torch

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_reference_state_dict(params, batch_stats,
                                                cfg).items()
    }
    torch.save({"model": sd, "optimizer": {}, "epoch": int(epoch)}, path)
    return path


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="Convert an orbax checkpoint (enhance.py / Trainer "
        "format) to a reference PyTorch chkpt_N.pt."
    )
    p.add_argument("--checkpoint", required=True,
                   help="orbax checkpoint directory (e.g. RUN/chkpt_30)")
    p.add_argument("--out", required=True, help="output .pt path")
    p.add_argument("--model", default="DCCRN",
                   choices=["DCCRN", "CRN", "FullSubNet"])
    p.add_argument("--lstm", default="complex", choices=["complex", "real"])
    p.add_argument("--masking-mode", default="E")
    p.add_argument("--sequence-model", default="LSTM",
                   choices=["LSTM", "GRU"])
    p.add_argument("--no-skip", action="store_true")
    p.add_argument("--use-cbn", action="store_true")
    args = p.parse_args(argv)

    from ..config import DccrnConfig
    from ..train.checkpoint import restore_checkpoint
    from ..train.state import create_train_state

    cfg = Config(
        model=args.model,
        lstm=args.lstm,
        masking_mode=args.masking_mode,
        sequence_model=args.sequence_model,
        skip_type=not args.no_skip,
        dccrn=DccrnConfig(use_cbn=args.use_cbn),
    )
    _, state = create_train_state(cfg)
    state, epoch = restore_checkpoint(args.checkpoint, state)
    path = save_reference_checkpoint(
        args.out, state.params, state.batch_stats, cfg, epoch
    )
    print(f"exported epoch {epoch} -> {path}")
    return path


if __name__ == "__main__":
    main()
