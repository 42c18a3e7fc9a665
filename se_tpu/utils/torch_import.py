"""Import reference PyTorch checkpoints into se_tpu parameter trees.

The reference saves ``torch.save({'model': state_dict, 'optimizer': ...,
'epoch': N})`` every epoch (reference: train_interface.py:166-171,:205-210).
This module maps those state_dicts -- keyed by the reference's module
attribute names -- onto this framework's flax parameter trees, so a user
switching from the reference can bring trained weights along:

    python -m se_tpu.utils.torch_import \
        --checkpoint /path/to/chkpt_30.pt --out models/imported \
        --model DCCRN --lstm complex

writes an orbax checkpoint loadable by ``enhance.py --checkpoint`` and by
the Trainer's resume path.

Key grammar per model (reference attribute names):

DCCRN (reference: models.py:63-170)
  encoder.{i}.0.{real,imag}_conv.{weight,bias}   ComplexConv2d
                                                 (tools_for_model.py:233-235)
  encoder.{i}.1.*                                BatchNorm2d, or
                                                 ComplexBatchNorm
                                                 Wrr/Wri/Wii/Br/Bi +
                                                 RMr/RMi/RVrr/RVri/RVii
                                                 (tools_for_model.py:443-461)
  encoder.{i}.2.weight                           PReLU
  enhance.{l}.{real,imag}_lstm.{weight,bias}_{ih,hh}_l0
                                                 NavieComplexLSTM
                                                 (tools_for_model.py:147-158)
  enhance.{l}.{r,i}_trans.{weight,bias}          last-layer projection
  enhance.{weight,bias}_{ih,hh}_l{0,1} + tranform.{weight,bias}
                                                 real-LSTM variant
                                                 (models.py:97-105)
  decoder.{i}.0/.1/.2                            same pattern as encoder

CRN (reference: models.py:373-460)
  encoder.{i}.0.conv.{weight,bias}               RealConv2d
                                                 (tools_for_model.py:374)
  decoder.{i}.0.conv.{weight,bias}               RealConvTranspose2d (skip)
  decoder.{i}.0.{weight,bias}                    plain ConvTranspose2d
                                                 (no-skip, models.py:436)
  enhance.*_l0, tranform.{weight,bias}           LSTM bottleneck

FullSubNet (reference: models.py:598-616)
  {fb,sb}_model.sequence_model.{weight,bias}_{ih,hh}_l{0,1}
  {fb,sb}_model.fc_output_layer.{weight,bias}

Weights keep the torch layout (OIHW convs, [4H, in] LSTM gates, [out, in]
linears) -- that is the layout the se_tpu layers store natively, so every
tensor maps 1:1 with no transposition.

Skipped keys: the ConvSTFT/ConviSTFT basis buffers (``stft.*``/``istft.*``
-- recomputed here from the config) and BatchNorm ``num_batches_tracked``.
Any other unconsumed key is an error, as is any shape/structure mismatch
against the target model's initialised tree.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import jax
import numpy as np

from ..config import Config
from ..ops.norms import ComplexBnState

_SKIP_PREFIXES = ("stft.", "istft.")
_SKIP_SUFFIXES = (".num_batches_tracked",)

_LSTM_LEAF = {
    "weight_ih_l0": "weight_ih",
    "weight_hh_l0": "weight_hh",
    "bias_ih_l0": "bias_ih",
    "bias_hh_l0": "bias_hh",
}
_CBN_PARAMS = ("Wrr", "Wri", "Wii", "Br", "Bi")
_CBN_STATS = ("RMr", "RMi", "RVrr", "RVri", "RVii")


def _as_numpy(state_dict) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def _skippable(key: str) -> bool:
    return key.startswith(_SKIP_PREFIXES) or key.endswith(_SKIP_SUFFIXES)


def _bn_group(sd, prefix, tree_name, params, bstats, consumed):
    """Map one BatchNorm2d or ComplexBatchNorm at ``prefix`` (e.g.
    ``encoder.0.1``) onto ``params[tree_name]`` / ``bstats[tree_name]``."""
    if f"{prefix}.Wrr" in sd:  # ComplexBatchNorm
        params[tree_name] = {
            n: np.asarray(sd[f"{prefix}.{n}"]) for n in _CBN_PARAMS
        }
        bstats[tree_name] = {
            "state": ComplexBnState(
                **{n: np.asarray(sd[f"{prefix}.{n}"]) for n in _CBN_STATS}
            )
        }
        for n in _CBN_PARAMS + _CBN_STATS:
            consumed.add(f"{prefix}.{n}")
    else:  # real BatchNorm2d
        params[tree_name] = {
            "weight": sd[f"{prefix}.weight"],
            "bias": sd[f"{prefix}.bias"],
        }
        bstats[tree_name] = {
            "running_mean": sd[f"{prefix}.running_mean"],
            "running_var": sd[f"{prefix}.running_var"],
        }
        for n in ("weight", "bias", "running_mean", "running_var"):
            consumed.add(f"{prefix}.{n}")


def _lstm_group(sd, prefix, consumed, num_layers=1):
    """Collect a torch nn.LSTM/GRU's flat ``*_l{n}`` keys under ``prefix``."""
    blk = {}
    for layer in range(num_layers):
        for leaf in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            key = f"{prefix}.{leaf}_l{layer}"
            blk[f"{leaf}_l{layer}"] = sd[key]
            consumed.add(key)
    return blk


def _linear_group(sd, prefix, consumed):
    consumed.add(f"{prefix}.weight")
    consumed.add(f"{prefix}.bias")
    return {"weight": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _stage_indices(sd, section) -> list:
    idx = sorted(
        {
            int(m.group(1))
            for k in sd
            for m in [re.match(rf"{section}\.(\d+)\.", k)]
            if m
        }
    )
    if not idx or idx != list(range(len(idx))):
        raise ValueError(
            f"state_dict has no contiguous '{section}.N.' groups: {idx}"
        )
    return idx


def import_dccrn(sd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    params, bstats, consumed = {}, {}, set()

    for i in _stage_indices(sd, "encoder"):
        params[f"encoder_{i}_conv"] = {
            "real_weight": sd[f"encoder.{i}.0.real_conv.weight"],
            "real_bias": sd[f"encoder.{i}.0.real_conv.bias"],
            "imag_weight": sd[f"encoder.{i}.0.imag_conv.weight"],
            "imag_bias": sd[f"encoder.{i}.0.imag_conv.bias"],
        }
        consumed |= {
            f"encoder.{i}.0.{p}_conv.{l}"
            for p in ("real", "imag")
            for l in ("weight", "bias")
        }
        _bn_group(sd, f"encoder.{i}.1", f"encoder_{i}_bn", params, bstats,
                  consumed)
        params[f"encoder_{i}_prelu"] = {"weight": sd[f"encoder.{i}.2.weight"]}
        consumed.add(f"encoder.{i}.2.weight")

    if "tranform.weight" in sd:  # real-LSTM bottleneck (models.py:97-105)
        params["enhance"] = _lstm_group(sd, "enhance", consumed, num_layers=2)
        params["tranform"] = _linear_group(sd, "tranform", consumed)
    else:  # complex NavieComplexLSTM stack
        layers = sorted(
            {
                int(m.group(1))
                for k in sd
                for m in [re.match(r"enhance\.(\d+)\.", k)]
                if m
            }
        )
        for li in layers:
            blk = {}
            for part in ("real", "imag"):
                for tk, ours in _LSTM_LEAF.items():
                    key = f"enhance.{li}.{part}_lstm.{tk}"
                    blk[f"{part}_{ours}"] = sd[key]
                    consumed.add(key)
            for trans in ("r_trans", "i_trans"):
                if f"enhance.{li}.{trans}.weight" in sd:
                    blk[trans] = _linear_group(
                        sd, f"enhance.{li}.{trans}", consumed
                    )
            params[f"enhance_{li}"] = blk

    for i in _stage_indices(sd, "decoder"):
        params[f"decoder_{i}_conv"] = {
            "real_weight": sd[f"decoder.{i}.0.real_conv.weight"],
            "real_bias": sd[f"decoder.{i}.0.real_conv.bias"],
            "imag_weight": sd[f"decoder.{i}.0.imag_conv.weight"],
            "imag_bias": sd[f"decoder.{i}.0.imag_conv.bias"],
        }
        consumed |= {
            f"decoder.{i}.0.{p}_conv.{l}"
            for p in ("real", "imag")
            for l in ("weight", "bias")
        }
        if f"decoder.{i}.1.weight" in sd or f"decoder.{i}.1.Wrr" in sd:
            _bn_group(sd, f"decoder.{i}.1", f"decoder_{i}_bn", params,
                      bstats, consumed)
            params[f"decoder_{i}_prelu"] = {
                "weight": sd[f"decoder.{i}.2.weight"]
            }
            consumed.add(f"decoder.{i}.2.weight")

    _check_consumed(sd, consumed)
    return params, bstats


def import_crn(sd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    params, bstats, consumed = {}, {}, set()

    for i in _stage_indices(sd, "encoder"):
        params[f"encoder_{i}_conv"] = _linear_group(
            sd, f"encoder.{i}.0.conv", consumed
        )
        _bn_group(sd, f"encoder.{i}.1", f"encoder_{i}_bn", params, bstats,
                  consumed)
        params[f"encoder_{i}_prelu"] = {"weight": sd[f"encoder.{i}.2.weight"]}
        consumed.add(f"encoder.{i}.2.weight")

    params["enhance"] = _lstm_group(sd, "enhance", consumed, num_layers=1)
    params["tranform"] = _linear_group(sd, "tranform", consumed)

    for i in _stage_indices(sd, "decoder"):
        # skip_type decoders wrap the conv in RealConvTranspose2d
        # (``.conv``); the no-skip variant uses a bare nn.ConvTranspose2d
        # (reference: models.py:403-436).
        prefix = (
            f"decoder.{i}.0.conv"
            if f"decoder.{i}.0.conv.weight" in sd
            else f"decoder.{i}.0"
        )
        params[f"decoder_{i}_conv"] = _linear_group(sd, prefix, consumed)
        if f"decoder.{i}.1.weight" in sd:
            _bn_group(sd, f"decoder.{i}.1", f"decoder_{i}_bn", params,
                      bstats, consumed)
            params[f"decoder_{i}_prelu"] = {
                "weight": sd[f"decoder.{i}.2.weight"]
            }
            consumed.add(f"decoder.{i}.2.weight")

    _check_consumed(sd, consumed)
    return params, bstats


def import_fullsubnet(sd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    params, consumed = {}, set()
    for branch in ("fb_model", "sb_model"):
        params[branch] = {
            "sequence_model": _lstm_group(
                sd, f"{branch}.sequence_model", consumed, num_layers=2
            ),
            "fc_output_layer": _linear_group(
                sd, f"{branch}.fc_output_layer", consumed
            ),
        }
    _check_consumed(sd, consumed)
    return params, {}


def _check_consumed(sd, consumed):
    leftover = [k for k in sd if k not in consumed and not _skippable(k)]
    if leftover:
        raise ValueError(
            "unrecognised reference state_dict keys (wrong --model/variant?): "
            + ", ".join(sorted(leftover)[:10])
            + (" ..." if len(leftover) > 10 else "")
        )


def _tree_paths(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): np.shape(leaf) for path, leaf in flat}


def import_reference_state_dict(state_dict, cfg: Config) -> dict:
    """Map a reference state_dict onto {'params', 'batch_stats'} for
    ``build_model(cfg)``, verifying structure and shapes against the
    model's own initialised tree."""
    sd = _as_numpy(state_dict)
    importer = {
        "DCCRN": import_dccrn,
        "CRN": import_crn,
        "FullSubNet": import_fullsubnet,
    }[cfg.model]
    params, bstats = importer(sd)

    from ..train.state import create_train_state

    _, template = create_train_state(cfg)
    for name, imported, target in (
        ("params", params, template.params),
        ("batch_stats", bstats, template.batch_stats),
    ):
        got, want = _tree_paths(imported), _tree_paths(target)
        if got != want:
            missing = sorted(set(want) - set(got))[:5]
            extra = sorted(set(got) - set(want))[:5]
            shapes = sorted(
                k for k in set(got) & set(want) if got[k] != want[k]
            )[:5]
            raise ValueError(
                f"imported {name} tree does not match cfg.model={cfg.model} "
                f"(lstm={cfg.lstm}, skip_type={cfg.skip_type}): "
                f"missing={missing} extra={extra} shape-mismatch={shapes}"
            )

    cast = lambda t: jax.tree.map(lambda a: np.asarray(a, np.float32), t)
    return {"params": cast(params), "batch_stats": cast(bstats)}


def load_reference_checkpoint(path: str, cfg: Config) -> Tuple[dict, int]:
    """torch.load a reference ``chkpt_N.pt`` (or a bare state_dict file)
    and import it. Returns (variables, epoch)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    epoch = 0
    if isinstance(blob, dict) and "model" in blob:
        epoch = int(blob.get("epoch", 0))
        blob = blob["model"]
    return import_reference_state_dict(blob, cfg), epoch


def main(argv=None):
    import argparse
    import os

    p = argparse.ArgumentParser(
        description="Convert a reference PyTorch checkpoint to an orbax "
        "checkpoint usable with enhance.py / Trainer resume."
    )
    p.add_argument("--checkpoint", required=True, help="reference chkpt_N.pt")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--model", default="DCCRN",
                   choices=["DCCRN", "CRN", "FullSubNet"])
    p.add_argument("--lstm", default="complex", choices=["complex", "real"])
    p.add_argument("--masking-mode", default="E")
    p.add_argument("--sequence-model", default="LSTM",
                   choices=["LSTM", "GRU"])
    p.add_argument("--no-skip", action="store_true",
                   help="model was trained with cfg.skip_type=False")
    p.add_argument("--use-cbn", action="store_true",
                   help="model was trained with complex batch norm")
    args = p.parse_args(argv)

    from ..config import DccrnConfig
    from ..train.checkpoint import save_checkpoint

    cfg = Config(
        model=args.model,
        lstm=args.lstm,
        masking_mode=args.masking_mode,
        sequence_model=args.sequence_model,
        skip_type=not args.no_skip,
        dccrn=DccrnConfig(use_cbn=args.use_cbn),
    )
    variables, epoch = load_reference_checkpoint(args.checkpoint, cfg)

    from ..train.state import create_train_state

    _, state = create_train_state(cfg)
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    os.makedirs(args.out, exist_ok=True)
    path = save_checkpoint(args.out, state, epoch)
    print(f"imported epoch {epoch} -> {path}")
    return path


if __name__ == "__main__":
    main()
