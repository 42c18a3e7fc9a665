"""Reference-checkpoint importer (se_tpu/utils/torch_import.py).

Strategy: the torch oracles in tests/oracles/ already have validated
weight exporters (their trees are golden-pinned to the JAX models by the
parity tests).  Here we rename each oracle's state_dict into the
*reference's* key grammar (models.py attribute names: encoder.{i}.0.
real_conv..., enhance.{l}.real_lstm..., fb_model.sequence_model...) and
require the importer to reproduce the exporter's tree exactly.  Variants
with no oracle (real-LSTM DCCRN, no-skip CRN, GRU FullSubNet) get
structure-checked imports built from synthetic reference-named tensors.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

from se_tpu.config import Config, DccrnConfig
from se_tpu.utils.torch_import import (
    import_reference_state_dict,
    load_reference_checkpoint,
)

from tests.oracles.torch_crn import OracleCRN
from tests.oracles.torch_crn import export_params_to_jax as export_crn
from tests.oracles.torch_dccrn import OracleDCCRN
from tests.oracles.torch_dccrn import export_params_to_jax as export_dccrn
from tests.oracles.torch_fullsubnet import OracleFullSubNet
from tests.oracles.torch_fullsubnet import export_params_to_jax as export_fsn


def _tree_equal(a, b):
    fa = jax.tree_util.tree_flatten_with_path(a)
    fb = jax.tree_util.tree_flatten_with_path(b)
    assert jax.tree_util.tree_structure(a) == jax.tree_util.tree_structure(b)
    for (pa, la), (_, lb) in zip(fa[0], fb[0]):
        np.testing.assert_array_equal(
            np.asarray(la, np.float32), np.asarray(lb, np.float32),
            err_msg=jax.tree_util.keystr(pa),
        )


def _reference_named_dccrn_sd(model: OracleDCCRN) -> dict:
    """Rename the oracle's keys into the reference's state_dict grammar."""
    sd = model.state_dict()
    out = {}
    n_stage = len(model.kernel_num) - 1
    last = len(model.rnn_r) - 1
    for k, v in sd.items():
        parts = k.split(".")
        if parts[0] in ("enc_r", "enc_i"):
            side = "real" if parts[0] == "enc_r" else "imag"
            out[f"encoder.{parts[1]}.0.{side}_conv.{parts[2]}"] = v
        elif parts[0] == "enc_bn":
            out[f"encoder.{parts[1]}.1.{parts[2]}"] = v
        elif parts[0] == "enc_act":
            out[f"encoder.{parts[1]}.2.{parts[2]}"] = v
        elif parts[0] in ("rnn_r", "rnn_i"):
            side = "real" if parts[0] == "rnn_r" else "imag"
            out[f"enhance.{parts[1]}.{side}_lstm.{parts[2]}"] = v
        elif parts[0] in ("proj_r", "proj_i"):
            side = "r" if parts[0] == "proj_r" else "i"
            out[f"enhance.{last}.{side}_trans.{parts[1]}"] = v
        elif parts[0] in ("dec_r", "dec_i"):
            side = "real" if parts[0] == "dec_r" else "imag"
            out[f"decoder.{parts[1]}.0.{side}_conv.{parts[2]}"] = v
        elif parts[0] == "dec_bn":
            out[f"decoder.{parts[1]}.1.{parts[2]}"] = v
        elif parts[0] == "dec_act":
            out[f"decoder.{parts[1]}.2.{parts[2]}"] = v
        elif parts[0] in ("fwd_kernel", "inv_kernel", "window", "enframe"):
            continue  # oracle STFT buffers; replaced below
        else:
            raise AssertionError(f"unmapped oracle key {k}")
    # the reference's own (skipped) buffers
    out["stft.weight"] = torch.zeros(514, 1, 400)
    out["istft.weight"] = torch.zeros(514, 1, 400)
    out["istft.window"] = torch.zeros(1, 400, 1)
    out["istft.enframe"] = torch.zeros(400, 1, 400)
    assert n_stage == 6
    return out


def test_dccrn_import_matches_validated_exporter():
    torch.manual_seed(0)
    model = OracleDCCRN()
    ref_sd = _reference_named_dccrn_sd(model)
    cfg = Config(model="DCCRN", lstm="complex", masking_mode="E")
    got = import_reference_state_dict(ref_sd, cfg)
    want = export_dccrn(model)
    _tree_equal(got["params"], want["params"])
    _tree_equal(got["batch_stats"], want["batch_stats"])


def _reference_named_crn_sd(model: OracleCRN) -> dict:
    sd = model.state_dict()
    out = {}
    for k, v in sd.items():
        parts = k.split(".")
        if parts[0] == "enc":
            out[f"encoder.{parts[1]}.0.conv.{parts[2]}"] = v
        elif parts[0] == "enc_bn":
            out[f"encoder.{parts[1]}.1.{parts[2]}"] = v
        elif parts[0] == "enc_act":
            out[f"encoder.{parts[1]}.2.{parts[2]}"] = v
        elif parts[0] == "lstm":
            out[f"enhance.{parts[1]}"] = v
        elif parts[0] == "proj":
            out[f"tranform.{parts[1]}"] = v
        elif parts[0] == "dec":
            out[f"decoder.{parts[1]}.0.conv.{parts[2]}"] = v
        elif parts[0] == "dec_bn":
            out[f"decoder.{parts[1]}.1.{parts[2]}"] = v
        elif parts[0] == "dec_act":
            out[f"decoder.{parts[1]}.2.{parts[2]}"] = v
        elif parts[0] in ("fwd_kernel", "inv_kernel", "window", "enframe"):
            continue
        else:
            raise AssertionError(f"unmapped oracle key {k}")
    return out


def test_crn_import_matches_validated_exporter(tmp_path):
    torch.manual_seed(1)
    model = OracleCRN()
    ref_sd = _reference_named_crn_sd(model)
    cfg = Config(model="CRN", masking_mode="E")
    got = import_reference_state_dict(ref_sd, cfg)
    want = export_crn(model)
    _tree_equal(got["params"], want["params"])
    _tree_equal(got["batch_stats"], want["batch_stats"])

    # end-to-end CLI: torch checkpoint file -> orbax checkpoint -> restore
    pt = tmp_path / "chkpt_7.pt"
    torch.save({"model": ref_sd, "optimizer": {}, "epoch": 7}, pt)
    from se_tpu.utils.torch_import import main as import_main

    out_dir = tmp_path / "imported"
    path = import_main(
        ["--checkpoint", str(pt), "--out", str(out_dir), "--model", "CRN"]
    )
    assert os.path.basename(path) == "chkpt_7"

    from se_tpu.train.checkpoint import restore_checkpoint
    from se_tpu.train.state import create_train_state

    _, state = create_train_state(cfg)
    state, epoch = restore_checkpoint(path, state)
    assert epoch == 7
    _tree_equal(state.params, want["params"])


def test_fullsubnet_import_matches_validated_exporter():
    torch.manual_seed(2)
    model = OracleFullSubNet()  # oracle attribute names == reference names
    cfg = Config(model="FullSubNet", loss="MSE")
    got = import_reference_state_dict(model.state_dict(), cfg)
    want = export_fsn(model)
    _tree_equal(got["params"], want["params"])
    assert got["batch_stats"] == {}


def test_fullsubnet_gru_variant_imports():
    torch.manual_seed(3)
    model = OracleFullSubNet(sequence_model="GRU")
    cfg = Config(model="FullSubNet", sequence_model="GRU", loss="MSE")
    got = import_reference_state_dict(model.state_dict(), cfg)
    want = export_fsn(model)
    _tree_equal(got["params"], want["params"])


def _synthetic_ref_sd_from_template(params, batch_stats, grammar):
    """Build a reference-named state_dict for a variant with no oracle by
    inverse-walking the target tree with the given key-grammar function."""
    out = {}
    for refkey, arr in grammar(params, batch_stats):
        out[refkey] = torch.from_numpy(np.asarray(arr).copy())
    return out


def test_dccrn_real_lstm_variant_imports():
    cfg = Config(model="DCCRN", lstm="real", masking_mode="E")
    from se_tpu.train.state import create_train_state

    _, state = create_train_state(cfg)

    def grammar(params, bstats):
        for i in range(6):
            c = params[f"encoder_{i}_conv"]
            yield f"encoder.{i}.0.real_conv.weight", c["real_weight"]
            yield f"encoder.{i}.0.real_conv.bias", c["real_bias"]
            yield f"encoder.{i}.0.imag_conv.weight", c["imag_weight"]
            yield f"encoder.{i}.0.imag_conv.bias", c["imag_bias"]
            bn, bs = params[f"encoder_{i}_bn"], bstats[f"encoder_{i}_bn"]
            yield f"encoder.{i}.1.weight", bn["weight"]
            yield f"encoder.{i}.1.bias", bn["bias"]
            yield f"encoder.{i}.1.running_mean", bs["running_mean"]
            yield f"encoder.{i}.1.running_var", bs["running_var"]
            yield f"encoder.{i}.2.weight", params[f"encoder_{i}_prelu"]["weight"]
        for leaf, arr in params["enhance"].items():
            yield f"enhance.{leaf}", arr
        yield "tranform.weight", params["tranform"]["weight"]
        yield "tranform.bias", params["tranform"]["bias"]
        for i in range(6):
            c = params[f"decoder_{i}_conv"]
            yield f"decoder.{i}.0.real_conv.weight", c["real_weight"]
            yield f"decoder.{i}.0.real_conv.bias", c["real_bias"]
            yield f"decoder.{i}.0.imag_conv.weight", c["imag_weight"]
            yield f"decoder.{i}.0.imag_conv.bias", c["imag_bias"]
            if i < 5:
                bn, bs = params[f"decoder_{i}_bn"], bstats[f"decoder_{i}_bn"]
                yield f"decoder.{i}.1.weight", bn["weight"]
                yield f"decoder.{i}.1.bias", bn["bias"]
                yield f"decoder.{i}.1.running_mean", bs["running_mean"]
                yield f"decoder.{i}.1.running_var", bs["running_var"]
                yield f"decoder.{i}.2.weight", params[f"decoder_{i}_prelu"]["weight"]

    ref_sd = _synthetic_ref_sd_from_template(
        state.params, state.batch_stats, grammar
    )
    got = import_reference_state_dict(ref_sd, cfg)
    _tree_equal(got["params"], state.params)
    _tree_equal(got["batch_stats"], state.batch_stats)


def test_dccrn_cbn_variant_imports():
    cfg = Config(
        model="DCCRN", lstm="complex", masking_mode="E",
        dccrn=DccrnConfig(use_cbn=True),
    )
    from se_tpu.train.state import create_train_state

    _, state = create_train_state(cfg)

    def grammar(params, bstats):
        def cbn(prefix, name):
            for n in ("Wrr", "Wri", "Wii", "Br", "Bi"):
                yield f"{prefix}.{n}", params[name][n]
            st = bstats[name]["state"]
            for n in ("RMr", "RMi", "RVrr", "RVri", "RVii"):
                yield f"{prefix}.{n}", getattr(st, n)

        for i in range(6):
            c = params[f"encoder_{i}_conv"]
            yield f"encoder.{i}.0.real_conv.weight", c["real_weight"]
            yield f"encoder.{i}.0.real_conv.bias", c["real_bias"]
            yield f"encoder.{i}.0.imag_conv.weight", c["imag_weight"]
            yield f"encoder.{i}.0.imag_conv.bias", c["imag_bias"]
            yield from cbn(f"encoder.{i}.1", f"encoder_{i}_bn")
            yield f"encoder.{i}.2.weight", params[f"encoder_{i}_prelu"]["weight"]
        for li in (0, 1):
            blk = params[f"enhance_{li}"]
            for part in ("real", "imag"):
                for ours, theirs in (
                    ("weight_ih", "weight_ih_l0"), ("weight_hh", "weight_hh_l0"),
                    ("bias_ih", "bias_ih_l0"), ("bias_hh", "bias_hh_l0"),
                ):
                    yield f"enhance.{li}.{part}_lstm.{theirs}", blk[f"{part}_{ours}"]
            for trans in ("r_trans", "i_trans"):
                if trans in blk:
                    yield f"enhance.{li}.{trans}.weight", blk[trans]["weight"]
                    yield f"enhance.{li}.{trans}.bias", blk[trans]["bias"]
        for i in range(6):
            c = params[f"decoder_{i}_conv"]
            yield f"decoder.{i}.0.real_conv.weight", c["real_weight"]
            yield f"decoder.{i}.0.real_conv.bias", c["real_bias"]
            yield f"decoder.{i}.0.imag_conv.weight", c["imag_weight"]
            yield f"decoder.{i}.0.imag_conv.bias", c["imag_bias"]
            if i < 5:
                yield from cbn(f"decoder.{i}.1", f"decoder_{i}_bn")
                yield f"decoder.{i}.2.weight", params[f"decoder_{i}_prelu"]["weight"]

    ref_sd = _synthetic_ref_sd_from_template(
        state.params, state.batch_stats, grammar
    )
    got = import_reference_state_dict(ref_sd, cfg)
    _tree_equal(got["params"], state.params)
    _tree_equal(got["batch_stats"], state.batch_stats)


def test_unrecognised_keys_raise():
    torch.manual_seed(4)
    model = OracleFullSubNet()
    sd = dict(model.state_dict())
    sd["mystery.layer.weight"] = torch.zeros(3)
    cfg = Config(model="FullSubNet", loss="MSE")
    with pytest.raises(ValueError, match="unrecognised"):
        import_reference_state_dict(sd, cfg)


def test_wrong_model_choice_raises():
    torch.manual_seed(5)
    model = OracleFullSubNet()
    cfg = Config(model="CRN")
    with pytest.raises((ValueError, KeyError)):
        import_reference_state_dict(model.state_dict(), cfg)


def test_load_reference_checkpoint_bare_state_dict(tmp_path):
    torch.manual_seed(6)
    model = OracleFullSubNet()
    pt = tmp_path / "weights.pt"
    torch.save(model.state_dict(), pt)
    cfg = Config(model="FullSubNet", loss="MSE")
    variables, epoch = load_reference_checkpoint(str(pt), cfg)
    assert epoch == 0
    _tree_equal(variables["params"], export_fsn(model)["params"])
