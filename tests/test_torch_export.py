"""Checkpoint exporter (se_tpu/utils/torch_export.py): the inverse of the
importer.  Round-trip invariant export -> import == identity for every
model/variant; grammar grounded against the validated oracle renamers in
test_torch_import.py; CLI end-to-end orbax -> chkpt_N.pt -> import."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

from se_tpu.config import Config, DccrnConfig
from se_tpu.train.state import create_train_state
from se_tpu.utils.torch_export import (
    export_reference_state_dict,
    save_reference_checkpoint,
)
from se_tpu.utils.torch_import import import_reference_state_dict

from tests.test_torch_import import (
    _reference_named_dccrn_sd,
    _tree_equal,
)
from tests.oracles.torch_dccrn import OracleDCCRN
from tests.oracles.torch_fullsubnet import OracleFullSubNet


VARIANTS = {
    "dccrn-complex": Config(model="DCCRN", lstm="complex", masking_mode="E"),
    "dccrn-real": Config(model="DCCRN", lstm="real", masking_mode="E"),
    "dccrn-noskip": Config(
        model="DCCRN", lstm="complex", masking_mode="E", skip_type=False
    ),
    "dccrn-cbn": Config(
        model="DCCRN", lstm="complex", masking_mode="E",
        dccrn=DccrnConfig(use_cbn=True),
    ),
    "crn": Config(model="CRN", masking_mode="E"),
    "crn-noskip": Config(model="CRN", masking_mode="E", skip_type=False),
    "fsn-lstm": Config(model="FullSubNet", loss="MSE"),
    "fsn-gru": Config(model="FullSubNet", loss="MSE", sequence_model="GRU"),
}


@pytest.mark.parametrize("cfg", VARIANTS.values(), ids=VARIANTS.keys())
def test_export_import_roundtrip(cfg):
    _, state = create_train_state(cfg)
    sd = export_reference_state_dict(state.params, state.batch_stats, cfg)
    got = import_reference_state_dict(sd, cfg)
    _tree_equal(got["params"], state.params)
    _tree_equal(got["batch_stats"], state.batch_stats)


def test_export_matches_validated_oracle_grammar():
    """Import the oracle's reference-named state_dict, export it back, and
    require key-for-key, value-for-value agreement with the original (the
    renamer _reference_named_dccrn_sd is the grammar the importer tests
    validated).  The STFT buffers the renamer zeroes are instead checked
    against the oracle's own registered basis kernels."""
    torch.manual_seed(0)
    model = OracleDCCRN()
    ref_sd = _reference_named_dccrn_sd(model)
    cfg = Config(model="DCCRN", lstm="complex", masking_mode="E")
    tree = import_reference_state_dict(ref_sd, cfg)
    out = export_reference_state_dict(
        tree["params"], tree["batch_stats"], cfg
    )

    stft_keys = {"stft.weight", "istft.weight", "istft.window",
                 "istft.enframe"}
    # exporter adds num_batches_tracked (torch BN bookkeeping the renamer
    # does not carry); everything else must match the oracle exactly
    extra = {k for k in out if k not in ref_sd}
    assert all(k.endswith("num_batches_tracked") for k in extra), extra
    missing = {k for k in ref_sd if k not in out}
    assert not missing, missing
    for k, v in ref_sd.items():
        if k in stft_keys:
            continue
        np.testing.assert_array_equal(
            out[k], np.asarray(v), err_msg=k
        )
    # reference basis buffers regenerate exactly (same construction)
    np.testing.assert_allclose(
        out["stft.weight"], model.fwd_kernel.numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        out["istft.weight"], model.inv_kernel.numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        out["istft.window"], model.window.numpy(), atol=0
    )
    np.testing.assert_array_equal(out["istft.enframe"],
                                  model.enframe.numpy())


def test_export_fullsubnet_matches_oracle_state_dict():
    """FullSubNet's oracle uses the reference's own attribute names, so
    import(oracle.state_dict()) -> export must reproduce it verbatim."""
    torch.manual_seed(1)
    model = OracleFullSubNet()
    cfg = Config(model="FullSubNet", loss="MSE")
    tree = import_reference_state_dict(model.state_dict(), cfg)
    out = export_reference_state_dict(tree["params"], {}, cfg)
    want = {k: v.numpy() for k, v in model.state_dict().items()}
    assert set(out) == set(want)
    for k in want:
        np.testing.assert_array_equal(out[k], want[k], err_msg=k)


def test_export_cli_end_to_end(tmp_path):
    """orbax checkpoint -> torch_export CLI -> chkpt_N.pt readable by both
    torch.load and the importer."""
    from se_tpu.train.checkpoint import save_checkpoint
    from se_tpu.utils.torch_export import main as export_main

    cfg = Config(model="CRN", masking_mode="E")
    _, state = create_train_state(cfg)
    ck = save_checkpoint(str(tmp_path), state, epoch=3)

    out_pt = tmp_path / "chkpt_3.pt"
    export_main([
        "--checkpoint", str(ck), "--out", str(out_pt), "--model", "CRN",
    ])
    blob = torch.load(out_pt, map_location="cpu", weights_only=False)
    assert blob["epoch"] == 3
    got = import_reference_state_dict(blob["model"], cfg)
    _tree_equal(got["params"], state.params)
    _tree_equal(got["batch_stats"], state.batch_stats)
