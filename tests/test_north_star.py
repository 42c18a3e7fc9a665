"""North-star gate as a regression test (tools/north_star.py at reduced
scale): torch-oracle weights -> reference-format chkpt .pt ->
torch_import -> both frameworks enhance the same utterances -> native
PESQ/STOI per-file deltas within +/-0.01.

The full-size 21-utterance receipt lives in docs/NORTH_STAR.md (run by
``python tools/north_star.py``); this test keeps the whole chain
exercised per-commit with narrow models and 4 utterances per model.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

from se_tpu.config import Config, DccrnConfig, FullSubNetConfig

from tools.north_star import GATE, run_model


def _deltas(rows):
    dp = max(abs(r["pesq_jax"] - r["pesq_torch"]) for r in rows)
    ds = max(abs(r["stoi_jax"] - r["stoi_torch"]) for r in rows)
    return dp, ds


@pytest.mark.parametrize(
    "model_name,cfg",
    [
        (
            "DCCRN",
            Config(
                model="DCCRN", loss="SDR",
                dccrn=DccrnConfig(
                    kernel_num=(8, 16, 16, 32, 32, 32), rnn_units=32
                ),
            ),
        ),
        ("CRN", Config(model="CRN", lstm="real", loss="MSE")),
        (
            "FullSubNet",
            Config(
                model="FullSubNet", loss="MSE",
                fullsubnet=FullSubNetConfig(
                    fb_model_hidden_size=32, sb_model_hidden_size=24,
                    sb_num_neighbors=3,
                ),
            ),
        ),
    ],
)
def test_north_star_parity(model_name, cfg, tmp_path):
    rows = run_model(
        model_name, cfg, n_utts=4, train_steps=2, workdir=str(tmp_path)
    )
    assert len(rows) == 4
    # scores must be live, not degenerate
    assert all(np.isfinite(r["pesq_jax"]) for r in rows)
    dp, ds = _deltas(rows)
    assert dp <= GATE, f"|dPESQ| {dp} exceeds the +/-{GATE} north-star gate"
    assert ds <= GATE, f"|dSTOI| {ds} exceeds the +/-{GATE} north-star gate"
