"""Full-model golden parity: se_tpu FullSubNet vs the torch oracle with
identical weights (reference: models.py:568-672).  Covers fullband LSTM,
reflect-pad unfold, offline laplace norms, the B*F sub-band fold, look-ahead
crop and output permute in one shot — the same proof standard as DCCRN's."""

import numpy as np
import torch
import jax.numpy as jnp

from se_tpu.config import Config
from se_tpu.models import build_model
from tests.oracles.torch_fullsubnet import OracleFullSubNet, export_params_to_jax


def test_fullsubnet_forward_parity_with_torch():
    torch.manual_seed(0)
    oracle = OracleFullSubNet()
    oracle.eval()

    cfg = Config(model="FullSubNet", loss="MSE")
    model = build_model(cfg)
    variables = export_params_to_jax(oracle)

    rng = np.random.default_rng(7)
    # positive magnitudes, speech-like dynamic range
    mag = np.abs(rng.standard_normal((2, 257, 24))).astype(np.float32)

    with torch.no_grad():
        want = oracle(torch.from_numpy(mag)).numpy()

    got = np.asarray(model.apply(variables, jnp.asarray(mag), train=False))

    assert got.shape == want.shape == (2, 257, 24, 2)
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3)
    assert np.abs(got - want).mean() < 2e-4


def test_fullsubnet_gru_variant_parity():
    """Same proof for the GRU sequence_model (reference: config.py:24)."""
    torch.manual_seed(1)
    oracle = OracleFullSubNet(
        num_freqs=257, fb_hidden=64, sb_hidden=48, sequence_model="GRU"
    )
    oracle.eval()

    cfg = Config(model="FullSubNet", loss="MSE", sequence_model="GRU")
    cfg = cfg.replace(
        fullsubnet=cfg.fullsubnet.__class__(
            fb_model_hidden_size=64, sb_model_hidden_size=48
        )
    )
    model = build_model(cfg)
    variables = export_params_to_jax(oracle)

    rng = np.random.default_rng(8)
    mag = np.abs(rng.standard_normal((1, 257, 16))).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(mag)).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(mag), train=False))
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3)
