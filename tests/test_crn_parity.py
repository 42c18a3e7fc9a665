"""Full-model golden parity: se_tpu CRN vs a torch oracle with identical
weights (real conv U-Net, LSTM bottleneck, magnitude masking)."""

import numpy as np
import torch
import jax.numpy as jnp

from se_tpu.config import Config
from se_tpu.models import build_model
from tests.oracles.torch_crn import OracleCRN, export_params_to_jax


def test_crn_forward_parity_with_torch():
    torch.manual_seed(0)
    oracle = OracleCRN()
    oracle.eval()

    cfg = Config(model="CRN", lstm="real", masking_mode="E", loss="MSE")
    model = build_model(cfg)
    variables = export_params_to_jax(oracle)

    rng = np.random.default_rng(42)
    x = (rng.standard_normal((2, 16000)) * 0.1).astype(np.float32)

    with torch.no_grad():
        want_mags, want_wav = oracle(torch.from_numpy(x))

    got_mags, _, got_wav = model.apply(variables, jnp.asarray(x), train=False)

    np.testing.assert_allclose(
        np.asarray(got_mags), want_mags.numpy(), atol=5e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(got_wav), want_wav.numpy(), atol=5e-3
    )
    err = np.abs(np.asarray(got_wav) - want_wav.numpy()).mean()
    assert err < 2e-4, err
