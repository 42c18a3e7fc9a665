"""Full-model golden parity: se_tpu DCCRN vs the torch oracle with
identical weights.  This is the strongest end-to-end correctness check —
it exercises STFT, complex convs, BN, PReLU, complex LSTM, skip concat,
transposed convs, masking and iSTFT in one shot."""

import numpy as np
import torch
import jax.numpy as jnp

from se_tpu.config import Config
from se_tpu.models import build_model
from tests.oracles.torch_dccrn import OracleDCCRN, export_params_to_jax


def test_dccrn_forward_parity_with_torch():
    torch.manual_seed(0)
    oracle = OracleDCCRN()
    oracle.eval()

    cfg = Config(model="DCCRN", masking_mode="E", lstm="complex")
    model = build_model(cfg)
    variables = export_params_to_jax(oracle)

    rng = np.random.default_rng(42)
    x = (rng.standard_normal((2, 16000)) * 0.1).astype(np.float32)

    with torch.no_grad():
        want_r, want_i, want_wav = oracle(torch.from_numpy(x))

    got_r, got_i, got_wav = model.apply(
        variables, jnp.asarray(x), train=False
    )

    np.testing.assert_allclose(
        np.asarray(got_r), want_r.numpy(), atol=5e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(got_wav), want_wav.numpy(), atol=5e-3
    )
    # strong aggregate agreement
    err = np.abs(np.asarray(got_wav) - want_wav.numpy()).mean()
    assert err < 2e-4, err
