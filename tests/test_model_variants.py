"""Model variants not covered by the main model tests: GRU FullSubNet,
streaming norms, complex batch norm, CPReLU."""

import numpy as np
import jax
import jax.numpy as jnp

from se_tpu.config import FullSubNetConfig
from se_tpu.models import build_model
from se_tpu.models.factory import init_model
from tests.test_models import small_cfg, _run


def test_fullsubnet_gru_variant():
    cfg = small_cfg(model="FullSubNet", loss="MSE", sequence_model="GRU")
    out, _ = _run(cfg)
    assert out.shape == (2, 257, 54, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_fullsubnet_cumulative_norm_variant():
    cfg = small_cfg(model="FullSubNet", loss="MSE").replace(
        fullsubnet=FullSubNetConfig(
            fb_model_hidden_size=32,
            sb_model_hidden_size=24,
            sb_num_neighbors=3,
            norm_type="cumulative_laplace_norm",
        )
    )
    out, _ = _run(cfg)
    assert np.isfinite(np.asarray(out)).all()


def test_fullsubnet_cumulative_layer_norm_variant():
    cfg = small_cfg(model="FullSubNet", loss="MSE").replace(
        fullsubnet=FullSubNetConfig(
            fb_model_hidden_size=32,
            sb_model_hidden_size=24,
            sb_num_neighbors=3,
            norm_type="cumulative_layer_norm",
        )
    )
    out, _ = _run(cfg)
    assert np.isfinite(np.asarray(out)).all()


def test_dccrn_complex_batchnorm_variant():
    from se_tpu.config import DccrnConfig

    cfg = small_cfg(model="DCCRN").replace(
        dccrn=DccrnConfig(
            kernel_num=(8, 16, 16, 32, 32, 32), rnn_units=32, use_cbn=True
        )
    )
    (out_r, out_i, wav), variables = _run(cfg)
    assert wav.shape == (2, 16000)
    assert np.isfinite(np.asarray(wav)).all()
    # complex BN params exist
    assert "Wrr" in variables["params"]["encoder_0_bn"]


def test_dccrn_bf16_compute_close_to_f32():
    cfg32 = small_cfg(model="DCCRN")
    cfg16 = cfg32.replace(compute_dtype="bfloat16")
    model32 = build_model(cfg32)
    v = init_model(cfg32, model32, batch=2, seconds=1)
    model16 = build_model(cfg16)
    from se_tpu.models.factory import example_batch

    noisy, clean = example_batch(cfg32, batch=2, seconds=1)
    w32 = np.asarray(model32.apply(v, noisy, clean, train=False)[2])
    w16 = np.asarray(model16.apply(v, noisy, clean, train=False)[2])
    assert np.isfinite(w16).all()
    # bf16 activations: loose agreement with f32 path
    assert np.mean(np.abs(w32 - w16)) < 5e-3


def test_cprelu():
    from se_tpu.models.layers import CPReLU

    m = CPReLU()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4, 3, 3)))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == x.shape
    # positive halves unchanged
    np.testing.assert_allclose(
        np.asarray(y)[np.asarray(x) > 0], np.asarray(x)[np.asarray(x) > 0]
    )
