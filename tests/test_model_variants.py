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


def test_fullsubnet_gru_bf16_trains():
    """sequence_model=GRU under compute_dtype=bfloat16 must get the same
    mixed-precision recurrence protection as the LSTM (f32 h carry in
    rnn_ops.gru) — loss stays finite and decreases."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from se_tpu.train import create_train_state, make_train_step
    from tests.test_models import small_cfg

    rng = np.random.default_rng(3)
    cfg = small_cfg(model="FullSubNet", loss="MSE", sequence_model="GRU")
    cfg = cfg.replace(compute_dtype="bfloat16")
    model, state = create_train_state(cfg)
    L = cfg.stft.fs
    noisy = jnp.asarray((rng.standard_normal((2, L)) * 0.1).astype(np.float32))
    clean = jnp.asarray((rng.standard_normal((2, L)) * 0.1).astype(np.float32))
    step = make_train_step(cfg, model)
    losses = []
    for i in range(5):
        state, m = step(state, noisy, clean, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_forced_s2d_indivisible_raises():
    """A forced conv_s2d fold that does not divide the stage geometry
    raises a config-level ValueError, not a deep AssertionError."""
    import pytest
    from se_tpu.models.layers import _pick_s2d, _pick_s2d_transpose

    # F=250 not divisible by stride_f*r = 2*8
    with pytest.raises(ValueError, match="conv_s2d"):
        _pick_s2d(8, 2, (5, 2), (2, 1), 250)
    with pytest.raises(ValueError, match="conv_s2d"):
        _pick_s2d_transpose(8, 2, (5, 2), (2, 1), (2, 0), (1, 0), 125)
    # auto still falls back to 0 silently on the same geometry
    assert _pick_s2d(-1, 2, (5, 2), (2, 1), 250) == 0


def test_crn_bf16_compute_close_to_f32():
    """CRN bf16 compute path tracks the f32 forward and trains (bench runs
    CRN under compute_dtype=bfloat16 as the production path)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from se_tpu.train import create_train_state, make_train_step
    from se_tpu.train.steps import make_eval_step

    rng = np.random.default_rng(7)
    cfg32 = small_cfg(model="CRN", lstm="real", loss="MSE")
    cfg16 = cfg32.replace(compute_dtype="bfloat16")
    model32, state32 = create_train_state(cfg32)
    model16, state16 = create_train_state(cfg16)

    L = cfg32.stft.fs
    noisy = jnp.asarray((rng.standard_normal((2, L)) * 0.1).astype(np.float32))
    clean = jnp.asarray((rng.standard_normal((2, L)) * 0.1).astype(np.float32))

    m32, out32 = make_eval_step(cfg32, model32)(state32, noisy, clean)
    m16, out16 = make_eval_step(cfg16, model16)(state16, noisy, clean)
    assert np.asarray(out16).dtype == np.float32
    np.testing.assert_allclose(float(m16["loss"]), float(m32["loss"]), rtol=0.05)

    step = make_train_step(cfg16, model16)
    losses = []
    st = state16
    for i in range(5):
        st, m = step(st, noisy, clean, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


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


def test_fullsubnet_bf16_compute_close_to_f32():
    """FullSubNet bf16 compute path (bf16 activations, f32 norm statistics
    and RNN carries) tracks the f32 forward and trains."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from se_tpu.train import create_train_state, make_train_step
    from se_tpu.train.steps import make_eval_step
    from tests.test_models import small_cfg

    rng = np.random.default_rng(11)
    cfg32 = small_cfg(model="FullSubNet", loss="MSE")
    cfg16 = cfg32.replace(compute_dtype="bfloat16")
    model32, state32 = create_train_state(cfg32)
    _, state16 = create_train_state(cfg16)
    model16, _ = create_train_state(cfg16)

    L = cfg32.stft.fs
    noisy = jnp.asarray((rng.standard_normal((2, L)) * 0.1).astype(np.float32))
    clean = jnp.asarray((rng.standard_normal((2, L)) * 0.1).astype(np.float32))

    m32, out32 = make_eval_step(cfg32, model32)(state32, noisy, clean)
    m16, out16 = make_eval_step(cfg16, model16)(state16, noisy, clean)
    assert np.asarray(out16).dtype == np.float32  # output cast back
    np.testing.assert_allclose(
        float(m16["loss"]), float(m32["loss"]), rtol=0.05
    )

    step = make_train_step(cfg16, model16)
    losses = []
    st = state16
    for i in range(5):
        st, m = step(st, noisy, clean, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
