"""Parity tests for the ops layer against torch oracles."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F
import jax.numpy as jnp

from se_tpu.ops import (
    conv2d,
    conv_transpose2d,
    LstmParams,
    lstm,
    lstm_stack,
    gru,
    batch_norm_2d,
    offline_laplace_norm,
    cumulative_laplace_norm,
    offline_gaussian_norm,
    cumulative_layer_norm,
    forgetting_norm,
    unfold,
    build_complex_ideal_ratio_mask,
    compress_cIRM,
    decompress_cIRM,
    prelu,
)

ATOL = 2e-5


def test_conv2d_parity(rng):
    x = rng.standard_normal((2, 4, 16, 20)).astype(np.float32)
    w = rng.standard_normal((8, 4, 5, 2)).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    want = F.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=(2, 1), padding=(2, 0),
    ).numpy()
    got = np.asarray(conv2d(x, w, b, stride=(2, 1), padding=(2, 0)))
    np.testing.assert_allclose(got, want, atol=ATOL)


@pytest.mark.parametrize("output_padding", [(0, 0), (1, 0)])
def test_conv_transpose2d_parity(rng, output_padding):
    x = rng.standard_normal((2, 8, 8, 10)).astype(np.float32)
    w = rng.standard_normal((8, 4, 5, 2)).astype(np.float32)
    b = rng.standard_normal(4).astype(np.float32)
    want = F.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=(2, 1), padding=(2, 0), output_padding=output_padding,
    ).numpy()
    got = np.asarray(
        conv_transpose2d(
            x, w, b, stride=(2, 1), padding=(2, 0),
            output_padding=output_padding,
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=ATOL)


def _torch_lstm_params(m: nn.LSTM) -> LstmParams:
    return LstmParams(
        w_ih=jnp.asarray(m.weight_ih_l0.detach().numpy()),
        w_hh=jnp.asarray(m.weight_hh_l0.detach().numpy()),
        b_ih=jnp.asarray(m.bias_ih_l0.detach().numpy()),
        b_hh=jnp.asarray(m.bias_hh_l0.detach().numpy()),
    )


def test_lstm_parity(rng):
    torch.manual_seed(0)
    m = nn.LSTM(12, 16, num_layers=1, batch_first=False)
    x = rng.standard_normal((7, 3, 12)).astype(np.float32)
    want, _ = m(torch.from_numpy(x))
    got, _ = lstm(_torch_lstm_params(m), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), atol=1e-5)


def test_lstm_stack_matches_independent(rng):
    torch.manual_seed(1)
    m1, m2 = nn.LSTM(10, 8), nn.LSTM(10, 8)
    p1, p2 = _torch_lstm_params(m1), _torch_lstm_params(m2)
    stacked = LstmParams(*[jnp.stack([a, b]) for a, b in zip(p1, p2)])
    x = rng.standard_normal((5, 2, 10)).astype(np.float32)
    ys = lstm_stack(stacked, jnp.asarray(x))  # [2, T, B, H]
    y1, _ = lstm(p1, jnp.asarray(x))
    y2, _ = lstm(p2, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ys[0]), np.asarray(y1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ys[1]), np.asarray(y2), atol=1e-6)


def test_gru_parity(rng):
    torch.manual_seed(2)
    m = nn.GRU(12, 16, num_layers=1)
    x = rng.standard_normal((7, 3, 12)).astype(np.float32)
    want, _ = m(torch.from_numpy(x))
    p = LstmParams(
        w_ih=jnp.asarray(m.weight_ih_l0.detach().numpy()),
        w_hh=jnp.asarray(m.weight_hh_l0.detach().numpy()),
        b_ih=jnp.asarray(m.bias_ih_l0.detach().numpy()),
        b_hh=jnp.asarray(m.bias_hh_l0.detach().numpy()),
    )
    got, _ = gru(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), atol=1e-5)


def test_batch_norm_parity_train_and_eval(rng):
    torch.manual_seed(3)
    m = nn.BatchNorm2d(6)
    x1 = rng.standard_normal((4, 6, 5, 7)).astype(np.float32)
    x2 = rng.standard_normal((4, 6, 5, 7)).astype(np.float32)

    scale = jnp.asarray(m.weight.detach().numpy())
    bias = jnp.asarray(m.bias.detach().numpy())
    # .copy(): torch updates these buffers in place and jnp.asarray may
    # zero-copy alias host memory
    rm = jnp.asarray(m.running_mean.numpy().copy())
    rv = jnp.asarray(m.running_var.numpy().copy())

    m.train()
    want1 = m(torch.from_numpy(x1)).detach().numpy()
    got1, rm, rv = batch_norm_2d(x1, scale, bias, rm, rv, train=True)
    np.testing.assert_allclose(np.asarray(got1), want1, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rm), m.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(rv), m.running_var.numpy(), atol=1e-5)

    m.eval()
    want2 = m(torch.from_numpy(x2)).detach().numpy()
    got2, _, _ = batch_norm_2d(x2, scale, bias, rm, rv, train=False)
    np.testing.assert_allclose(np.asarray(got2), want2, atol=1e-5)


def test_fullsubnet_norms_parity(rng):
    x = np.abs(rng.standard_normal((2, 1, 9, 11))).astype(np.float32)
    xt = torch.from_numpy(x)

    # offline laplace (reference: tools_for_model.py:997-1011)
    want = (xt / (torch.mean(xt, dim=(1, 2, 3), keepdim=True) + 1e-5)).numpy()
    np.testing.assert_allclose(np.asarray(offline_laplace_norm(x)), want, atol=ATOL)

    # offline gaussian with unbiased torch.std
    mu = torch.mean(xt, dim=(1, 2, 3), keepdim=True)
    std = torch.std(xt, dim=(1, 2, 3), keepdim=True)
    want = ((xt - mu) / (std + 1e-5)).numpy()
    np.testing.assert_allclose(np.asarray(offline_gaussian_norm(x)), want, atol=ATOL)

    # cumulative laplace
    B, C, Fq, T = x.shape
    xr = xt.reshape(B * C, Fq, T)
    cum = torch.cumsum(torch.sum(xr, dim=1), dim=-1)
    cnt = torch.arange(Fq, Fq * T + 1, Fq, dtype=xt.dtype).reshape(1, T)
    cmean = (cum / cnt).reshape(B * C, 1, T)
    want = (xr / (cmean + np.finfo(np.float32).eps)).reshape(B, C, Fq, T).numpy()
    np.testing.assert_allclose(
        np.asarray(cumulative_laplace_norm(x)), want, atol=ATOL
    )

    # cumulative layer norm
    spow = torch.cumsum(torch.sum(xr**2, dim=1), dim=-1)
    cmean_ = cum / cnt
    cvar = (spow - 2 * cmean_ * cum) / cnt + cmean_**2
    cstd = torch.sqrt(cvar + np.finfo(np.float32).eps)
    want = ((xr - cmean_.reshape(-1, 1, T)) / cstd.reshape(-1, 1, T)).reshape(
        B, C, Fq, T
    ).numpy()
    np.testing.assert_allclose(
        np.asarray(cumulative_layer_norm(x)), want, atol=1e-4
    )


def test_forgetting_norm_matches_loop_reference(rng):
    """Oracle: re-run the reference's sequential EMA loop in numpy."""
    x = np.abs(rng.standard_normal((2, 8, 12))).astype(np.float32)
    L = 5
    alpha = (L - 1) / (L + 1)
    mu = np.zeros((2,))
    mus = []
    for idx in range(x.shape[-1]):
        if idx < L:
            alp = min((idx - 1) / (idx + 1), alpha)
            mu = alp * mu + (1 - alp) * x[:, :, idx].mean(axis=1)
        else:
            mu = alpha * mu + (1 - alpha) * x[:, :, idx].mean(axis=1)
        mus.append(mu.copy())
    mu = np.stack(mus, -1)[:, None, :]
    want = x / (mu + 1e-10)
    got = np.asarray(forgetting_norm(x, L))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_unfold_parity(rng):
    x = rng.standard_normal((2, 1, 17, 6)).astype(np.float32)
    n = 3
    # oracle: reference unfold semantics via torch F.unfold
    xt = torch.from_numpy(x)
    B, C, Fq, T = xt.shape
    o = xt.reshape(B * C, 1, Fq, T)
    o = F.pad(o, [0, 0, n, n], mode="reflect")
    o = F.unfold(o, (2 * n + 1, T))
    o = o.reshape(B, C, 2 * n + 1, T, Fq).permute(0, 4, 1, 2, 3)
    want = o.numpy()
    got = np.asarray(unfold(x, n))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_unfold_zero_neighbors(rng):
    x = rng.standard_normal((2, 1, 5, 4)).astype(np.float32)
    got = np.asarray(unfold(x, 0))
    assert got.shape == (2, 5, 1, 1, 4)
    np.testing.assert_allclose(got[:, :, 0, 0, :], x[:, 0], atol=0)


def test_cirm_roundtrip(rng):
    noisy = (
        rng.standard_normal((2, 9, 7)) + 1j * rng.standard_normal((2, 9, 7))
    ).astype(np.complex64)
    clean = (
        rng.standard_normal((2, 9, 7)) + 1j * rng.standard_normal((2, 9, 7))
    ).astype(np.complex64)
    cirm = np.asarray(build_complex_ideal_ratio_mask(noisy, clean))
    assert cirm.shape == (2, 9, 7, 2)
    assert np.all(np.abs(cirm) <= 10)
    # compress/decompress inverse on the valid range
    m = rng.uniform(-5, 5, (4, 4)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(decompress_cIRM(compress_cIRM(m))), m, atol=1e-4
    )


def test_prelu_parity(rng):
    x = rng.standard_normal((3, 4)).astype(np.float32)
    m = nn.PReLU()
    want = m(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(prelu(x, jnp.asarray(m.weight.detach().numpy())))
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_complex_mag_forward_identical_and_nan_free_gradient():
    """complex_mag: bit-identical forward to sqrt(r^2+i^2); finite (zero)
    gradient at all-zero bins where the naive expression NaNs — the
    failure mode of long bf16 training runs."""
    import jax
    from se_tpu.ops import complex_mag

    r = jnp.asarray([3.0, 0.0, 1e-20, -4.0, 0.5])
    i = jnp.asarray([4.0, 0.0, 0.0, 3.0, -0.5])
    naive = (r**2 + i**2) ** 0.5
    np.testing.assert_array_equal(np.asarray(complex_mag(r, i)), np.asarray(naive))

    g = jax.grad(lambda a, b: jnp.sum(complex_mag(a, b)))(r, i)
    assert np.isfinite(np.asarray(g)).all()
    gn = jax.grad(lambda a, b: jnp.sum((a**2 + b**2) ** 0.5))(r, i)
    assert not np.isfinite(np.asarray(gn)).all()  # the hazard being fixed


def test_safe_arctan2_forward_identical_and_nan_free_gradient():
    """safe_arctan2: bit-identical forward; finite gradient at (0, 0)
    where jnp.arctan2's gradient is 0/0 — the op that NaN'd long bf16
    DCCRN E-mask training (all-zero mask bins)."""
    import jax
    from se_tpu.ops import safe_arctan2

    y = jnp.asarray([0.0, 1.0, -1.0, 0.0, -0.0])
    x = jnp.asarray([0.0, 1.0, 0.5, -2.0, -0.0])
    np.testing.assert_array_equal(
        np.asarray(safe_arctan2(y, x)), np.asarray(jnp.arctan2(y, x))
    )
    g = jax.grad(lambda a, b: jnp.sum(safe_arctan2(a, b)), argnums=(0, 1))(y, x)
    assert np.isfinite(np.asarray(g)).all()


def test_conv2d_freq_s2d_exact_parity():
    """Space-to-depth freq conv == direct conv (values and gradients) for
    every DCCRN/CRN stage geometry and fold."""
    import jax
    import jax.numpy as jnp
    from se_tpu.ops.conv import conv2d, conv2d_freq_s2d

    rng = np.random.default_rng(0)
    for (C, O, F, r) in [(2, 32, 256, 8), (1, 16, 256, 16), (32, 64, 128, 2),
                         (2, 32, 256, 4), (64, 128, 64, 2)]:
        x = jnp.asarray(rng.standard_normal((2, C, F, 9)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((O, C, 5, 2)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.standard_normal((O,)), jnp.float32)
        ref = conv2d(x, w, b, stride=(2, 1), padding=(2, 0))
        got = conv2d_freq_s2d(x, w, b, r=r, stride=(2, 1), padding=(2, 0))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4), (C, O, F, r)

    def la(x, w):
        return jnp.sum(conv2d(x, w, None, stride=(2, 1), padding=(2, 0)) ** 2)

    def lb(x, w):
        return jnp.sum(
            conv2d_freq_s2d(x, w, None, r=4, stride=(2, 1), padding=(2, 0))
            ** 2
        )

    x = jnp.asarray(rng.standard_normal((2, 2, 64, 7)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((8, 2, 5, 2)) * 0.1, jnp.float32)
    ga, gb = jax.grad(la, (0, 1))(x, w), jax.grad(lb, (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(ga[0]), np.asarray(gb[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga[1]), np.asarray(gb[1]), atol=1e-3)


def test_conv_transpose2d_freq_s2d_exact_parity():
    """Adjoint-form transpose s2d == direct transpose conv, incl. the
    output_padding used by the DCCRN/CRN decoders."""
    import jax
    import jax.numpy as jnp
    from se_tpu.ops.conv import conv_transpose2d, conv_transpose2d_freq_s2d

    rng = np.random.default_rng(1)
    for (I, O, Fin, r) in [(64, 2, 128, 8), (64, 1, 128, 16),
                           (32, 16, 64, 4), (64, 32, 32, 2)]:
        x = jnp.asarray(rng.standard_normal((2, I, Fin, 8)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((I, O, 5, 2)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.standard_normal((O,)), jnp.float32)
        ref = conv_transpose2d(x, w, b, stride=(2, 1), padding=(2, 0),
                               output_padding=(1, 0))
        got = conv_transpose2d_freq_s2d(x, w, b, r=r)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4), (I, O, Fin, r)

    def la(x, w):
        return jnp.sum(conv_transpose2d(
            x, w, None, stride=(2, 1), padding=(2, 0),
            output_padding=(1, 0)) ** 2)

    def lb(x, w):
        return jnp.sum(conv_transpose2d_freq_s2d(x, w, None, r=4) ** 2)

    x = jnp.asarray(rng.standard_normal((2, 8, 16, 6)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((8, 4, 5, 2)) * 0.1, jnp.float32)
    ga, gb = jax.grad(la, (0, 1))(x, w), jax.grad(lb, (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(ga[0]), np.asarray(gb[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga[1]), np.asarray(gb[1]), atol=1e-3)


def test_auto_s2d_r_selection():
    from se_tpu.ops.conv import auto_s2d_r

    assert auto_s2d_r(2, 5, 2, 256) == 8     # DCCRN stage 0 (block form)
    assert auto_s2d_r(1, 5, 2, 256) == 16    # CRN stage 0
    assert auto_s2d_r(32, 5, 2, 128) == 0    # deep enough directly
    assert auto_s2d_r(128, 5, 2, 16) == 0
    assert auto_s2d_r(2, 5, 2, 250) == 0     # indivisible F


def test_lstm_stack_mixed_precision_close_to_f32():
    """bf16-stream/f32-carry cell tracks the f32 recurrence closely and
    keeps an f32 final state."""
    import jax
    import jax.numpy as jnp
    from se_tpu.ops import rnn as rnn_ops

    rng = np.random.default_rng(2)
    T, B, In, H = 80, 3, 32, 16
    x = jnp.asarray(rng.standard_normal((T, B, In)) * 0.5, jnp.float32)
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    p = rnn_ops.LstmParams(*[
        jnp.stack([a, b]) for a, b in zip(
            rnn_ops.init_lstm_params(ks[0], In, H),
            rnn_ops.init_lstm_params(ks[1], In, H),
        )
    ])
    y32 = rnn_ops.lstm_stack(p, x)
    y16, (h, c) = rnn_ops.lstm_stack(p, x, mixed_precision=True,
                                     return_state=True)
    assert y16.dtype == jnp.bfloat16
    assert h.dtype == c.dtype == jnp.float32
    err = float(jnp.max(jnp.abs(y32 - y16.astype(jnp.float32))))
    assert err < 0.05, err


def test_gru_bf16_mixed_precision_close_to_f32():
    """bf16 GRU inputs get bf16-stream/f32-carry semantics (same policy
    as the LSTM: a fully-bf16 recurrent carry compounds roundoff over
    hundreds of steps) and keep an f32 final state."""
    import jax
    import jax.numpy as jnp
    from se_tpu.ops import rnn as rnn_ops

    rng = np.random.default_rng(5)
    T, B, In, H = 200, 3, 32, 16
    x = jnp.asarray(rng.standard_normal((T, B, In)) * 0.5, jnp.float32)
    p = rnn_ops.init_gru_params(jax.random.PRNGKey(1), In, H)
    y32, h32 = rnn_ops.gru(p, x)
    y16, h16 = rnn_ops.gru(p, x.astype(jnp.bfloat16))
    assert y16.dtype == jnp.bfloat16
    assert h16.dtype == jnp.float32
    err = float(jnp.max(jnp.abs(y32 - y16.astype(jnp.float32))))
    assert err < 0.05, err


@pytest.mark.parametrize("transpose", [False, True])
def test_complex_conv_bias_semantics_block_vs_dbatch(rng, transpose):
    """The block-kernel complex conv must carry the reference's bias
    wiring — real_out += br - bi, imag_out += br + bi (both component
    convs, each with its own bias, run on both inputs:
    tools_for_model.py:251-266).  Pinned against the doubled-batch
    variant, which applies each conv (bias included) separately, with
    RANDOM nonzero biases — zero-init biases hid a block-variant
    mis-wiring until the trajectory-parity suite caught it."""
    from se_tpu.models.layers import ComplexConv2d, ComplexConvTranspose2d
    import jax

    x = jnp.asarray(rng.standard_normal((2, 8, 16, 12)).astype(np.float32))
    br = rng.standard_normal(2).astype(np.float32)
    bi = rng.standard_normal(2).astype(np.float32)
    outs = {}
    for variant in ("block", "dbatch"):
        if transpose:
            layer = ComplexConvTranspose2d(
                8, 4, kernel_size=(5, 2), stride=(2, 1), padding=(2, 0),
                output_padding=(1, 0), variant=variant,
            )
        else:
            layer = ComplexConv2d(
                8, 4, kernel_size=(5, 2), stride=(2, 1), padding=(2, 0),
                variant=variant,
            )
        variables = layer.init(jax.random.PRNGKey(0), x)
        # force nonzero biases (init is zeros, which masks bias wiring)
        params = dict(
            variables["params"],
            real_bias=jnp.asarray(br),
            imag_bias=jnp.asarray(bi),
        )
        outs[variant] = np.asarray(layer.apply({"params": params}, x))
    np.testing.assert_allclose(outs["block"], outs["dbatch"], atol=2e-5)
