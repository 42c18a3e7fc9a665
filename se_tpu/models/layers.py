"""Flax layers with PyTorch-parity semantics and initialisation.

These wrap the pure ops in ``se_tpu.ops`` with parameter management.  The
complex layers use the batched-pair trick: the four real products of a
complex op run as ONE convolution / ONE scan over a doubled batch (or a
stacked weight axis) instead of four separate kernels — same math as
reference tools_for_model.py:199-338 and :141-177, one MXU launch.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import conv as conv_ops
from ..ops import rnn as rnn_ops
from ..ops.activations import prelu
from ..ops.norms import batch_norm_2d, complex_batch_norm, ComplexBnState


def _normal05(key, shape, dtype=jnp.float32):
    """Conv init used throughout the reference: N(0, 0.05)
    (tools_for_model.py:238-241,:306-309,:377,:419)."""
    return jax.random.normal(key, shape, dtype) * 0.05


def _pick_s2d(s2d, in_channels, kernel_size, stride, f_in) -> int:
    """Resolve the space-to-depth fold for a freq-strided conv stage:
    s2d = -1 auto-selects (conv_ops.auto_s2d_r), 0 disables, >0 forces r.
    Only freq-stride-2 / time-stride-1 stages qualify."""
    if s2d == 0 or tuple(stride) != (2, 1):
        return 0
    if s2d > 0:
        if f_in % (stride[0] * s2d):
            raise ValueError(
                f"conv_s2d fold r={s2d} does not divide this stage: input "
                f"frequency length {f_in} is not a multiple of "
                f"stride_f*r={stride[0] * s2d}; use conv_s2d='auto' or a "
                f"dividing r"
            )
        return s2d
    return conv_ops.auto_s2d_r(
        in_channels, kernel_size[0], kernel_size[1], f_in
    )


def _pick_s2d_transpose(s2d, out_channels, kernel_size, stride,
                        padding, output_padding, f_in) -> int:
    """Transpose-side resolution: the adjoint GEMM's contraction depth is
    set by the OUTPUT channel count, and the fold must divide the output
    frequency length."""
    if s2d == 0 or tuple(stride) != (2, 1):
        return 0
    if tuple(padding)[1] != 0 or tuple(output_padding)[1] != 0:
        return 0
    f_out = (
        (f_in - 1) * stride[0] - 2 * padding[0]
        + kernel_size[0] + output_padding[0]
    )
    if s2d > 0:
        if f_out % (stride[0] * s2d):
            raise ValueError(
                f"conv_s2d fold r={s2d} does not divide this transpose "
                f"stage: output frequency length {f_out} is not a multiple "
                f"of stride_f*r={stride[0] * s2d}; use conv_s2d='auto' or "
                f"a dividing r"
            )
        return s2d
    return conv_ops.auto_s2d_r(
        out_channels, kernel_size[0], kernel_size[1], f_out
    )


def _torch_linear_init(key, fan_in, shape, dtype=jnp.float32):
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TorchLinear(nn.Module):
    """nn.Linear parity (kaiming-uniform a=sqrt(5) == U(+-1/sqrt(fan_in)))."""

    features: int

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        w = self.param(
            "weight",
            lambda k, s: _torch_linear_init(k, fan_in, s),
            (self.features, fan_in),
        )
        b = self.param(
            "bias",
            lambda k, s: _torch_linear_init(k, fan_in, s),
            (self.features,),
        )
        return x @ w.T.astype(x.dtype) + b.astype(x.dtype)


class TorchBatchNorm2d(nn.Module):
    """nn.BatchNorm2d parity incl. running-stat momentum-lerp updates."""

    num_features: int
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool):
        scale = self.param("weight", nn.initializers.ones, (self.num_features,))
        bias = self.param("bias", nn.initializers.zeros, (self.num_features,))
        rm = self.variable(
            "batch_stats", "running_mean", jnp.zeros, (self.num_features,)
        )
        rv = self.variable(
            "batch_stats", "running_var", jnp.ones, (self.num_features,)
        )
        y, new_m, new_v = batch_norm_2d(
            x, scale, bias, rm.value, rv.value,
            train, self.momentum, self.eps,
        )
        if train and not self.is_initializing():
            rm.value = new_m
            rv.value = new_v
        return y


class ComplexBatchNorm(nn.Module):
    """Whitening complex BN (reference: tools_for_model.py:430-607)."""

    num_features: int  # real+imag channels
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool):
        C = self.num_features // 2
        Wrr = self.param("Wrr", nn.initializers.ones, (C,))
        Wri = self.param(
            "Wri", lambda k, s: jax.random.uniform(k, s, jnp.float32, -0.9, 0.9), (C,)
        )
        Wii = self.param("Wii", nn.initializers.ones, (C,))
        Br = self.param("Br", nn.initializers.zeros, (C,))
        Bi = self.param("Bi", nn.initializers.zeros, (C,))
        state = self.variable(
            "batch_stats",
            "state",
            lambda: ComplexBnState(
                RMr=jnp.zeros(C),
                RMi=jnp.zeros(C),
                RVrr=jnp.ones(C),
                RVri=jnp.zeros(C),
                RVii=jnp.ones(C),
            ),
        )
        y, new_state = complex_batch_norm(
            x, Wrr, Wri, Wii, Br, Bi, state.value, train, self.momentum, self.eps
        )
        if train and not self.is_initializing():
            state.value = new_state
        return y


class PReLU(nn.Module):
    """nn.PReLU parity (single shared 0.25-initialised slope)."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "weight", lambda k, s: jnp.full(s, 0.25, jnp.float32), (1,)
        )
        return prelu(x, alpha)


class CPReLU(nn.Module):
    """Separate PReLU per real/imag half (reference: tools_for_model.py:126-138)."""

    @nn.compact
    def __call__(self, x):
        C = x.shape[1]
        ar = self.param("r_weight", lambda k, s: jnp.full(s, 0.25, jnp.float32), (1,))
        ai = self.param("i_weight", lambda k, s: jnp.full(s, 0.25, jnp.float32), (1,))
        r, i = x[:, : C // 2], x[:, C // 2 :]
        return jnp.concatenate([prelu(r, ar), prelu(i, ai)], axis=1)


class RealConv2d(nn.Module):
    """Causal-padded Conv2d (reference: tools_for_model.py:341-388).

    Freq padding is symmetric inside the conv; time padding is
    left-only (causal) applied explicitly.
    """

    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, int] = (1, 1)
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    causal: bool = True
    s2d: int = 0  # -1 auto, 0 off, >0 explicit freq fold r

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight",
            _normal05,
            (self.out_channels, self.in_channels, *self.kernel_size),
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        ph, pw = self.padding
        if pw != 0 and self.causal:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (pw, 0)))
        else:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (pw, pw)))
        r = _pick_s2d(self.s2d, self.in_channels, self.kernel_size,
                      self.stride, x.shape[2])
        if r:
            return conv_ops.conv2d_freq_s2d(
                x, w, b, r=r, stride=self.stride, padding=(ph, 0)
            )
        return conv_ops.conv2d(x, w, b, stride=self.stride, padding=(ph, 0))


class RealConvTranspose2d(nn.Module):
    """reference: tools_for_model.py:391-425."""

    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, int] = (1, 1)
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    output_padding: Tuple[int, int] = (0, 0)
    s2d: int = 0  # -1 auto, 0 off, >0 explicit freq fold r

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight",
            _normal05,
            (self.in_channels, self.out_channels, *self.kernel_size),
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        r = _pick_s2d_transpose(
            self.s2d, self.out_channels, self.kernel_size, self.stride,
            self.padding, self.output_padding, x.shape[2],
        )
        if r:
            return conv_ops.conv_transpose2d_freq_s2d(
                x, w, b, r=r, stride=self.stride, padding=self.padding,
                output_padding=self.output_padding,
            )
        return conv_ops.conv_transpose2d(
            x,
            w,
            b,
            stride=self.stride,
            padding=self.padding,
            output_padding=self.output_padding,
        )


class ComplexConv2d(nn.Module):
    """Complex conv as ONE real conv (reference: tools_for_model.py:199-269).

    Channels are real-block||imag-block; `in_channels`/`out_channels` count
    real+imag, as in the reference.  Two MXU realisations:

    * ``variant="block"`` (default): the complex product as the real 2x2
      block kernel ``[[wr, -wi], [wi, wr]]`` — one conv with full channel
      counts (2ci -> 2co), the MXU-friendliest shape (measured fastest on
      v5e for every stage, tools/perf_probe.py).
    * ``variant="dbatch"``: the round-1 doubled-batch form ([2B, ci] conv
      [2co, ci] then recombine).
    """

    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, int] = (1, 1)
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    causal: bool = True
    use_pallas: bool = False
    variant: str = "block"
    s2d: int = 0  # -1 auto, 0 off, >0 explicit freq fold r

    @nn.compact
    def __call__(self, x):
        ci, co = self.in_channels // 2, self.out_channels // 2
        wr = self.param("real_weight", _normal05, (co, ci, *self.kernel_size))
        wi = self.param("imag_weight", _normal05, (co, ci, *self.kernel_size))
        br = self.param("real_bias", nn.initializers.zeros, (co,))
        bi = self.param("imag_bias", nn.initializers.zeros, (co,))

        B = x.shape[0]
        ph, pw = self.padding
        pallas_ok = (
            self.use_pallas
            and self.causal
            and self.kernel_size == (5, 2)
            and tuple(self.stride) == (2, 1)
            and (ph, pw) == (2, 1)
        )
        if pallas_ok:
            from ..ops.pallas_conv import fused_complex_conv2d

            r, i = x[:, :ci], x[:, ci:]
            z = jnp.concatenate([r, i], axis=0)
            w = jnp.concatenate([wr, wi], axis=0)
            bias = jnp.concatenate([br, bi])
            y = fused_complex_conv2d(z, w, bias)
            r2r, r2i = y[:B, :co], y[:B, co:]
            i2r, i2i = y[B:, :co], y[B:, co:]
            return jnp.concatenate([r2r - i2i, r2i + i2r], axis=1)

        if pw != 0 and self.causal:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (pw, 0)))
        else:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (pw, pw)))

        if self.variant == "block":
            # [[wr, -wi], [wi, wr]] acting on [r; i] channels: output is
            # already [real-block; imag-block] — no recombination needed
            w = jnp.concatenate(
                [
                    jnp.concatenate([wr, -wi], axis=1),
                    jnp.concatenate([wi, wr], axis=1),
                ],
                axis=0,
            )  # [2co, 2ci, kh, kw]
            # bias combines like the kernel: the reference applies BOTH
            # component convs (each with its own bias) to BOTH inputs, so
            # real_out carries br - bi and imag_out br + bi
            # (tools_for_model.py:251-266: real = conv_r(r) - conv_i(i),
            # imag = conv_i(r) + conv_r(i))
            bias = jnp.concatenate([br - bi, br + bi])
            r = _pick_s2d(self.s2d, self.in_channels, self.kernel_size,
                          self.stride, x.shape[2])
            if r:
                return conv_ops.conv2d_freq_s2d(
                    x, w, bias, r=r, stride=self.stride, padding=(ph, 0)
                )
            return conv_ops.conv2d(
                x, w, bias, stride=self.stride, padding=(ph, 0)
            )

        r, i = x[:, :ci], x[:, ci:]
        z = jnp.concatenate([r, i], axis=0)  # [2B, ci, F, T]
        w = jnp.concatenate([wr, wi], axis=0)  # [2co, ci, kh, kw]
        bias = jnp.concatenate([br, bi])
        y = conv_ops.conv2d(z, w, bias, stride=self.stride, padding=(ph, 0))
        r2r, r2i = y[:B, :co], y[:B, co:]
        i2r, i2i = y[B:, :co], y[B:, co:]
        real = r2r - i2i
        imag = r2i + i2r
        return jnp.concatenate([real, imag], axis=1)


class ComplexConvTranspose2d(nn.Module):
    """reference: tools_for_model.py:272-338.  Same block-kernel /
    doubled-batch choice as ComplexConv2d (torch transpose weight layout
    [in, out, kh, kw], so the block sits on axes (0, 1))."""

    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, int] = (1, 1)
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    output_padding: Tuple[int, int] = (0, 0)
    variant: str = "block"
    s2d: int = 0  # -1 auto, 0 off, >0 explicit freq fold r

    @nn.compact
    def __call__(self, x):
        ci, co = self.in_channels // 2, self.out_channels // 2
        wr = self.param("real_weight", _normal05, (ci, co, *self.kernel_size))
        wi = self.param("imag_weight", _normal05, (ci, co, *self.kernel_size))
        br = self.param("real_bias", nn.initializers.zeros, (co,))
        bi = self.param("imag_bias", nn.initializers.zeros, (co,))

        if self.variant == "block":
            # input rows [r; i], output cols [real; imag]:
            # real_out = r*wr - i*wi ; imag_out = r*wi + i*wr
            w = jnp.concatenate(
                [
                    jnp.concatenate([wr, wi], axis=1),
                    jnp.concatenate([-wi, wr], axis=1),
                ],
                axis=0,
            )  # [2ci, 2co, kh, kw]
            # same bias combination as ComplexConv2d block: the reference
            # adds both component biases to both outputs with the complex
            # signs (tools_for_model.py:316-335)
            bias = jnp.concatenate([br - bi, br + bi])
            r = _pick_s2d_transpose(
                self.s2d, self.out_channels, self.kernel_size, self.stride,
                self.padding, self.output_padding, x.shape[2],
            )
            if r:
                return conv_ops.conv_transpose2d_freq_s2d(
                    x, w, bias, r=r, stride=self.stride,
                    padding=self.padding,
                    output_padding=self.output_padding,
                )
            return conv_ops.conv_transpose2d(
                x,
                w,
                bias,
                stride=self.stride,
                padding=self.padding,
                output_padding=self.output_padding,
            )

        B = x.shape[0]
        r, i = x[:, :ci], x[:, ci:]
        z = jnp.concatenate([r, i], axis=0)  # [2B, ci, F, T]
        w = jnp.concatenate([wr, wi], axis=1)  # [ci, 2co, kh, kw]
        bias = jnp.concatenate([br, bi])
        y = conv_ops.conv_transpose2d(
            z,
            w,
            bias,
            stride=self.stride,
            padding=self.padding,
            output_padding=self.output_padding,
        )
        r2r, r2i = y[:B, :co], y[:B, co:]
        i2r, i2i = y[B:, :co], y[B:, co:]
        real = r2r - i2i
        imag = r2i + i2r
        return jnp.concatenate([real, imag], axis=1)


def complex_cat(inputs: Sequence[jnp.ndarray], axis: int) -> jnp.ndarray:
    """Concatenate complex tensors keeping real||imag block layout
    (reference: tools_for_model.py:184-193)."""
    reals, imags = [], []
    for data in inputs:
        c = data.shape[axis]
        r, i = jnp.split(data, 2, axis=axis)
        reals.append(r)
        imags.append(i)
    return jnp.concatenate(reals + imags, axis=axis)


class TorchLSTM(nn.Module):
    """Multi-layer unidirectional nn.LSTM parity (seq-major [T, B, In])."""

    input_size: int
    hidden_size: int
    num_layers: int = 1
    dropout: float = 0.0
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, state=None,
                 return_state: bool = False):
        finals = []
        for layer in range(self.num_layers):
            in_size = self.input_size if layer == 0 else self.hidden_size
            params = rnn_ops.LstmParams(
                w_ih=self.param(
                    f"weight_ih_l{layer}",
                    lambda k, s: _torch_linear_init(k, self.hidden_size, s),
                    (4 * self.hidden_size, in_size),
                ),
                w_hh=self.param(
                    f"weight_hh_l{layer}",
                    lambda k, s: _torch_linear_init(k, self.hidden_size, s),
                    (4 * self.hidden_size, self.hidden_size),
                ),
                b_ih=self.param(
                    f"bias_ih_l{layer}",
                    lambda k, s: _torch_linear_init(k, self.hidden_size, s),
                    (4 * self.hidden_size,),
                ),
                b_hh=self.param(
                    f"bias_hh_l{layer}",
                    lambda k, s: _torch_linear_init(k, self.hidden_size, s),
                    (4 * self.hidden_size,),
                ),
            )
            h0 = c0 = None
            if state is not None:
                h0, c0 = state[layer]
            x, final = rnn_ops.lstm(params, x, h0, c0,
                                    use_pallas=self.use_pallas)
            finals.append(final)
            if train and self.dropout > 0 and layer < self.num_layers - 1:
                x = nn.Dropout(rate=self.dropout, deterministic=False)(x)
        if return_state:
            return x, finals
        return x


class TorchGRU(nn.Module):
    """Multi-layer unidirectional nn.GRU parity (seq-major [T, B, In]).

    ``use_pallas`` routes each layer's recurrence through the fused
    in-projection Pallas cell (pallas_lstm.fused_gru_scan_inproj) — the
    same VMEM-resident treatment as TorchLSTM, needed for FullSubNet's
    sequence_model="GRU" variant at real sub-band batches.  bf16 inputs
    get mixed-precision semantics inside ``rnn_ops.gru`` (f32 h carry)
    just like the LSTM."""

    input_size: int
    hidden_size: int
    num_layers: int = 1
    dropout: float = 0.0
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, state=None,
                 return_state: bool = False):
        finals = []
        for layer in range(self.num_layers):
            in_size = self.input_size if layer == 0 else self.hidden_size
            params = rnn_ops.LstmParams(
                w_ih=self.param(
                    f"weight_ih_l{layer}",
                    lambda k, s: _torch_linear_init(k, self.hidden_size, s),
                    (3 * self.hidden_size, in_size),
                ),
                w_hh=self.param(
                    f"weight_hh_l{layer}",
                    lambda k, s: _torch_linear_init(k, self.hidden_size, s),
                    (3 * self.hidden_size, self.hidden_size),
                ),
                b_ih=self.param(
                    f"bias_ih_l{layer}",
                    lambda k, s: _torch_linear_init(k, self.hidden_size, s),
                    (3 * self.hidden_size,),
                ),
                b_hh=self.param(
                    f"bias_hh_l{layer}",
                    lambda k, s: _torch_linear_init(k, self.hidden_size, s),
                    (3 * self.hidden_size,),
                ),
            )
            h0 = state[layer] if state is not None else None
            x, final = rnn_ops.gru(params, x, h0, use_pallas=self.use_pallas)
            finals.append(final)
            if train and self.dropout > 0 and layer < self.num_layers - 1:
                x = nn.Dropout(rate=self.dropout, deterministic=False)(x)
        if return_state:
            return x, finals
        return x


class NavieComplexLSTM(nn.Module):
    """Complex LSTM as a 2-stack single-scan recurrence.

    reference: tools_for_model.py:141-177.  The shared-weight quirk
    (``real_lstm`` used for both r->r and i->r) is inherent here: the
    real-weights row of the stack processes the [real; imag] doubled batch.
    """

    input_size: int
    hidden_size: int
    projection_dim: Optional[int] = None
    mixed_precision: bool = False  # bf16 streams around an f32 (h, c) core
    use_pallas: bool = False

    @nn.compact
    def __call__(self, inputs, state=None, return_state: bool = False):
        real, imag = inputs  # each [T, B, input_size // 2]
        in_dim = self.input_size // 2
        units = self.hidden_size // 2

        def make(name_prefix):
            return rnn_ops.LstmParams(
                w_ih=self.param(
                    f"{name_prefix}_weight_ih",
                    lambda k, s: _torch_linear_init(k, units, s),
                    (4 * units, in_dim),
                ),
                w_hh=self.param(
                    f"{name_prefix}_weight_hh",
                    lambda k, s: _torch_linear_init(k, units, s),
                    (4 * units, units),
                ),
                b_ih=self.param(
                    f"{name_prefix}_bias_ih",
                    lambda k, s: _torch_linear_init(k, units, s),
                    (4 * units,),
                ),
                b_hh=self.param(
                    f"{name_prefix}_bias_hh",
                    lambda k, s: _torch_linear_init(k, units, s),
                    (4 * units,),
                ),
            )

        p_real, p_imag = make("real"), make("imag")
        stacked = rnn_ops.LstmParams(
            *[jnp.stack([a, b]) for a, b in zip(p_real, p_imag)]
        )

        B = real.shape[1]
        z = jnp.concatenate([real, imag], axis=1)  # [T, 2B, in_dim]
        ys, final = rnn_ops.lstm_stack(
            stacked, z, state=state, return_state=True,
            mixed_precision=self.mixed_precision,
            use_pallas=self.use_pallas,
        )  # [2, T, 2B, units]
        r2r, i2r = ys[0, :, :B], ys[0, :, B:]
        r2i, i2i = ys[1, :, :B], ys[1, :, B:]
        real_out = r2r - i2i
        imag_out = i2r + r2i
        if self.projection_dim is not None:
            proj = self.projection_dim // 2
            real_out = TorchLinear(proj, name="r_trans")(real_out)
            imag_out = TorchLinear(proj, name="i_trans")(imag_out)
        if return_state:
            return [real_out, imag_out], final
        return [real_out, imag_out]


class SequenceModel(nn.Module):
    """Stacked RNN + output Linear + optional activation.

    reference: tools_for_model.py:726-795 (dropout 0.8 between RNN layers).
    Input/output [B, F, T].
    """

    input_size: int
    output_size: int
    hidden_size: int
    num_layers: int = 2
    sequence_model: str = "GRU"
    output_activate_function: Optional[str] = "Tanh"
    dropout: float = 0.8
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, state=None,
                 return_state: bool = False):
        assert x.ndim == 3
        x = jnp.transpose(x, (2, 0, 1))  # [B, F, T] -> [T, B, F]
        if self.sequence_model == "LSTM":
            o = TorchLSTM(
                self.input_size,
                self.hidden_size,
                self.num_layers,
                self.dropout,
                use_pallas=self.use_pallas,
                name="sequence_model",
            )(x, train=train, state=state, return_state=return_state)
        elif self.sequence_model == "GRU":
            o = TorchGRU(
                self.input_size,
                self.hidden_size,
                self.num_layers,
                self.dropout,
                use_pallas=self.use_pallas,
                name="sequence_model",
            )(x, train=train, state=state, return_state=return_state)
        else:
            raise NotImplementedError(f"Not implemented {self.sequence_model}")
        if return_state:
            o, final_state = o
        o = TorchLinear(self.output_size, name="fc_output_layer")(o)
        if self.output_activate_function:
            if self.output_activate_function == "Tanh":
                o = jnp.tanh(o)
            elif self.output_activate_function == "ReLU":
                o = jax.nn.relu(o)
            elif self.output_activate_function == "ReLU6":
                o = jnp.clip(o, 0.0, 6.0)
            else:
                raise NotImplementedError(
                    f"Not implemented activation function "
                    f"{self.output_activate_function}"
                )
        o = jnp.transpose(o, (1, 2, 0))  # [T, B, F] -> [B, F, T]
        if return_state:
            return o, final_state
        return o
