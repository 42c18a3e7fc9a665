"""DCCRN: deep complex convolution recurrent network.

Complex conv U-Net encoder/decoder + complex (or real) LSTM bottleneck with
cIRM-style masking of the noisy spectrum (reference: models.py:15-323).
TPU-first realisation: the STFT/iSTFT are framing+GEMM kernels
(se_tpu.dsp), every complex conv is one doubled-batch MXU conv, and the
complex LSTM runs as a single stacked scan.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import Config
from ..dsp import make_conv_stft_kernels, conv_stft, conv_istft
from ..ops.magnitude import complex_mag, safe_arctan2
from .layers import (
    ComplexConv2d,
    ComplexConvTranspose2d,
    ComplexBatchNorm,
    TorchBatchNorm2d,
    TorchLinear,
    TorchLSTM,
    NavieComplexLSTM,
    PReLU,
    complex_cat,
)


def _dec_s2d(mode: str) -> int:
    """Decoder transpose-conv s2d selection: 'decN' forces the adjoint
    block-conv form (no lhs_dilation) with fold r=N on EVERY decoder
    stage; 'auto' folds only the MXU-shallow (small output channel)
    stages; 'off' keeps the lhs-dilated XLA transpose conv."""
    if mode == "off":
        return 0
    if mode.startswith("dec"):
        return int(mode[3:])
    return -1


class DCCRN(nn.Module):
    cfg: Config

    def setup(self):
        c = self.cfg
        self.win_len = c.stft.win_len
        self.win_inc = c.stft.win_inc
        self.fft_len = c.stft.fft_len
        self.kernel_num = (2,) + tuple(c.dccrn.kernel_num)
        self.kernel_size = c.dccrn.kernel_size
        self.masking_mode = c.masking_mode
        self.stft_kernels = make_conv_stft_kernels(
            self.win_len, self.win_inc, self.fft_len, c.stft.window
        )

        n_stage = len(self.kernel_num) - 1
        ConvCls = ComplexConv2d
        ConvTCls = ComplexConvTranspose2d
        encoder, enc_bn, enc_act = [], [], []
        for idx in range(n_stage):
            encoder.append(
                ConvCls(
                    self.kernel_num[idx],
                    self.kernel_num[idx + 1],
                    kernel_size=(self.kernel_size, 2),
                    stride=(2, 1),
                    padding=(2, 1),
                    use_pallas=c.use_pallas_conv,
                    variant=c.conv_variant,
                    s2d=-1 if c.conv_s2d == "auto" else 0,
                    name=f"encoder_{idx}_conv",
                )
            )
            if c.dccrn.use_cbn:
                enc_bn.append(
                    ComplexBatchNorm(
                        self.kernel_num[idx + 1], name=f"encoder_{idx}_bn"
                    )
                )
            else:
                enc_bn.append(
                    TorchBatchNorm2d(
                        self.kernel_num[idx + 1], name=f"encoder_{idx}_bn"
                    )
                )
            enc_act.append(PReLU(name=f"encoder_{idx}_prelu"))
        self.encoder = encoder
        self.encoder_bn = enc_bn
        self.encoder_act = enc_act

        hidden_dim = self.fft_len // (2 ** len(self.kernel_num))
        self.hidden_dim = hidden_dim
        rnn_units = c.dccrn.rnn_units
        rnn_layers = c.dccrn.rnn_layers

        if c.lstm == "complex":
            rnns = []
            for idx in range(rnn_layers):
                rnns.append(
                    NavieComplexLSTM(
                        input_size=(
                            hidden_dim * self.kernel_num[-1]
                            if idx == 0
                            else rnn_units
                        ),
                        hidden_size=rnn_units,
                        projection_dim=(
                            hidden_dim * self.kernel_num[-1]
                            if idx == rnn_layers - 1
                            else None
                        ),
                        mixed_precision=c.compute_dtype == "bfloat16",
                        use_pallas=c.use_pallas_lstm,
                        name=f"enhance_{idx}",
                    )
                )
            self.enhance = rnns
        else:
            self.enhance_lstm = TorchLSTM(
                input_size=hidden_dim * self.kernel_num[-1],
                hidden_size=rnn_units,
                num_layers=2,
                use_pallas=c.use_pallas_lstm,
                name="enhance",
            )
            self.tranform = TorchLinear(
                hidden_dim * self.kernel_num[-1], name="tranform"
            )

        decoder, dec_bn, dec_act = [], [], []
        skip_mult = 2 if c.skip_type else 1
        for idx in range(n_stage, 0, -1):
            decoder.append(
                ConvTCls(
                    self.kernel_num[idx] * skip_mult,
                    self.kernel_num[idx - 1],
                    kernel_size=(self.kernel_size, 2),
                    stride=(2, 1),
                    padding=(2, 0),
                    output_padding=(1, 0),
                    variant=c.conv_variant,
                    s2d=_dec_s2d(c.conv_s2d),
                    name=f"decoder_{n_stage - idx}_conv",
                )
            )
            if idx != 1:
                if c.dccrn.use_cbn:
                    dec_bn.append(
                        ComplexBatchNorm(
                            self.kernel_num[idx - 1],
                            name=f"decoder_{n_stage - idx}_bn",
                        )
                    )
                else:
                    dec_bn.append(
                        TorchBatchNorm2d(
                            self.kernel_num[idx - 1],
                            name=f"decoder_{n_stage - idx}_bn",
                        )
                    )
                dec_act.append(PReLU(name=f"decoder_{n_stage - idx}_prelu"))
            else:
                dec_bn.append(None)
                dec_act.append(None)
        self.decoder = decoder
        self.decoder_bn = dec_bn
        self.decoder_act = dec_act

    def __call__(
        self,
        inputs: jnp.ndarray,
        targets: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
        """reference: models.py:176-284.

        Returns (out_real, out_imag, out_wav) for the masking modes, or
        (out_real, target_real, out_imag, target_imag, out_wav) for
        'Direct(None make)' spectral mapping.
        """
        c = self.cfg
        specs = conv_stft(inputs, self.stft_kernels)  # [B, fft+2, T]
        dim = self.fft_len // 2 + 1
        real = specs[:, :dim]
        imag = specs[:, dim:]
        spec_mags = jnp.sqrt(real**2 + imag**2 + 1e-8)
        spec_phase = jnp.arctan2(imag, real)
        cspecs = jnp.stack([real, imag], axis=1)[:, :, 1:]  # drop DC bin

        compute_dtype = (
            jnp.bfloat16 if c.compute_dtype == "bfloat16" else jnp.float32
        )
        out = cspecs.astype(compute_dtype)
        remat = c.remat_convs and train
        encoder_out = []
        for i in range(len(self.encoder)):

            def enc_stage(mdl, x, i=i):
                return mdl.encoder_act[i](
                    mdl.encoder_bn[i](mdl.encoder[i](x), train=train)
                )

            # full-stage remat: the backward recomputes conv+BN+PReLU from
            # the stage input, so only stage boundaries stay resident
            out = nn.remat(enc_stage)(self, out) if remat else enc_stage(self, out)
            encoder_out.append(out)

        B, C, D, T = out.shape
        out = jnp.transpose(out, (3, 0, 1, 2))  # [T, B, C, D]
        # Recurrence precision: a fully-bf16 recurrence compounds roundoff
        # over the 481-step scan and NaNs by step ~150 (docs/PERF.md).  The
        # complex path therefore uses the mixed cell (bf16 x_proj/output
        # streams around an f32 (h, c) carry and f32 gate math,
        # se_tpu/ops/rnn.py) under compute_dtype=bfloat16; the real-LSTM
        # path runs f32 throughout.
        if c.lstm != "complex" or c.compute_dtype != "bfloat16":
            out = out.astype(jnp.float32)
        if c.lstm == "complex":
            r_in = out[:, :, : C // 2].reshape(T, B, C // 2 * D)
            i_in = out[:, :, C // 2 :].reshape(T, B, C // 2 * D)
            r_in, i_in = [r_in, i_in]
            for rnn in self.enhance:
                r_in, i_in = rnn([r_in, i_in])
            r_in = r_in.reshape(T, B, C // 2, D)
            i_in = i_in.reshape(T, B, C // 2, D)
            out = jnp.concatenate([r_in, i_in], axis=2)
        else:
            out = out.reshape(T, B, C * D)
            out = self.enhance_lstm(out, train=train)
            out = self.tranform(out)
            out = out.reshape(T, B, C, D)
        out = jnp.transpose(out, (1, 2, 3, 0)).astype(compute_dtype)  # [B, C, D, T]

        n = len(self.decoder)
        for idx in range(n):
            if c.skip_type:
                out = complex_cat([out, encoder_out[-1 - idx]], 1)

            def dec_stage(mdl, x, idx=idx):
                y = mdl.decoder[idx](x)
                if mdl.decoder_bn[idx] is not None:
                    y = mdl.decoder_act[idx](
                        mdl.decoder_bn[idx](y, train=train)
                    )
                return y[..., 1:]  # causal time trim per stage

            out = nn.remat(dec_stage)(self, out) if remat else dec_stage(self, out)
        out = out.astype(jnp.float32)  # masking/iSTFT in full precision

        if self.masking_mode == "Direct(None make)":
            assert targets is not None, "Direct mapping needs targets"
            target_specs = conv_stft(targets, self.stft_kernels)
            target_real = target_specs[:, :dim]
            target_imag = target_specs[:, dim:]

            out_real = jnp.pad(out[:, 0], ((0, 0), (1, 0), (0, 0)))
            out_imag = jnp.pad(out[:, 1], ((0, 0), (1, 0), (0, 0)))
            out_spec = jnp.concatenate([out_real, out_imag], axis=1)
            out_wav = conv_istft(out_spec, self.stft_kernels)[:, 0]
            out_wav = jnp.clip(out_wav, -1.0, 1.0)
            return out_real, target_real, out_imag, target_imag, out_wav

        mask_real = jnp.pad(out[:, 0], ((0, 0), (1, 0), (0, 0)))
        mask_imag = jnp.pad(out[:, 1], ((0, 0), (1, 0), (0, 0)))

        if self.masking_mode == "E":
            # forward-identical to (r^2+i^2)**0.5; gradient is 0 instead
            # of NaN when a bin's real AND imag parts are exactly zero
            # (the reference's torch expression NaNs there, models.py:259 —
            # the bf16 activation path hits exact zeros readily)
            mask_mags = complex_mag(mask_real, mask_imag)
            real_phase = mask_real / (mask_mags + 1e-8)
            imag_phase = mask_imag / (mask_mags + 1e-8)
            # gradient-safe at all-zero bins (see ops/magnitude.py)
            mask_phase = safe_arctan2(imag_phase, real_phase)
            mask_mags = jnp.tanh(mask_mags)
            est_mags = mask_mags * spec_mags
            est_phase = spec_phase + mask_phase
            out_real = est_mags * jnp.cos(est_phase)
            out_imag = est_mags * jnp.sin(est_phase)
        elif self.masking_mode == "C":
            out_real = real * mask_real - imag * mask_imag
            out_imag = real * mask_imag + imag * mask_real
        elif self.masking_mode == "R":
            out_real = real * mask_real
            out_imag = imag * mask_imag
        else:
            raise ValueError(f"unknown masking mode {self.masking_mode!r}")

        out_spec = jnp.concatenate([out_real, out_imag], axis=1)
        out_wav = conv_istft(out_spec, self.stft_kernels)[:, 0]
        out_wav = jnp.clip(out_wav, -1.0, 1.0)
        return out_real, out_imag, out_wav
