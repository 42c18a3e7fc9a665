"""CRN: real-valued magnitude-domain convolutional recurrent network.

T-F magnitude masking (or direct mapping) with noisy-phase reconstruction
(reference: models.py:329-565).

Deviation from the reference, documented: the reference's no-skip decoder
declares ``in_channels = kernel_num[idx]`` while the actual tensor carries
``kernel_num[idx] // 2`` channels (models.py:435-441), so the no-skip CRN
cannot run in the reference.  Here the no-skip decoder uses the channel
counts that make the network well-formed (halved, like the encoder).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ..config import Config
from .dccrn import _dec_s2d
from ..dsp import make_conv_stft_kernels, conv_stft_mag_phase, conv_istft
from .layers import (
    RealConv2d,
    RealConvTranspose2d,
    TorchBatchNorm2d,
    TorchLinear,
    TorchLSTM,
    PReLU,
)


class CRN(nn.Module):
    cfg: Config

    def setup(self):
        c = self.cfg
        self.win_len = c.stft.win_len
        self.win_inc = c.stft.win_inc
        self.fft_len = c.stft.fft_len
        self.kernel_num = (2,) + tuple(c.dccrn.kernel_num)
        self.kernel_size = c.crn.kernel_size
        self.masking_mode = c.masking_mode
        self.stft_kernels = make_conv_stft_kernels(
            self.win_len, self.win_inc, self.fft_len, c.stft.window
        )

        n_stage = len(self.kernel_num) - 1
        encoder, enc_bn, enc_act = [], [], []
        for idx in range(n_stage):
            encoder.append(
                RealConv2d(
                    self.kernel_num[idx] // 2,
                    self.kernel_num[idx + 1] // 2,
                    kernel_size=(self.kernel_size, 2),
                    stride=(2, 1),
                    padding=(2, 1),
                    s2d=-1 if c.conv_s2d == "auto" else 0,
                    name=f"encoder_{idx}_conv",
                )
            )
            enc_bn.append(
                TorchBatchNorm2d(
                    self.kernel_num[idx + 1] // 2, name=f"encoder_{idx}_bn"
                )
            )
            enc_act.append(PReLU(name=f"encoder_{idx}_prelu"))
        self.encoder = encoder
        self.encoder_bn = enc_bn
        self.encoder_act = enc_act

        self.enhance_lstm = TorchLSTM(
            input_size=c.crn.rnn_input_size,
            hidden_size=c.crn.rnn_units // 2,
            num_layers=1,
            use_pallas=c.use_pallas_lstm,
            name="enhance",
        )
        self.tranform = TorchLinear(c.crn.rnn_input_size, name="tranform")

        decoder, dec_bn, dec_act = [], [], []
        for idx in range(n_stage, 0, -1):
            in_ch = self.kernel_num[idx] if c.skip_type else self.kernel_num[idx] // 2
            decoder.append(
                RealConvTranspose2d(
                    in_ch,
                    self.kernel_num[idx - 1] // 2,
                    kernel_size=(self.kernel_size, 2),
                    stride=(2, 1),
                    padding=(2, 0),
                    output_padding=(1, 0),
                    s2d=_dec_s2d(c.conv_s2d),
                    name=f"decoder_{n_stage - idx}_conv",
                )
            )
            if idx != 1:
                dec_bn.append(
                    TorchBatchNorm2d(
                        self.kernel_num[idx - 1] // 2,
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
        """reference: models.py:467-532.

        Returns (est_mags, target_mags, out_wav) in masking mode, or
        (out_mags, target_mags, out_wav) in direct-mapping mode.
        ``target_mags`` is None when targets are not given.
        """
        c = self.cfg
        mags, phase = conv_stft_mag_phase(inputs, self.stft_kernels)

        compute_dtype = (
            jnp.bfloat16 if c.compute_dtype == "bfloat16" else jnp.float32
        )
        out = mags[:, None, 1:, :].astype(compute_dtype)  # drop DC bin
        encoder_out = []
        for conv, bn, act in zip(self.encoder, self.encoder_bn, self.encoder_act):
            out = act(bn(conv(out), train=train))
            encoder_out.append(out)

        B, C, D, T = out.shape
        out = jnp.transpose(out, (3, 0, 1, 2)).reshape(T, B, C * D)
        out = self.enhance_lstm(out, train=train)
        out = self.tranform(out)
        out = out.reshape(T, B, C, D)
        out = jnp.transpose(out, (1, 2, 3, 0))  # [B, C, D, T]

        for idx in range(len(self.decoder)):
            if c.skip_type:
                out = jnp.concatenate([out, encoder_out[-1 - idx]], axis=1)
            out = self.decoder[idx](out)
            if self.decoder_bn[idx] is not None:
                out = self.decoder_act[idx](
                    self.decoder_bn[idx](out, train=train)
                )
            out = out[..., 1:]

        out = out[:, 0].astype(jnp.float32)  # squeeze channel
        out = jnp.pad(out, ((0, 0), (1, 0), (0, 0)))  # re-pad DC bin

        target_mags = None
        if targets is not None:
            target_mags, _ = conv_stft_mag_phase(targets, self.stft_kernels)

        if self.masking_mode == "Direct(None make)":
            out_real = out * jnp.cos(phase)
            out_imag = out * jnp.sin(phase)
            out_spec = jnp.concatenate([out_real, out_imag], axis=1)
            out_wav = conv_istft(out_spec, self.stft_kernels)[:, 0]
            out_wav = jnp.clip(out_wav, -1.0, 1.0)
            return out, target_mags, out_wav
        else:
            mask_mags = jnp.tanh(out)
            est_mags = mask_mags * mags
            out_real = est_mags * jnp.cos(phase)
            out_imag = est_mags * jnp.sin(phase)
            out_spec = jnp.concatenate([out_real, out_imag], axis=1)
            out_wav = conv_istft(out_spec, self.stft_kernels)[:, 0]
            out_wav = jnp.clip(out_wav, -1.0, 1.0)
            return est_mags, target_mags, out_wav
