"""Torch oracle of the DCCRN forward pass for golden parity testing.

This module re-states the reference's *semantics* (models.py:15-284 +
tools_for_model.py:16-338) in an independent, functional torch
implementation.  It exists only so tests can (a) verify the JAX model
numerically against torch with identical weights and (b) measure the
reference-architecture throughput for BASELINE.md.  It is not part of the
framework.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F
from scipy.signal import get_window


def stft_kernels(win_len=400, fft_len=512, invers=False):
    window = get_window("hann", win_len, fftbins=True)
    basis = np.fft.rfft(np.eye(fft_len))[:win_len]
    kernel = np.concatenate([basis.real, basis.imag], 1).T
    if invers:
        kernel = np.linalg.pinv(kernel).T
    kernel = kernel * window
    return (
        torch.from_numpy(kernel[:, None, :].astype(np.float32)),
        torch.from_numpy(window[None, :, None].astype(np.float32)),
    )


class OracleDCCRN(nn.Module):
    """Full-size DCCRN: complex conv U-Net + complex LSTM, 'E' masking."""

    def __init__(self, kernel_num=(32, 64, 128, 256, 256, 256), rnn_units=256,
                 rnn_layers=2, win_len=400, win_inc=100, fft_len=512,
                 kernel_size=5, masking_mode="E"):
        super().__init__()
        self.win_len, self.win_inc, self.fft_len = win_len, win_inc, fft_len
        self.masking_mode = masking_mode
        self.kernel_num = (2,) + tuple(kernel_num)
        kn = self.kernel_num

        fwd_k, _ = stft_kernels(win_len, fft_len)
        inv_k, window = stft_kernels(win_len, fft_len, invers=True)
        self.register_buffer("fwd_kernel", fwd_k)
        self.register_buffer("inv_kernel", inv_k)
        self.register_buffer("window", window)
        self.register_buffer("enframe", torch.eye(win_len)[:, None, :])

        self.enc_r = nn.ModuleList()
        self.enc_i = nn.ModuleList()
        self.enc_bn = nn.ModuleList()
        self.enc_act = nn.ModuleList()
        for i in range(len(kn) - 1):
            ci, co = kn[i] // 2, kn[i + 1] // 2
            for lst in (self.enc_r, self.enc_i):
                conv = nn.Conv2d(ci, co, (kernel_size, 2), (2, 1), padding=(2, 0))
                nn.init.normal_(conv.weight, std=0.05)
                nn.init.zeros_(conv.bias)
                lst.append(conv)
            self.enc_bn.append(nn.BatchNorm2d(kn[i + 1]))
            self.enc_act.append(nn.PReLU())

        hidden_dim = fft_len // (2 ** len(kn))
        self.hidden_dim = hidden_dim
        self.rnn_r = nn.ModuleList()
        self.rnn_i = nn.ModuleList()
        self.proj_r = None
        self.proj_i = None
        for i in range(rnn_layers):
            in_size = hidden_dim * kn[-1] // 2 if i == 0 else rnn_units // 2
            self.rnn_r.append(nn.LSTM(in_size, rnn_units // 2))
            self.rnn_i.append(nn.LSTM(in_size, rnn_units // 2))
        self.proj_r = nn.Linear(rnn_units // 2, hidden_dim * kn[-1] // 2)
        self.proj_i = nn.Linear(rnn_units // 2, hidden_dim * kn[-1] // 2)

        self.dec_r = nn.ModuleList()
        self.dec_i = nn.ModuleList()
        self.dec_bn = nn.ModuleList()
        self.dec_act = nn.ModuleList()
        for i in range(len(kn) - 1, 0, -1):
            ci, co = kn[i], kn[i - 1] // 2  # x2 skip concat halves to kn[i]
            for lst in (self.dec_r, self.dec_i):
                conv = nn.ConvTranspose2d(
                    ci, co, (kernel_size, 2), (2, 1),
                    padding=(2, 0), output_padding=(1, 0),
                )
                nn.init.normal_(conv.weight, std=0.05)
                nn.init.zeros_(conv.bias)
                lst.append(conv)
            if i != 1:
                self.dec_bn.append(nn.BatchNorm2d(kn[i - 1]))
                self.dec_act.append(nn.PReLU())
            else:
                self.dec_bn.append(nn.Identity())
                self.dec_act.append(nn.Identity())

    def _cconv(self, x, conv_r, conv_i, transpose=False):
        C = x.shape[1]
        r, i = x[:, : C // 2], x[:, C // 2 :]
        if not transpose:
            r = F.pad(r, [1, 0, 0, 0])
            i = F.pad(i, [1, 0, 0, 0])
        real = conv_r(r) - conv_i(i)
        imag = conv_i(r) + conv_r(i)
        return torch.cat([real, imag], 1)

    def forward(self, x, targets=None):
        xt = F.pad(x.unsqueeze(1), [self.win_len - self.win_inc] * 2)
        specs = F.conv1d(xt, self.fwd_kernel, stride=self.win_inc)
        dim = self.fft_len // 2 + 1
        real, imag = specs[:, :dim], specs[:, dim:]
        spec_mags = torch.sqrt(real**2 + imag**2 + 1e-8)
        spec_phase = torch.atan2(imag, real)
        out = torch.stack([real, imag], 1)[:, :, 1:]

        skips = []
        for cr, ci_, bn, act in zip(self.enc_r, self.enc_i, self.enc_bn, self.enc_act):
            out = act(bn(self._cconv(out, cr, ci_)))
            skips.append(out)

        B, C, D, T = out.shape
        out = out.permute(3, 0, 1, 2)
        r = out[:, :, : C // 2].reshape(T, B, -1)
        i = out[:, :, C // 2 :].reshape(T, B, -1)
        for li, (lr, lim) in enumerate(zip(self.rnn_r, self.rnn_i)):
            r2r, r2i = lr(r)[0], lim(r)[0]
            i2r, i2i = lr(i)[0], lim(i)[0]
            r, i = r2r - i2i, i2r + r2i
        r, i = self.proj_r(r), self.proj_i(i)
        r = r.reshape(T, B, C // 2, D)
        i = i.reshape(T, B, C // 2, D)
        out = torch.cat([r, i], 2).permute(1, 2, 3, 0)

        for idx in range(len(self.dec_r)):
            skip = skips[-1 - idx]
            Co, Cs = out.shape[1], skip.shape[1]
            out = torch.cat(
                [out[:, : Co // 2], skip[:, : Cs // 2],
                 out[:, Co // 2 :], skip[:, Cs // 2 :]], 1
            )
            out = self._cconv(out, self.dec_r[idx], self.dec_i[idx], transpose=True)
            out = self.dec_act[idx](self.dec_bn[idx](out))
            out = out[..., 1:]

        if self.masking_mode == "Direct(None make)":
            # spectral mapping: net output IS the estimated spectrum
            # (reference: models.py:246-255); loss pairs vs target specs
            tt = F.pad(targets.unsqueeze(1), [self.win_len - self.win_inc] * 2)
            tspecs = F.conv1d(tt, self.fwd_kernel, stride=self.win_inc)
            tgt_real, tgt_imag = tspecs[:, :dim], tspecs[:, dim:]
            out_real = F.pad(out[:, 0], [0, 0, 1, 0])
            out_imag = F.pad(out[:, 1], [0, 0, 1, 0])
            out_spec = torch.cat([out_real, out_imag], 1)
            wav = F.conv_transpose1d(
                out_spec, self.inv_kernel, stride=self.win_inc
            )
            t = self.window.repeat(1, 1, out_spec.size(-1)) ** 2
            coff = F.conv_transpose1d(t, self.enframe, stride=self.win_inc)
            wav = wav / (coff + 1e-8)
            trim = self.win_len - self.win_inc
            wav = torch.clamp(wav[..., trim:-trim].squeeze(1), -1, 1)
            return out_real, tgt_real, out_imag, tgt_imag, wav

        mask_real = F.pad(out[:, 0], [0, 0, 1, 0])
        mask_imag = F.pad(out[:, 1], [0, 0, 1, 0])
        mask_mags = (mask_real**2 + mask_imag**2) ** 0.5
        mask_phase = torch.atan2(
            mask_imag / (mask_mags + 1e-8), mask_real / (mask_mags + 1e-8)
        )
        est_mags = torch.tanh(mask_mags) * spec_mags
        est_phase = spec_phase + mask_phase
        out_real = est_mags * torch.cos(est_phase)
        out_imag = est_mags * torch.sin(est_phase)

        out_spec = torch.cat([out_real, out_imag], 1)
        wav = F.conv_transpose1d(out_spec, self.inv_kernel, stride=self.win_inc)
        t = self.window.repeat(1, 1, out_spec.size(-1)) ** 2
        coff = F.conv_transpose1d(t, self.enframe, stride=self.win_inc)
        wav = wav / (coff + 1e-8)
        trim = self.win_len - self.win_inc
        wav = wav[..., trim:-trim].squeeze(1)
        return out_real, out_imag, torch.clamp(wav, -1, 1)


def export_params_to_jax(model: "OracleDCCRN") -> dict:
    """Map oracle weights onto the se_tpu DCCRN parameter tree."""
    import jax.numpy as jnp

    # .copy(): torch shares .numpy() memory and JAX CPU can zero-copy it,
    # so without a copy later in-place optimiser steps would mutate the
    # "exported" jax arrays (trajectory tests export before training)
    sd = {k: v.detach().numpy().copy()
          for k, v in model.state_dict().items()}
    n_stage = len(model.kernel_num) - 1
    params = {}
    bstats = {}
    for i in range(n_stage):
        params[f"encoder_{i}_conv"] = {
            "real_weight": jnp.asarray(sd[f"enc_r.{i}.weight"]),
            "imag_weight": jnp.asarray(sd[f"enc_i.{i}.weight"]),
            "real_bias": jnp.asarray(sd[f"enc_r.{i}.bias"]),
            "imag_bias": jnp.asarray(sd[f"enc_i.{i}.bias"]),
        }
        params[f"encoder_{i}_bn"] = {
            "weight": jnp.asarray(sd[f"enc_bn.{i}.weight"]),
            "bias": jnp.asarray(sd[f"enc_bn.{i}.bias"]),
        }
        bstats[f"encoder_{i}_bn"] = {
            "running_mean": jnp.asarray(sd[f"enc_bn.{i}.running_mean"]),
            "running_var": jnp.asarray(sd[f"enc_bn.{i}.running_var"]),
        }
        params[f"encoder_{i}_prelu"] = {
            "weight": jnp.asarray(sd[f"enc_act.{i}.weight"])
        }
    for li in range(len(model.rnn_r)):
        blk = {
            "real_weight_ih": jnp.asarray(sd[f"rnn_r.{li}.weight_ih_l0"]),
            "real_weight_hh": jnp.asarray(sd[f"rnn_r.{li}.weight_hh_l0"]),
            "real_bias_ih": jnp.asarray(sd[f"rnn_r.{li}.bias_ih_l0"]),
            "real_bias_hh": jnp.asarray(sd[f"rnn_r.{li}.bias_hh_l0"]),
            "imag_weight_ih": jnp.asarray(sd[f"rnn_i.{li}.weight_ih_l0"]),
            "imag_weight_hh": jnp.asarray(sd[f"rnn_i.{li}.weight_hh_l0"]),
            "imag_bias_ih": jnp.asarray(sd[f"rnn_i.{li}.bias_ih_l0"]),
            "imag_bias_hh": jnp.asarray(sd[f"rnn_i.{li}.bias_hh_l0"]),
        }
        if li == len(model.rnn_r) - 1:
            blk["r_trans"] = {
                "weight": jnp.asarray(sd["proj_r.weight"]),
                "bias": jnp.asarray(sd["proj_r.bias"]),
            }
            blk["i_trans"] = {
                "weight": jnp.asarray(sd["proj_i.weight"]),
                "bias": jnp.asarray(sd["proj_i.bias"]),
            }
        params[f"enhance_{li}"] = blk
    for i in range(n_stage):
        params[f"decoder_{i}_conv"] = {
            "real_weight": jnp.asarray(sd[f"dec_r.{i}.weight"]),
            "imag_weight": jnp.asarray(sd[f"dec_i.{i}.weight"]),
            "real_bias": jnp.asarray(sd[f"dec_r.{i}.bias"]),
            "imag_bias": jnp.asarray(sd[f"dec_i.{i}.bias"]),
        }
        if i < n_stage - 1:
            params[f"decoder_{i}_bn"] = {
                "weight": jnp.asarray(sd[f"dec_bn.{i}.weight"]),
                "bias": jnp.asarray(sd[f"dec_bn.{i}.bias"]),
            }
            bstats[f"decoder_{i}_bn"] = {
                "running_mean": jnp.asarray(sd[f"dec_bn.{i}.running_mean"]),
                "running_var": jnp.asarray(sd[f"dec_bn.{i}.running_var"]),
            }
            params[f"decoder_{i}_prelu"] = {
                "weight": jnp.asarray(sd[f"dec_act.{i}.weight"])
            }
    return {"params": params, "batch_stats": bstats}
