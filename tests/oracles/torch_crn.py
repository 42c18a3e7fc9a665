"""Torch oracle of the CRN forward pass (magnitude masking) for golden
parity testing — independent restatement of reference models.py:329-532
semantics.  Test-only, not part of the framework."""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from .torch_dccrn import stft_kernels


class OracleCRN(nn.Module):
    def __init__(self, kernel_num=(32, 64, 128, 256, 256, 256),
                 rnn_input_size=512, rnn_units=256, win_len=400, win_inc=100,
                 fft_len=512, kernel_size=5):
        super().__init__()
        self.win_len, self.win_inc, self.fft_len = win_len, win_inc, fft_len
        kn = (2,) + tuple(kernel_num)
        self.kn = kn

        fwd_k, _ = stft_kernels(win_len, fft_len)
        inv_k, window = stft_kernels(win_len, fft_len, invers=True)
        self.register_buffer("fwd_kernel", fwd_k)
        self.register_buffer("inv_kernel", inv_k)
        self.register_buffer("window", window)
        self.register_buffer("enframe", torch.eye(win_len)[:, None, :])

        self.enc = nn.ModuleList()
        self.enc_bn = nn.ModuleList()
        self.enc_act = nn.ModuleList()
        for i in range(len(kn) - 1):
            conv = nn.Conv2d(kn[i] // 2, kn[i + 1] // 2, (kernel_size, 2),
                             (2, 1), padding=(2, 0))
            nn.init.normal_(conv.weight, std=0.05)
            nn.init.zeros_(conv.bias)
            self.enc.append(conv)
            self.enc_bn.append(nn.BatchNorm2d(kn[i + 1] // 2))
            self.enc_act.append(nn.PReLU())

        self.lstm = nn.LSTM(rnn_input_size, rnn_units // 2)
        self.proj = nn.Linear(rnn_units // 2, rnn_input_size)

        self.dec = nn.ModuleList()
        self.dec_bn = nn.ModuleList()
        self.dec_act = nn.ModuleList()
        for i in range(len(kn) - 1, 0, -1):
            conv = nn.ConvTranspose2d(kn[i], kn[i - 1] // 2, (kernel_size, 2),
                                      (2, 1), padding=(2, 0),
                                      output_padding=(1, 0))
            nn.init.normal_(conv.weight, std=0.05)
            nn.init.zeros_(conv.bias)
            self.dec.append(conv)
            if i != 1:
                self.dec_bn.append(nn.BatchNorm2d(kn[i - 1] // 2))
                self.dec_act.append(nn.PReLU())
            else:
                self.dec_bn.append(nn.Identity())
                self.dec_act.append(nn.Identity())

    def forward(self, x):
        xt = F.pad(x.unsqueeze(1), [self.win_len - self.win_inc] * 2)
        specs = F.conv1d(xt, self.fwd_kernel, stride=self.win_inc)
        dim = self.fft_len // 2 + 1
        real, imag = specs[:, :dim], specs[:, dim:]
        mags = torch.sqrt(real**2 + imag**2)
        phase = torch.atan2(imag, real)

        out = mags.unsqueeze(1)[:, :, 1:]
        skips = []
        for conv, bn, act in zip(self.enc, self.enc_bn, self.enc_act):
            out = act(bn(conv(F.pad(out, [1, 0, 0, 0]))))
            skips.append(out)

        B, C, D, T = out.shape
        out = out.permute(3, 0, 1, 2).reshape(T, B, C * D)
        out, _ = self.lstm(out)
        out = self.proj(out)
        out = out.reshape(T, B, C, D).permute(1, 2, 3, 0)

        for i in range(len(self.dec)):
            out = torch.cat([out, skips[-1 - i]], 1)
            out = self.dec_act[i](self.dec_bn[i](self.dec[i](out)))
            out = out[..., 1:]

        out = F.pad(out.squeeze(1), [0, 0, 1, 0])
        mask = torch.tanh(out)
        est_mags = mask * mags
        out_real = est_mags * torch.cos(phase)
        out_imag = est_mags * torch.sin(phase)
        out_spec = torch.cat([out_real, out_imag], 1)
        wav = F.conv_transpose1d(out_spec, self.inv_kernel, stride=self.win_inc)
        t = self.window.repeat(1, 1, out_spec.size(-1)) ** 2
        coff = F.conv_transpose1d(t, self.enframe, stride=self.win_inc)
        wav = wav / (coff + 1e-8)
        trim = self.win_len - self.win_inc
        wav = wav[..., trim:-trim].squeeze(1)
        return est_mags, torch.clamp(wav, -1, 1)


def export_params_to_jax(model: "OracleCRN") -> dict:
    import jax.numpy as jnp

    # .copy(): torch shares .numpy() memory and JAX CPU can zero-copy it,
    # so without a copy later in-place optimiser steps would mutate the
    # "exported" jax arrays (trajectory tests export before training)
    sd = {k: v.detach().numpy().copy()
          for k, v in model.state_dict().items()}
    n_stage = len(model.kn) - 1
    params, bstats = {}, {}
    for i in range(n_stage):
        params[f"encoder_{i}_conv"] = {
            "weight": jnp.asarray(sd[f"enc.{i}.weight"]),
            "bias": jnp.asarray(sd[f"enc.{i}.bias"]),
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
    params["enhance"] = {
        "weight_ih_l0": jnp.asarray(sd["lstm.weight_ih_l0"]),
        "weight_hh_l0": jnp.asarray(sd["lstm.weight_hh_l0"]),
        "bias_ih_l0": jnp.asarray(sd["lstm.bias_ih_l0"]),
        "bias_hh_l0": jnp.asarray(sd["lstm.bias_hh_l0"]),
    }
    params["tranform"] = {
        "weight": jnp.asarray(sd["proj.weight"]),
        "bias": jnp.asarray(sd["proj.bias"]),
    }
    for i in range(n_stage):
        params[f"decoder_{i}_conv"] = {
            "weight": jnp.asarray(sd[f"dec.{i}.weight"]),
            "bias": jnp.asarray(sd[f"dec.{i}.bias"]),
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
