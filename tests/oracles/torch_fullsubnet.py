"""Torch oracle of the FullSubNet forward pass for golden parity testing.

Re-states the reference's *semantics* (models.py:568-672 +
tools_for_model.py:726-795 SequenceModel, :806-837 unfold, :997-1012
offline_laplace_norm) in an independent torch implementation.  Test-only:
used to verify the JAX model numerically under identical weights.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class OracleSequenceModel(nn.Module):
    """Stacked LSTM/GRU + Linear + optional activation over [B, F, T]
    (reference: tools_for_model.py:726-795)."""

    def __init__(self, input_size, output_size, hidden_size, num_layers=2,
                 sequence_model="LSTM", output_activate_function=None,
                 dropout=0.8):
        super().__init__()
        rnn_cls = {"LSTM": nn.LSTM, "GRU": nn.GRU}[sequence_model]
        self.sequence_model = rnn_cls(
            input_size=input_size, hidden_size=hidden_size,
            num_layers=num_layers, batch_first=True, bidirectional=False,
            dropout=dropout,
        )
        self.fc_output_layer = nn.Linear(hidden_size, output_size)
        self.activate = {
            None: None,
            "Tanh": torch.tanh,
            "ReLU": torch.relu,
            "ReLU6": lambda x: torch.clamp(x, 0.0, 6.0),
        }[output_activate_function]

    def forward(self, x):
        x = x.permute(0, 2, 1).contiguous()  # [B, F, T] -> [B, T, F]
        o, _ = self.sequence_model(x)
        o = self.fc_output_layer(o)
        if self.activate is not None:
            o = self.activate(o)
        return o.permute(0, 2, 1).contiguous()


def oracle_unfold(x: torch.Tensor, num_neighbor: int) -> torch.Tensor:
    """Sub-band split along frequency (reference: tools_for_model.py:806-837).
    [B, C, F, T] -> [B, F, C, 2n+1, T]."""
    B, C, Fq, T = x.shape
    if num_neighbor < 1:
        return x.permute(0, 2, 1, 3).reshape(B, Fq, C, 1, T)
    out = x.reshape(B * C, 1, Fq, T)
    size = num_neighbor * 2 + 1
    out = F.pad(out, [0, 0, num_neighbor, num_neighbor], mode="reflect")
    out = F.unfold(out, (size, T))
    out = out.reshape(B, C, size, T, Fq)
    return out.permute(0, 4, 1, 2, 3).contiguous()


def offline_laplace_norm(x: torch.Tensor) -> torch.Tensor:
    """reference: tools_for_model.py:997-1012."""
    mu = torch.mean(x, dim=tuple(range(1, x.dim())), keepdim=True)
    return x / (mu + 1e-5)


class OracleFullSubNet(nn.Module):
    """Full-band / sub-band fusion predicting a [B, F, T, 2] cRM
    (reference: models.py:568-672)."""

    def __init__(self, num_freqs=257, look_ahead=2, sb_num_neighbors=15,
                 fb_num_neighbors=0, fb_hidden=512, sb_hidden=384,
                 sequence_model="LSTM", fb_activate="ReLU", sb_activate=None,
                 dropout=0.8):
        super().__init__()
        self.fb_model = OracleSequenceModel(
            num_freqs, num_freqs, fb_hidden, 2, sequence_model, fb_activate,
            dropout=dropout,
        )
        self.sb_model = OracleSequenceModel(
            (sb_num_neighbors * 2 + 1) + (fb_num_neighbors * 2 + 1),
            2, sb_hidden, 2, sequence_model, sb_activate,
            dropout=dropout,
        )
        self.sb_num_neighbors = sb_num_neighbors
        self.fb_num_neighbors = fb_num_neighbors
        self.look_ahead = look_ahead

    def forward(self, noisy_mag):
        if noisy_mag.dim() == 3:
            noisy_mag = noisy_mag.unsqueeze(1)
        noisy_mag = F.pad(noisy_mag, [0, self.look_ahead])
        B, C, Fq, T = noisy_mag.shape

        fb_in = offline_laplace_norm(noisy_mag).reshape(B, C * Fq, T)
        fb_out = self.fb_model(fb_in).reshape(B, 1, Fq, T)

        fb_unf = oracle_unfold(fb_out, self.fb_num_neighbors).reshape(
            B, Fq, self.fb_num_neighbors * 2 + 1, T
        )
        mag_unf = oracle_unfold(noisy_mag, self.sb_num_neighbors).reshape(
            B, Fq, self.sb_num_neighbors * 2 + 1, T
        )
        sb_in = offline_laplace_norm(torch.cat([mag_unf, fb_unf], dim=2))
        sb_in = sb_in.reshape(
            B * Fq,
            (self.sb_num_neighbors * 2 + 1) + (self.fb_num_neighbors * 2 + 1),
            T,
        )
        sb_mask = self.sb_model(sb_in)
        sb_mask = (
            sb_mask.reshape(B, Fq, 2, T).permute(0, 2, 1, 3).contiguous()
        )
        out = sb_mask[:, :, :, self.look_ahead:]
        return out.permute(0, 2, 3, 1)  # [B, F, T, 2]


def export_params_to_jax(model: "OracleFullSubNet") -> dict:
    """Map oracle weights onto the se_tpu FullSubNet parameter tree."""
    import jax.numpy as jnp

    # .copy(): torch shares .numpy() memory and JAX CPU can zero-copy it,
    # so without a copy later in-place optimiser steps would mutate the
    # "exported" jax arrays (trajectory tests export before training)
    sd = {k: v.detach().numpy().copy()
          for k, v in model.state_dict().items()}

    def seq(prefix):
        rnn = {}
        for k, v in sd.items():
            if k.startswith(f"{prefix}.sequence_model."):
                rnn[k.split(".")[-1]] = jnp.asarray(v)
        return {
            "sequence_model": rnn,
            "fc_output_layer": {
                "weight": jnp.asarray(sd[f"{prefix}.fc_output_layer.weight"]),
                "bias": jnp.asarray(sd[f"{prefix}.fc_output_layer.bias"]),
            },
        }

    return {"params": {"fb_model": seq("fb_model"), "sb_model": seq("sb_model")}}
