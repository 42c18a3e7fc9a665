"""Streaming (frame-by-frame) DCCRN inference.

The reference handles "online" processing only algorithmically (causal
convs, FullSubNet cumulative norms); there is no streaming executor
(SURVEY.md section 5).  This module is the idiomatic JAX expression of
that capability for DCCRN: a ``lax.scan`` over STFT frames carrying

* one previous-frame cache per causal encoder conv (time kernel 2),
* the complex-LSTM hidden/cell states,
* one pending-frame cache per decoder transposed conv — each decoder
  stage consumes one FUTURE frame (the reference trims the first
  transposed-conv output, models.py:226), so the pipeline has a fixed
  algorithmic latency of ``n_stages`` frames (60 ms at hop 100),
* per-stage skip-connection delay queues aligning encoder outputs with
  the lagged decoder timeline,
* a spec-frame queue so masks multiply the spectrum frame they belong to.

``StreamingDCCRN`` shares the parameter tree of ``DCCRN`` (identical
module names), so checkpoints trained with the batch model stream
unchanged.  Interior frames match the batch forward exactly
(tests/test_streaming.py); the final ``n_stages`` frames of an utterance
differ (the batch version ends the sequence, the stream keeps pipelining).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from .dccrn import DCCRN
from .layers import complex_cat
from ..dsp import conv_istft


class StreamingDCCRN(DCCRN):
    """Frame-streaming forward; parameters identical to DCCRN."""

    @property
    def n_stages(self) -> int:
        return len(self.kernel_num) - 1

    def init_stream_state(self, batch: int):
        c = self.cfg
        n_stage = self.n_stages
        F = self.fft_len // 2  # after DC drop

        enc_freqs = []
        f = F
        for _ in range(n_stage):
            enc_freqs.append(f)
            f //= 2
        enc_prev = [
            jnp.zeros((batch, self.kernel_num[i], enc_freqs[i], 1))
            for i in range(n_stage)
        ]
        # decoder stage i input: [out(+skip)] at freq hidden_dim * 2^i
        dec_prev = []
        f = self.hidden_dim
        for i in range(n_stage):
            ch = self.kernel_num[n_stage - i] * (2 if c.skip_type else 1)
            dec_prev.append(jnp.zeros((batch, ch, f, 1)))
            f *= 2
        # skip queue for decoder stage i: encoder output (n_stage-1-i),
        # delayed i frames
        skip_buf = []
        for i in range(n_stage):
            fi = enc_freqs[n_stage - 1 - i] // 2
            skip_buf.append(
                jnp.zeros(
                    (batch, self.kernel_num[n_stage - i], fi, max(i, 1))
                )
            )
        spec_buf = jnp.zeros((batch, self.fft_len + 2, n_stage + 1))

        if c.lstm == "complex":
            units = c.dccrn.rnn_units // 2
            lstm_state = tuple(
                (
                    jnp.zeros((2, 2 * batch, units)),
                    jnp.zeros((2, 2 * batch, units)),
                )
                for _ in range(c.dccrn.rnn_layers)
            )
        else:
            # TorchLSTM bottleneck: 2 layers of (h, c) (models/dccrn.py)
            lstm_state = tuple(
                (
                    jnp.zeros((batch, c.dccrn.rnn_units)),
                    jnp.zeros((batch, c.dccrn.rnn_units)),
                )
                for _ in range(2)
            )
        # sample tail for stateful framing; a fresh stream starts with the
        # conv-STFT's win_len - hop left zero-padding
        tail = jnp.zeros((batch, self.win_len - self.win_inc))
        return {
            "enc_prev": enc_prev,
            "dec_prev": dec_prev,
            "skip_buf": skip_buf,
            "spec_buf": spec_buf,
            "lstm": lstm_state,
            "tail": tail,
        }

    def __call__(self, inputs: jnp.ndarray, state: Optional[dict] = None):
        """Streaming forward over a waveform chunk.

        Args:
          inputs: [B, L] waveform chunk.
          state: stream state from the previous chunk (None = fresh).

        Returns:
          (out_spec, new_state): [B, fft_len+2, T] enhanced spectrum
          frames, delayed ``n_stages`` frames relative to the input.
        """
        c = self.cfg
        n_stage = self.n_stages
        B = inputs.shape[0]
        if state is None:
            state = self.init_stream_state(B)

        # stateful framing: frames span [tail || chunk]; the new tail is the
        # trailing win_len - hop samples.  A stream therefore emits exactly
        # chunk_len / hop frames per chunk, identical to the interior frames
        # of a whole-utterance conv-STFT.
        from ..dsp.stft import _frame

        sig = jnp.concatenate([state["tail"], inputs], axis=-1)
        frames = _frame(sig, self.win_len, self.win_inc)  # [B, T, win]
        specs = jnp.einsum(
            "btn,nf->bft", frames, self.stft_kernels.fwd,
            precision=jax.lax.Precision.HIGHEST,
        )
        state = dict(state, tail=sig[:, -(self.win_len - self.win_inc):])
        dim = self.fft_len // 2 + 1

        def step(st, spec_t):
            real = spec_t[:, :dim]
            imag = spec_t[:, dim:]
            x = jnp.stack([real, imag], 1)[:, :, 1:, None]  # [B, 2, F, 1]

            enc_prev = list(st["enc_prev"])
            out = x
            skips = []
            for i, (conv, bn, act) in enumerate(
                zip(self.encoder, self.encoder_bn, self.encoder_act)
            ):
                # causal time kernel 2: feed (prev, cur), keep last column
                inp2 = jnp.concatenate([enc_prev[i], out], axis=-1)
                enc_prev[i] = out
                y = conv(inp2)[..., -1:]
                y = act(bn(y, train=False))
                out = y
                skips.append(y)

            # bottleneck RNN, one timestep with carried state
            Bc, C, D, _ = out.shape
            lstm_states = list(st["lstm"])
            if c.lstm == "complex":
                xr = out[:, : C // 2, :, 0].reshape(Bc, -1)[None]
                xi = out[:, C // 2 :, :, 0].reshape(Bc, -1)[None]
                for li, rnn in enumerate(self.enhance):
                    (xr, xi), lstm_states[li] = rnn(
                        [xr, xi], state=lstm_states[li], return_state=True
                    )
                xr = xr[0].reshape(Bc, C // 2, D, 1)
                xi = xi[0].reshape(Bc, C // 2, D, 1)
                cur = jnp.concatenate([xr, xi], axis=1)
            else:
                # real-LSTM bottleneck (reference models.py:96-105):
                # flatten [C, D], 2-layer LSTM + Linear, one timestep
                x1 = out[..., 0].reshape(Bc, C * D)[None]
                y, lstm_states = self.enhance_lstm(
                    x1, state=lstm_states, return_state=True
                )
                y = self.tranform(y)
                cur = y[0].reshape(Bc, C, D, 1)

            # decoder pipeline: stage i emits frame t-1 of its own timeline
            dec_prev = list(st["dec_prev"])
            skip_buf = list(st["skip_buf"])
            for i in range(n_stage):
                skip = skips[n_stage - 1 - i]
                if i == 0:
                    delayed_skip = skip
                else:
                    delayed_skip = skip_buf[i][..., 0:1]
                    skip_buf[i] = jnp.concatenate(
                        [skip_buf[i][..., 1:], skip], axis=-1
                    )
                d_in = (
                    complex_cat([cur, delayed_skip], 1)
                    if c.skip_type
                    else cur
                )
                inp2 = jnp.concatenate([dec_prev[i], d_in], axis=-1)
                dec_prev[i] = d_in
                # transposed conv over 2 frames -> 3 columns; column 1 is
                # the reference's trimmed output for the earlier frame
                y = self.decoder[i](inp2)[..., 1:2]
                if self.decoder_bn[i] is not None:
                    y = self.decoder_act[i](self.decoder_bn[i](y, train=False))
                cur = y

            # mask the spectrum frame from n_stage steps ago
            spec_buf = jnp.concatenate(
                [st["spec_buf"][..., 1:], spec_t[..., None]], axis=-1
            )
            old_spec = spec_buf[..., 0]
            o_real = old_spec[:, :dim]
            o_imag = old_spec[:, dim:]
            mags = jnp.sqrt(o_real**2 + o_imag**2 + 1e-8)
            phase = jnp.arctan2(o_imag, o_real)

            mask_real = jnp.pad(cur[:, 0, :, 0], ((0, 0), (1, 0)))
            mask_imag = jnp.pad(cur[:, 1, :, 0], ((0, 0), (1, 0)))
            if self.masking_mode == "E":
                mask_mags = (mask_real**2 + mask_imag**2) ** 0.5
                rp = mask_real / (mask_mags + 1e-8)
                ip = mask_imag / (mask_mags + 1e-8)
                mask_phase = jnp.arctan2(ip, rp)
                est_mags = jnp.tanh(mask_mags) * mags
                est_phase = phase + mask_phase
                out_real = est_mags * jnp.cos(est_phase)
                out_imag = est_mags * jnp.sin(est_phase)
            elif self.masking_mode == "C":
                out_real = o_real * mask_real - o_imag * mask_imag
                out_imag = o_real * mask_imag + o_imag * mask_real
            elif self.masking_mode == "R":
                out_real = o_real * mask_real
                out_imag = o_imag * mask_imag
            else:
                raise ValueError(
                    f"streaming supports E/C/R masks, got {self.masking_mode!r}"
                )
            out_spec = jnp.concatenate([out_real, out_imag], axis=1)

            new_st = {
                "enc_prev": enc_prev,
                "dec_prev": dec_prev,
                "skip_buf": skip_buf,
                "spec_buf": spec_buf,
                "lstm": tuple(lstm_states),
            }
            return new_st, out_spec

        tail = state["tail"]
        scan_state = {k: v for k, v in state.items() if k != "tail"}
        scan_state, out_specs = lax.scan(
            step, scan_state, jnp.moveaxis(specs, -1, 0)
        )
        out_specs = jnp.moveaxis(out_specs, 0, -1)  # [B, F2, T]
        return out_specs, dict(scan_state, tail=tail)

    def synthesize(self, out_specs: jnp.ndarray) -> jnp.ndarray:
        """OLA synthesis of collected enhanced spectrum frames."""
        wav = conv_istft(out_specs, self.stft_kernels)[:, 0]
        return jnp.clip(wav, -1.0, 1.0)
