"""Streaming (chunk-vectorized) CRN inference.

The real-valued counterpart of ``StreamingDCCRN`` (see
se_tpu/models/streaming.py for the pipeline design): causal encoder conv
caches, LSTM hidden state, decoder pending-frame caches (one-frame latency
per stage from the reference's first-output trim, models.py:494), skip
delay queues, a spectrum queue for magnitude masking with the noisy phase,
and a sample tail for stateful STFT framing.

Shares the parameter tree of ``CRN``; checkpoints stream unchanged.
Interior frames match the batch forward exactly, and ``flush_stream``
emits the final ``n_stages`` frames at end of stream — whole-utterance
exactness vs the batch forward (tests/test_streaming.py, round 5).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .crn import CRN
from ..dsp import conv_istft


class StreamingCRN(CRN):
    """Chunk-streaming forward; parameters identical to CRN."""

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
            jnp.zeros((batch, self.kernel_num[i] // 2, enc_freqs[i], 1))
            for i in range(n_stage)
        ]
        dec_prev = []
        f = self.fft_len // (2 ** len(self.kernel_num))
        for i in range(n_stage):
            ch = self.kernel_num[n_stage - i]
            if not c.skip_type:
                ch //= 2
            dec_prev.append(jnp.zeros((batch, ch, f, 1)))
            f *= 2
        skip_buf = []
        for i in range(n_stage):
            fi = enc_freqs[n_stage - 1 - i] // 2
            skip_buf.append(
                jnp.zeros(
                    (batch, self.kernel_num[n_stage - i] // 2, fi, max(i, 1))
                )
            )
        spec_buf = jnp.zeros((batch, self.fft_len + 2, n_stage + 1))
        units = c.crn.rnn_units // 2
        lstm_state = [
            (jnp.zeros((batch, units)), jnp.zeros((batch, units)))
        ]
        tail = jnp.zeros((batch, self.win_len - self.win_inc))
        return {
            "enc_prev": enc_prev,
            "dec_prev": dec_prev,
            "skip_buf": skip_buf,
            "spec_buf": spec_buf,
            "lstm": tuple(lstm_state),
            "tail": tail,
        }

    def __call__(self, inputs: jnp.ndarray, state: Optional[dict] = None):
        """[B, L] waveform chunk -> ([B, fft_len+2, T] enhanced spectrum
        frames (n_stages-frame latency), new state).

        Chunk-vectorized like ``StreamingDCCRN``: only the LSTM is
        sequential; encoder/decoder convs and the magnitude masking
        process the chunk's T frames at once, with the carried caches
        providing exactness vs the per-frame pipeline."""
        c = self.cfg
        n_stage = self.n_stages
        B = inputs.shape[0]
        if state is None:
            state = self.init_stream_state(B)

        from ..dsp.stft import _frame

        sig = jnp.concatenate([state["tail"], inputs], axis=-1)
        frames = _frame(sig, self.win_len, self.win_inc)
        specs = jnp.einsum(
            "btn,nf->bft", frames, self.stft_kernels.fwd,
            precision=jax.lax.Precision.HIGHEST,
        )
        tail = sig[:, -(self.win_len - self.win_inc):]
        dim = self.fft_len // 2 + 1
        T = specs.shape[-1]
        if T == 0:
            # chunk too short to complete a frame: samples are absorbed
            # into the tail, nothing else advances (static shape -> this
            # branch resolves at trace time)
            return specs, dict(state, tail=tail)

        real = specs[:, :dim]
        imag = specs[:, dim:]
        mags_t = jnp.sqrt(real**2 + imag**2)
        x = mags_t[:, None, 1:, :]  # [B, 1, F, T]

        enc_prev = list(state["enc_prev"])
        out = x
        skips = []
        for i, (conv, bn, act) in enumerate(
            zip(self.encoder, self.encoder_bn, self.encoder_act)
        ):
            inp = jnp.concatenate([enc_prev[i], out], axis=-1)
            enc_prev[i] = out[..., -1:]
            y = conv(inp)[..., -T:]
            y = act(bn(y, train=False))
            out = y
            skips.append(y)

        Bc, C, D, _ = out.shape
        lstm_states = list(state["lstm"])
        seq = jnp.transpose(out, (3, 0, 1, 2)).reshape(T, Bc, C * D)
        y, lstm_states = self.enhance_lstm(
            seq, state=lstm_states, return_state=True
        )
        y = self.tranform(y)
        cur = jnp.transpose(y.reshape(T, Bc, C, D), (1, 2, 3, 0))

        dec_prev = list(state["dec_prev"])
        skip_buf = list(state["skip_buf"])
        for i in range(n_stage):
            skip = skips[n_stage - 1 - i]
            if i == 0:
                delayed_skip = skip
            else:
                cat = jnp.concatenate([skip_buf[i], skip], axis=-1)
                delayed_skip = cat[..., :T]
                skip_buf[i] = cat[..., -i:]
            d_in = (
                jnp.concatenate([cur, delayed_skip], axis=1)
                if c.skip_type
                else cur
            )
            inp = jnp.concatenate([dec_prev[i], d_in], axis=-1)
            dec_prev[i] = d_in[..., -1:]
            y = self.decoder[i](inp)[..., 1 : T + 1]
            if self.decoder_bn[i] is not None:
                y = self.decoder_act[i](self.decoder_bn[i](y, train=False))
            cur = y

        cat = jnp.concatenate([state["spec_buf"], specs], axis=-1)
        old_spec = cat[..., 1 : T + 1]
        spec_buf = cat[..., -(n_stage + 1):]
        out_specs = self._apply_mask(cur, old_spec)

        new_state = {
            "enc_prev": enc_prev,
            "dec_prev": dec_prev,
            "skip_buf": skip_buf,
            "spec_buf": spec_buf,
            "lstm": tuple(lstm_states),
            "tail": tail,
        }
        return out_specs, new_state

    def _apply_mask(self, cur, old_spec):
        """Tanh-magnitude mask with the noisy phase (models/crn.py;
        reference models.py:521-524) over ``old_spec`` columns."""
        dim = self.fft_len // 2 + 1
        o_real = old_spec[:, :dim]
        o_imag = old_spec[:, dim:]
        mags = jnp.sqrt(o_real**2 + o_imag**2)
        phase = jnp.arctan2(o_imag, o_real)
        out_mag = jnp.pad(cur[:, 0], ((0, 0), (1, 0), (0, 0)))
        est_mags = jnp.tanh(out_mag) * mags
        out_real = est_mags * jnp.cos(phase)
        out_imag = est_mags * jnp.sin(phase)
        return jnp.concatenate([out_real, out_imag], axis=1)

    def flush_stream(self, state: dict) -> jnp.ndarray:
        """Exact end-of-stream decoder flush — the real-valued mirror of
        ``StreamingDCCRN.flush_stream`` (see its docstring for the
        cascade derivation).  Returns [B, fft_len+2, n_stages] frames:
        the batch forward's final ``n_stages`` output frames."""
        c = self.cfg
        n_stage = self.n_stages
        dec_prev = state["dec_prev"]
        skip_buf = state["skip_buf"]

        cols = None
        for i in range(n_stage):
            if i == 0:
                inp = dec_prev[0]
            else:
                d_in = (
                    jnp.concatenate([cols, skip_buf[i][..., :i]], axis=1)
                    if c.skip_type
                    else cols
                )
                inp = jnp.concatenate([dec_prev[i], d_in], axis=-1)
            y = self.decoder[i](inp)[..., 1:]
            if self.decoder_bn[i] is not None:
                y = self.decoder_act[i](self.decoder_bn[i](y, train=False))
            cols = y

        return self._apply_mask(cols, state["spec_buf"][..., 1:])

    def synthesize(self, out_specs: jnp.ndarray) -> jnp.ndarray:
        wav = conv_istft(out_specs, self.stft_kernels)[:, 0]
        return jnp.clip(wav, -1.0, 1.0)
