"""Streaming (chunk-vectorized) DCCRN inference.

The reference handles "online" processing only algorithmically (causal
convs, FullSubNet cumulative norms); there is no streaming executor
(SURVEY.md section 5).  This module is the idiomatic JAX expression of
that capability for DCCRN: a chunk-vectorized forward (only the LSTM
scans; convs and masking process the chunk's frames at once) carrying

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
unchanged.  Interior frames match the batch forward exactly, and
``flush_stream`` emits the decoder cascade's final ``n_stages`` frames
at end of stream, so a finished utterance matches the batch forward
over its WHOLE length (tests/test_streaming.py; round 5 — the previous
zero-feed approximation cost ~0.6-1.0 PESQ on trained models' tails).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .dccrn import DCCRN
from .layers import complex_cat
from ..dsp import conv_istft


class StreamingDCCRN(DCCRN):
    """Chunk-streaming forward; parameters identical to DCCRN."""

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

        Chunk-vectorized: only the LSTM bottleneck is inherently
        sequential, so the encoder convs, decoder transposed convs and the
        masking process all of the chunk's frames at once — the carried
        caches (one previous frame per causal encoder conv, one pending
        frame per decoder stage, i-frame skip delays, an n_stages spectrum
        delay) make each the exact sequence-form of the per-frame pipeline
        this replaces (round-3: the per-frame ``lax.scan`` over the whole
        model was dispatch-bound; see docs/PERF.md streaming section).

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
        tail = sig[:, -(self.win_len - self.win_inc):]
        dim = self.fft_len // 2 + 1
        T = specs.shape[-1]
        if T == 0:
            # chunk too short to complete a frame: samples are absorbed
            # into the tail, nothing else advances (shape is static, so
            # this branch resolves at trace time)
            return specs, dict(state, tail=tail)

        real = specs[:, :dim]
        imag = specs[:, dim:]
        x = jnp.stack([real, imag], 1)[:, :, 1:, :]  # [B, 2, F, T]

        # -- encoder: whole chunk per stage; cache = last input frame ----
        enc_prev = list(state["enc_prev"])
        out = x
        skips = []
        for i, (conv, bn, act) in enumerate(
            zip(self.encoder, self.encoder_bn, self.encoder_act)
        ):
            # causal time kernel 2 + internal left pad: prepend the cached
            # frame and drop the pad-born first column -> T causal outputs
            inp = jnp.concatenate([enc_prev[i], out], axis=-1)
            enc_prev[i] = out[..., -1:]
            y = conv(inp)[..., -T:]
            y = act(bn(y, train=False))
            out = y
            skips.append(y)

        # -- bottleneck RNN: the only sequential part -------------------
        Bc, C, D, _ = out.shape
        lstm_states = list(state["lstm"])
        seq = jnp.transpose(out, (3, 0, 1, 2))  # [T, B, C, D]
        if c.lstm == "complex":
            xr = seq[:, :, : C // 2].reshape(T, Bc, -1)
            xi = seq[:, :, C // 2 :].reshape(T, Bc, -1)
            for li, rnn in enumerate(self.enhance):
                (xr, xi), lstm_states[li] = rnn(
                    [xr, xi], state=lstm_states[li], return_state=True
                )
            xr = xr.reshape(T, Bc, C // 2, D)
            xi = xi.reshape(T, Bc, C // 2, D)
            cur = jnp.concatenate([xr, xi], axis=2)
        else:
            # real-LSTM bottleneck (reference models.py:96-105)
            x1 = seq.reshape(T, Bc, C * D)
            y, lstm_states = self.enhance_lstm(
                x1, state=lstm_states, return_state=True
            )
            y = self.tranform(y)
            cur = y.reshape(T, Bc, C, D)
        cur = jnp.transpose(cur, (1, 2, 3, 0))  # [B, C, D, T]

        # -- decoder: whole chunk per stage ------------------------------
        # stage i consumes one future frame (the reference trims the first
        # transposed-conv output, models.py:226): with the cached pending
        # frame prepended, output columns 1..T are exactly the per-frame
        # pipeline's emissions; the skip for stage i is delayed i frames
        # through skip_buf.
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
                complex_cat([cur, delayed_skip], 1)
                if c.skip_type
                else cur
            )
            inp = jnp.concatenate([dec_prev[i], d_in], axis=-1)  # T+1 cols
            dec_prev[i] = d_in[..., -1:]
            y = self.decoder[i](inp)[..., 1 : T + 1]
            if self.decoder_bn[i] is not None:
                y = self.decoder_act[i](self.decoder_bn[i](y, train=False))
            cur = y

        # -- mask the spectrum frames from n_stage steps ago -------------
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
        """Mask ``old_spec`` spectrum columns with the decoder output
        ``cur`` ([B, 2, F, T]) — the batch model's masking math
        (models/dccrn.py; reference models.py:258-276)."""
        dim = self.fft_len // 2 + 1
        o_real = old_spec[:, :dim]
        o_imag = old_spec[:, dim:]
        mags = jnp.sqrt(o_real**2 + o_imag**2 + 1e-8)
        phase = jnp.arctan2(o_imag, o_real)

        mask_real = jnp.pad(cur[:, 0], ((0, 0), (1, 0), (0, 0)))
        mask_imag = jnp.pad(cur[:, 1], ((0, 0), (1, 0), (0, 0)))
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
        return jnp.concatenate([out_real, out_imag], axis=1)

    def flush_stream(self, state: dict) -> jnp.ndarray:
        """Exact end-of-stream decoder flush.

        The batch model's LAST output frame of each transposed-conv
        decoder stage uses only that stage's last INPUT frame (the
        time-kernel-2 conv's tail term; the ``out[..., 1:]`` trim makes
        every other frame consume one future frame — reference
        models.py:226).  The stream therefore still owes ``n_stages``
        final output frames when the input ends: stage 0 owes its tail
        (from its cached pending input column), which cascades — stage i
        receives the i upstream flush columns paired with its i queued
        skip columns, emits them plus its own tail (i+1 columns).  The
        final stage emits the ``n_stages`` mask columns that pair with
        the spectrum queue's most recent entries.

        Returns [B, fft_len+2, n_stages] enhanced spectrum frames —
        exactly the batch forward's final ``n_stages`` frames.
        """
        c = self.cfg
        n_stage = self.n_stages
        dec_prev = state["dec_prev"]
        skip_buf = state["skip_buf"]

        cols = None  # upstream cascade columns (None for stage 0)
        for i in range(n_stage):
            if i == 0:
                inp = dec_prev[0]
            else:
                d_in = (
                    complex_cat([cols, skip_buf[i][..., :i]], 1)
                    if c.skip_type
                    else cols
                )
                inp = jnp.concatenate([dec_prev[i], d_in], axis=-1)
            # conv over i+1 columns -> i+2 raw; dropping the first leaves
            # i regular emissions + the stage's own tail column
            y = self.decoder[i](inp)[..., 1:]
            if self.decoder_bn[i] is not None:
                y = self.decoder_act[i](self.decoder_bn[i](y, train=False))
            cols = y

        # the flush frames mask the most recent n_stages spectrum frames
        return self._apply_mask(cols, state["spec_buf"][..., 1:])

    def synthesize(self, out_specs: jnp.ndarray) -> jnp.ndarray:
        """OLA synthesis of collected enhanced spectrum frames."""
        wav = conv_istft(out_specs, self.stft_kernels)[:, 0]
        return jnp.clip(wav, -1.0, 1.0)
