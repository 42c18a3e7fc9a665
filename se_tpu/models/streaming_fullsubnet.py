"""Streaming (chunk-by-chunk) FullSubNet inference.

The reference's FullSubNet is causal-by-construction apart from a 2-frame
look-ahead (models.py:640, config.py:74): the RNNs are unidirectional, the
frequency unfold is per-frame, and the ``cumulative_*`` norms are prefix
statistics (tools_for_model.py:1014-1104).  There is no streaming executor
in the reference; this module is the TPU-native expression of that
capability, mirroring what ``streaming.py`` does for DCCRN.

Because every stage is either per-frame or a carried recurrence, streaming
processes WHOLE CHUNKS vectorised — no per-frame python loop.  The carried
state is just:

* running (sum [, power-sum], entry-count) per cumulative-norm site,
* fullband RNN layer states,
* subband RNN layer states (batch B*F),
* a ``look_ahead``-deep noisy-spectrum delay queue for mask application.

The mask emitted at input-frame index ``t`` is the cRM for frame
``t - look_ahead``; interior frames match the batch forward exactly
(tests/test_streaming_fullsubnet.py).  Requires a ``cumulative_*`` norm —
the offline norms are utterance-level statistics with no causal form.

``StreamingFullSubNet`` shares FullSubNet's parameter tree (identical
module names), so trained checkpoints stream unchanged.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..ops.cirm import decompress_cIRM
from ..ops.norms import stream_norm_wrapper
from ..ops.unfold import unfold
from .fullsubnet import FullSubNet


class StreamingFullSubNet(FullSubNet):
    """Chunk-streaming forward; parameters identical to FullSubNet."""

    def init_stream_state(self, batch: int):
        c = self.cfg
        fsn = c.fullsubnet
        F = c.stft.num_freqs
        _, init_carry = stream_norm_wrapper(fsn.norm_type)

        def rnn_state(n_batch, hidden):
            if c.sequence_model == "LSTM":
                return [
                    (
                        jnp.zeros((n_batch, hidden)),
                        jnp.zeros((n_batch, hidden)),
                    )
                    for _ in range(2)
                ]
            return [jnp.zeros((n_batch, hidden)) for _ in range(2)]

        return {
            "norm_fb": init_carry(batch * 1),
            "norm_sb": init_carry(batch * F),
            "fb_rnn": rnn_state(batch, fsn.fb_model_hidden_size),
            "sb_rnn": rnn_state(batch * F, fsn.sb_model_hidden_size),
            # noisy spectrum delay queue (real, imag): masks lag look_ahead
            "spec_buf": jnp.zeros((batch, F, fsn.look_ahead, 2)),
        }

    def __call__(self, noisy_mag: jnp.ndarray, state: Optional[dict] = None,
                 train: bool = False):
        """Streaming forward over a chunk of magnitude frames.

        Args:
          noisy_mag: [B, F, Tc] chunk of noisy magnitudes.
          state: stream state from the previous chunk (None = fresh).

        Returns:
          (cRM, new_state): [B, F, Tc, 2] compressed mask frames; the mask
          at chunk index t applies to input frame ``t - look_ahead`` of the
          stream's global timeline (the first ``look_ahead`` masks of a
          fresh stream correspond to the batch model's cropped warm-up).
        """
        del train  # inference-only path
        B, F, Tc = noisy_mag.shape
        if state is None:
            state = self.init_stream_state(B)
        norm_fn, _ = stream_norm_wrapper(self.cfg.fullsubnet.norm_type)

        x = noisy_mag[:, None]  # [B, 1, F, Tc]
        fb_in, norm_fb = norm_fn(x, state["norm_fb"])
        fb_out, fb_rnn = self.fb_model(
            fb_in.reshape(B, F, Tc),
            state=state["fb_rnn"],
            return_state=True,
        )
        fb_out = fb_out.reshape(B, 1, F, Tc)

        fb_unf = unfold(fb_out, self.fb_num_neighbors).reshape(
            B, F, self.fb_num_neighbors * 2 + 1, Tc
        )
        mag_unf = unfold(x, self.sb_num_neighbors).reshape(
            B, F, self.sb_num_neighbors * 2 + 1, Tc
        )
        sb_in = jnp.concatenate([mag_unf, fb_unf], axis=2)
        sb_in, norm_sb = norm_fn(sb_in, state["norm_sb"])
        sb_in = sb_in.reshape(
            B * F,
            (self.sb_num_neighbors * 2 + 1) + (self.fb_num_neighbors * 2 + 1),
            Tc,
        )
        sb_mask, sb_rnn = self.sb_model(
            sb_in, state=state["sb_rnn"], return_state=True
        )
        cRM = jnp.transpose(sb_mask.reshape(B, F, 2, Tc), (0, 1, 3, 2))

        new_state = dict(
            state, norm_fb=norm_fb, norm_sb=norm_sb,
            fb_rnn=fb_rnn, sb_rnn=sb_rnn,
        )
        return cRM, new_state

    def enhance_chunk(self, noisy_complex: jnp.ndarray,
                      state: Optional[dict] = None):
        """Mask a chunk of noisy STFT frames with the look-ahead delay
        handled internally (reference decode: trainer.py:341-345).

        Args:
          noisy_complex: [B, F, Tc] complex noisy spectrum frames.
          state: stream state (None = fresh).

        Returns:
          (enhanced_complex, new_state): [B, F, Tc] enhanced frames,
          delayed ``look_ahead`` frames relative to the input (a fresh
          stream's first ``look_ahead`` outputs are zeros).
        """
        B, F, Tc = noisy_complex.shape
        la = self.look_ahead
        cRM, state = self(jnp.abs(noisy_complex), state)
        cRM = decompress_cIRM(cRM)  # [B, F, Tc, 2]

        spec = jnp.stack(
            (jnp.real(noisy_complex), jnp.imag(noisy_complex)), axis=-1
        )  # [B, F, Tc, 2]
        queued = jnp.concatenate([state["spec_buf"], spec], axis=2)
        delayed, spec_buf = queued[:, :, :Tc], queued[:, :, Tc:]

        nr, ni = delayed[..., 0], delayed[..., 1]
        er = cRM[..., 0] * nr - cRM[..., 1] * ni
        ei = cRM[..., 1] * nr + cRM[..., 0] * ni
        # fresh-stream warm-up: masks for global frames < 0 are meaningless
        return er + 1j * ei, dict(state, spec_buf=spec_buf)
