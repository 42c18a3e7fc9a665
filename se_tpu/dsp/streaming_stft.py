"""Streaming (chunked) analysis for the framework-STFT path.

``dsp.stft.stft`` matches ``torch.stft`` semantics (center=True: reflect
pad ``n_fft//2`` both sides) over a whole utterance.  This module produces
the IDENTICAL frame stream from waveform chunks with carried state, so a
chunk-streaming model (e.g. ``StreamingFullSubNet``) can consume frames
with bounded latency instead of waiting for the full wav.

The reference has no streaming executor (its FullSubNet features are
computed whole-utterance in the trainer, reference: trainer.py:100-103);
this is the TPU-native expression of the same analysis with carried state.

Exactness: pushing a waveform in arbitrary chunk sizes and concatenating
the emitted frames equals ``stft(whole_wav)`` frame-for-frame — the left
reflect pad is taken from the first chunk, the right reflect pad from the
carried tail at ``flush``.  Frame count is ``L // hop + 1``, torch's
center=True count (``tests/test_streaming_stft.py``).

State is a dict of arrays; with chunk sizes that are a multiple of the
hop, the carried buffer shape is constant after the first push, so a
jitted push compiles once.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .stft import _centered_window, _frame


class StreamingStft:
    """Chunked torch.stft-equivalent analysis with carried sample state."""

    def __init__(self, n_fft: int = 512, hop: int = 300, win_len: int = 400):
        self.n_fft = n_fft
        self.hop = hop
        self.win_len = win_len
        self.pad = n_fft // 2
        self.window = jnp.asarray(_centered_window(win_len, n_fft))

    def _emit(self, buf: jnp.ndarray):
        """Frame every complete window in ``buf``; return the frames and
        the unconsumed sample remainder."""
        n = buf.shape[-1]
        m = (n - self.n_fft) // self.hop + 1 if n >= self.n_fft else 0
        if m <= 0:
            B = buf.shape[0]
            empty = jnp.zeros(
                (B, self.n_fft // 2 + 1, 0), dtype=jnp.complex64
            )
            return empty, buf
        frames = _frame(
            buf[:, : (m - 1) * self.hop + self.n_fft], self.n_fft, self.hop
        )
        frames = frames * self.window[None, None, :]
        spec = jnp.swapaxes(jnp.fft.rfft(frames, n=self.n_fft), -1, -2)
        return spec, buf[:, m * self.hop :]

    def push(self, chunk: jnp.ndarray, state: Optional[dict] = None):
        """Feed a chunk of raw samples.

        Args:
          chunk: [B, c] waveform samples (the first chunk must have
            ``c > n_fft // 2`` so the reflect pad is available).
          state: carried state from the previous push (None = stream start).

        Returns:
          (spec, state): [B, F, k] complex frames ready so far (k may be 0)
          and the new carried state.
        """
        if chunk.ndim == 1:
            chunk = chunk[None]
        if state is None:
            if chunk.shape[-1] <= self.pad:
                raise ValueError(
                    f"first chunk must exceed {self.pad} samples for the "
                    "reflect pad (torch.stft center=True semantics)"
                )
            left = chunk[:, 1 : self.pad + 1][:, ::-1]
            buf = jnp.concatenate([left, chunk], axis=-1)
            tail = chunk[:, -(self.pad + 1) :]
        else:
            buf = jnp.concatenate([state["buf"], chunk], axis=-1)
            tail = jnp.concatenate([state["tail"], chunk], axis=-1)[
                :, -(self.pad + 1) :
            ]
        spec, buf = self._emit(buf)
        return spec, {"buf": buf, "tail": tail}

    def flush(self, state: dict) -> jnp.ndarray:
        """End of stream: emit the trailing frames over the right reflect
        pad.  Concatenated with the pushed frames, the stream totals
        ``L // hop + 1`` frames, identical to ``stft`` on the whole wav."""
        right = state["tail"][:, :-1][:, ::-1]
        spec, _ = self._emit(
            jnp.concatenate([state["buf"], right], axis=-1)
        )
        return spec
