"""Streaming (chunked) STFT analysis and synthesis with carried state.

``dsp.stft.stft`` matches ``torch.stft`` semantics (center=True: reflect
pad ``n_fft//2`` both sides) over a whole utterance.  ``StreamingStft``
produces the IDENTICAL frame stream from waveform chunks with carried
state, so a chunk-streaming model (e.g. ``StreamingFullSubNet``) can
consume frames with bounded latency instead of waiting for the full wav;
``StreamingIstft`` (torch path) and ``StreamingConvIstft`` (conv-STFT
path, DCCRN/CRN) emit finalized synthesis samples per pushed frame chunk,
so the whole enhance pipeline streams end-to-end.

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

import jax
import jax.numpy as jnp

from .ola import overlap_add
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


def _ola_carry_push(frames, window, hop, state, normalize):
    """Shared OLA carry-emit step for the streaming synthesisers.

    The emission invariant: once frame ``t`` is added, no later frame
    (which starts at ``(t+1)*hop``) can touch samples below ``(t+1)*hop``,
    so both the overlap-add numerator and the window-squared envelope for
    those samples are final.  ``frames`` is [B, k, win] already windowed;
    ``normalize(acc, env)`` applies the path's envelope division.  Returns
    ([B, k*hop] finalized samples, new {acc, env} state).
    """
    B, k, win = frames.shape
    carry_len = win - hop
    out = overlap_add(frames, hop)  # [B, (k-1)*hop + win]
    env = overlap_add(
        jnp.broadcast_to((window**2)[None, None, :], (1, k, win)), hop
    )
    if state is not None:
        out = out.at[:, :carry_len].add(state["acc"])
        env = env.at[:, :carry_len].add(state["env"])
    emit = k * hop
    y = normalize(out[:, :emit], env[:, :emit])
    return y, {"acc": out[:, emit:], "env": env[:, emit:]}


def _ola_empty_push(batch, win, hop, state):
    """k == 0 push: nothing to emit; materialize a fresh empty state."""
    if state is None:
        state = {
            "acc": jnp.zeros((batch, win - hop)),
            "env": jnp.zeros((1, win - hop)),
        }
    return jnp.zeros((batch, 0)), state


class StreamingIstft:
    """Chunked torch.istft-equivalent synthesis with carried OLA state.

    Pushing frame chunks emits ``hop`` samples per frame (the
    ``_ola_carry_push`` invariant) — the emitted stream equals
    ``dsp.stft.istft``'s UNTRIMMED synthesis sample-for-sample.  The
    caller slices ``[n_fft//2 : n_fft//2 + L]`` off the concatenated
    stream exactly as ``istft(..., length=L)`` does (that trim spans
    chunk boundaries, so it cannot live here without buffering the
    caller's timeline).
    """

    def __init__(self, n_fft: int = 512, hop: int = 300, win_len: int = 400):
        self.n_fft = n_fft
        self.hop = hop
        self.pad = n_fft // 2
        self.window = jnp.asarray(_centered_window(win_len, n_fft))

    @staticmethod
    def _normalize(acc, env):
        # torch.istft's least-squares envelope division (guarded at ~0)
        return acc / jnp.where(env > 1e-11, env, 1.0)

    def push(self, spec: jnp.ndarray, state: Optional[dict] = None):
        """Feed a chunk of STFT frames.

        Args:
          spec: [B, F, k] complex frames (or [B, F, k, 2] real/imag).
          state: carried OLA state (None = stream start).

        Returns:
          (samples, state): [B, k * hop] finalized synthesis samples
          (envelope-normalized) and the new carried state.
        """
        if spec.ndim == 4:
            spec = jax.lax.complex(spec[..., 0], spec[..., 1])
        B, F, k = spec.shape
        if k == 0:
            return _ola_empty_push(B, self.n_fft, self.hop, state)
        frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=self.n_fft)
        frames = frames * self.window[None, None, :]
        return _ola_carry_push(
            frames, self.window, self.hop, state, self._normalize
        )

    def flush(self, state: dict) -> jnp.ndarray:
        """Emit the final ``n_fft - hop`` buffered samples."""
        return self._normalize(state["acc"], state["env"])


class StreamingConvIstft:
    """Chunked synthesis for the conv-STFT path (DCCRN / CRN).

    Same emission invariant as ``StreamingIstft``, for
    ``dsp.stft.conv_istft`` semantics instead (pinv synthesis basis, OLA
    normalization by ``env + 1e-8``, reference: tools_for_model.py:90-112).
    The concatenation of pushes + flush equals ``conv_istft``'s UNTRIMMED
    synthesis; the caller trims ``win_len - hop`` samples from each end,
    exactly as the batch path does.
    """

    def __init__(self, kernels):
        self.k = kernels

    @staticmethod
    def _normalize(acc, env):
        # conv-iSTFT's epsilon-regularized envelope (tools_for_model.py:107)
        return acc / (env + 1e-8)

    def push(self, spec: jnp.ndarray, state: Optional[dict] = None):
        """Feed [B, fft_len + 2, c] real-stacked-over-imag frames; returns
        ([B, c * hop] finalized samples, new state)."""
        k = self.k
        B, _, c = spec.shape
        if c == 0:
            return _ola_empty_push(B, k.win_len, k.hop, state)
        frames = jnp.einsum(
            "bft,nf->btn", spec, k.inv, precision=jax.lax.Precision.HIGHEST
        )
        return _ola_carry_push(
            frames, k.window, k.hop, state, self._normalize
        )

    def flush(self, state: dict) -> jnp.ndarray:
        """Emit the final ``win_len - hop`` buffered samples."""
        return self._normalize(state["acc"], state["env"])
