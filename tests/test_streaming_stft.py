"""Chunked analysis must reproduce the whole-utterance torch.stft-path
frames exactly (se_tpu/dsp/streaming_stft.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from se_tpu.dsp import frame_stft
from se_tpu.dsp.streaming_stft import StreamingStft


def _stream(wav, chunk, n_fft=512, hop=300, win_len=400):
    ana = StreamingStft(n_fft, hop, win_len)
    state, frames = None, []
    for s in range(0, wav.shape[-1], chunk):
        spec, state = ana.push(wav[:, s : s + chunk], state)
        frames.append(spec)
    frames.append(ana.flush(state))
    return jnp.concatenate(frames, axis=-1)


@pytest.mark.parametrize("L", [4800, 4801, 4799, 16000, 1500])
def test_streaming_stft_matches_batch(L):
    rng = np.random.default_rng(L)
    wav = jnp.asarray(rng.standard_normal((2, L)).astype(np.float32))
    want = frame_stft(wav, 512, 300, 400)
    got = _stream(wav, chunk=1500)  # 5 hops per chunk
    assert got.shape == want.shape == (2, 257, L // 300 + 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_streaming_stft_ragged_chunks():
    """Chunk sizes that are not hop multiples (including sub-pad chunks
    after the first) still reproduce the batch frames."""
    rng = np.random.default_rng(7)
    wav = jnp.asarray(rng.standard_normal((1, 7000)).astype(np.float32))
    want = frame_stft(wav, 512, 300, 400)

    ana = StreamingStft()
    state, frames = None, []
    for lo, hi in [(0, 900), (900, 1000), (1000, 4321), (4321, 7000)]:
        spec, state = ana.push(wav[:, lo:hi], state)
        frames.append(spec)
    frames.append(ana.flush(state))
    got = jnp.concatenate(frames, axis=-1)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_streaming_stft_first_chunk_too_short():
    ana = StreamingStft()
    with pytest.raises(ValueError):
        ana.push(jnp.zeros((1, 256)))
