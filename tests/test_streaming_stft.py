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


@pytest.mark.parametrize("L", [4800, 4801, 16000])
def test_streaming_istft_matches_batch(L):
    from se_tpu.dsp import frame_istft
    from se_tpu.dsp.streaming_stft import StreamingIstft

    rng = np.random.default_rng(L + 1)
    wav = jnp.asarray(rng.standard_normal((2, L)).astype(np.float32))
    spec = frame_stft(wav, 512, 300, 400)
    want = np.asarray(frame_istft(spec, 512, 300, 400, length=L))

    syn = StreamingIstft(512, 300, 400)
    state, outs = None, []
    T = spec.shape[-1]
    for lo in range(0, T, 5):
        y, state = syn.push(spec[..., lo : lo + 5], state)
        outs.append(y)
    outs.append(syn.flush(state))
    got = np.asarray(jnp.concatenate(outs, axis=-1))[:, 256 : 256 + L]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_streaming_istft_ragged_and_empty_chunks():
    from se_tpu.dsp import frame_istft
    from se_tpu.dsp.streaming_stft import StreamingIstft

    rng = np.random.default_rng(42)
    L = 7000
    wav = jnp.asarray(rng.standard_normal((1, L)).astype(np.float32))
    spec = frame_stft(wav, 512, 300, 400)
    want = np.asarray(frame_istft(spec, 512, 300, 400, length=L))

    syn = StreamingIstft()
    state, outs = None, []
    for lo, hi in [(0, 1), (1, 1), (1, 7), (7, spec.shape[-1])]:
        y, state = syn.push(spec[..., lo:hi], state)
        outs.append(y)
    outs.append(syn.flush(state))
    got = np.asarray(jnp.concatenate(outs, axis=-1))[:, 256 : 256 + L]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_streaming_roundtrip_is_streaming_both_ways():
    """Analysis chunks -> synthesis chunks reconstructs the wav (interior)
    without ever holding the whole signal in either domain."""
    from se_tpu.dsp.streaming_stft import StreamingIstft

    rng = np.random.default_rng(5)
    L = 9000
    wav = jnp.asarray(rng.standard_normal((1, L)).astype(np.float32))
    ana, syn = StreamingStft(), StreamingIstft()
    astate, sstate, outs = None, None, []
    for lo in range(0, L, 1500):
        spec, astate = ana.push(wav[:, lo : lo + 1500], astate)
        y, sstate = syn.push(spec, sstate)
        outs.append(y)
    y, sstate = syn.push(ana.flush(astate), sstate)
    outs.extend([y, syn.flush(sstate)])
    got = np.asarray(jnp.concatenate(outs, axis=-1))[:, 256 : 256 + L]
    # perfect-reconstruction region (window envelope fully populated)
    np.testing.assert_allclose(
        got[:, 512:-512], np.asarray(wav)[:, 512:-512], atol=1e-4
    )


@pytest.mark.parametrize("L", [16000, 16050])
def test_streaming_conv_istft_matches_batch(L):
    from se_tpu.dsp import conv_stft, conv_istft, make_conv_stft_kernels
    from se_tpu.dsp.streaming_stft import StreamingConvIstft

    k = make_conv_stft_kernels(400, 100, 512)
    rng = np.random.default_rng(L)
    wav = jnp.asarray(rng.standard_normal((2, L)).astype(np.float32))
    spec = conv_stft(wav, k)
    want = np.asarray(conv_istft(spec, k))[:, 0]

    syn = StreamingConvIstft(k)
    state, outs = None, []
    for lo in range(0, spec.shape[-1], 7):
        y, state = syn.push(spec[..., lo : lo + 7], state)
        outs.append(y)
    outs.append(syn.flush(state))
    trim = k.win_len - k.hop
    got = np.asarray(jnp.concatenate(outs, axis=-1))[:, trim:-trim]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)
