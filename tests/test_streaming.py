"""Streaming DCCRN must match the batch forward on interior frames and be
chunk-invariant (state carried across chunk boundaries)."""

import numpy as np
import jax.numpy as jnp
import pytest

from se_tpu.models import build_model
from se_tpu.models.streaming import StreamingDCCRN
from se_tpu.models.factory import init_model, example_batch
from se_tpu.dsp import conv_stft
from tests.test_models import small_cfg


@pytest.mark.parametrize(
    "mode,lstm",
    [("E", "complex"), ("C", "complex"), ("E", "real")],
)
def test_streaming_matches_batch_interior(mode, lstm):
    cfg = small_cfg(model="DCCRN", masking_mode=mode, lstm=lstm)
    batch_model = build_model(cfg)
    variables = init_model(cfg, batch_model, batch=2, seconds=1)
    stream_model = StreamingDCCRN(cfg)

    noisy, _ = example_batch(cfg, batch=2, seconds=1)
    out_r, out_i, _ = batch_model.apply(variables, noisy, train=False)
    batch_spec = np.concatenate([np.asarray(out_r), np.asarray(out_i)], axis=1)

    stream_spec, _ = stream_model.apply(variables, noisy, method="__call__")
    stream_spec = np.asarray(stream_spec)

    n = stream_model.bind(variables).n_stages
    T = stream_spec.shape[-1]  # streaming emits L/hop frames (no right pad)
    got = stream_spec[..., n:T]
    want = batch_spec[..., : T - n]
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_streaming_chunk_invariance():
    """Feeding two chunks with carried state == feeding the concatenation.

    Note: the conv-STFT pads each chunk's edges, so frames near the chunk
    boundary come from padded context; to isolate state carry, feed spectra
    computed once and compare full-signal vs split processing.
    """
    cfg = small_cfg(model="DCCRN", masking_mode="E")
    batch_model = build_model(cfg)
    variables = init_model(cfg, batch_model, batch=1, seconds=1)
    stream_model = StreamingDCCRN(cfg)
    bound = stream_model.bind(variables)

    noisy, _ = example_batch(cfg, batch=1, seconds=1)
    specs = conv_stft(noisy, bound.stft_kernels)  # [1, F2, T]

    # process all frames in one scan vs two halves with carried state,
    # driving the internal step through __call__ on crafted wavs is
    # indirect; instead scan manually via the module's step by splitting
    # the spec frames through two calls of the internal scan
    # (we re-enter apply with the state from the first half).
    import jax

    T = specs.shape[-1]
    # full pass
    full_spec, _ = stream_model.apply(variables, noisy)

    # two-pass: emulate by slicing the waveform at a hop boundary and
    # comparing the frames after the second chunk's STFT warmup region
    hop, win = cfg.stft.win_inc, cfg.stft.win_len
    split = 8000
    first, st = stream_model.apply(variables, noisy[:, :split])
    second, _ = stream_model.apply(variables, noisy[:, split:], st)

    # with stateful framing the split processing matches the full pass
    t_first = first.shape[-1]
    combined = np.concatenate(
        [np.asarray(first), np.asarray(second)], axis=-1
    )
    np.testing.assert_allclose(
        combined, np.asarray(full_spec), atol=2e-4
    )


def test_streaming_sub_frame_chunk_emits_nothing():
    """A pushed chunk too short to complete a new STFT frame (e.g. a
    final sub-hop remainder) must emit zero frames and keep the stream
    usable — the chunk-vectorized form's T=0 trace path (round-3 review
    regression: `[..., -0:]` slicing kept the whole axis and crashed)."""
    from se_tpu.models.streaming_crn import StreamingCRN

    rng = np.random.default_rng(11)
    for model_name, cls in (("DCCRN", StreamingDCCRN), ("CRN", StreamingCRN)):
        kw = {"lstm": "real", "loss": "MSE"} if model_name == "CRN" else {}
        cfg = small_cfg(model=model_name, masking_mode="E", **kw)
        model = cls(cfg)
        variables = init_model(cfg, build_model(cfg), batch=1, seconds=1)
        wav = jnp.asarray(
            (rng.standard_normal((1, 1000)) * 0.1).astype(np.float32)
        )
        spec, state = model.apply(variables, wav, method="__call__")
        assert spec.shape[-1] == 1000 // cfg.stft.win_inc
        # sub-hop push: absorbed into the tail, nothing emitted
        tiny = jnp.asarray(
            (rng.standard_normal((1, 10)) * 0.1).astype(np.float32)
        )
        spec0, state = model.apply(variables, tiny, state, method="__call__")
        assert spec0.shape[-1] == 0
        # the stream continues producing well-formed frames afterwards
        spec2, _ = model.apply(variables, wav, state, method="__call__")
        assert spec2.shape[-1] == (10 + 1000) // cfg.stft.win_inc
        assert np.isfinite(np.asarray(spec2)).all()


def test_streaming_synthesize_shape():
    cfg = small_cfg(model="DCCRN")
    stream_model = StreamingDCCRN(cfg)
    variables = init_model(cfg, build_model(cfg), batch=1, seconds=1)
    noisy, _ = example_batch(cfg, batch=1, seconds=1)
    spec, _ = stream_model.apply(variables, noisy)
    wav = stream_model.bind(variables).synthesize(spec)
    # streaming emits L/hop frames; OLA of T frames spans
    # (T-1)*hop + win - 2*(win-hop) samples after edge trims
    T = spec.shape[-1]
    hop, win = cfg.stft.win_inc, cfg.stft.win_len
    assert wav.shape == (1, (T - 1) * hop + win - 2 * (win - hop))
    assert np.isfinite(np.asarray(wav)).all()


def test_streaming_crn_matches_batch_interior():
    from se_tpu.models.streaming_crn import StreamingCRN

    cfg = small_cfg(model="CRN", lstm="real", masking_mode="E")
    batch_model = build_model(cfg)
    variables = init_model(cfg, batch_model, batch=2, seconds=1)
    stream_model = StreamingCRN(cfg)

    noisy, clean = example_batch(cfg, batch=2, seconds=1)
    est_mags, _, _ = batch_model.apply(variables, noisy, clean, train=False)
    # reconstruct the batch out_spec from est_mags and the noisy phase
    from se_tpu.dsp import conv_stft_mag_phase

    bound = stream_model.bind(variables)
    mags, phase = conv_stft_mag_phase(noisy, bound.stft_kernels)
    batch_spec = np.concatenate(
        [
            np.asarray(est_mags) * np.cos(np.asarray(phase)),
            np.asarray(est_mags) * np.sin(np.asarray(phase)),
        ],
        axis=1,
    )

    stream_spec, _ = stream_model.apply(variables, noisy)
    stream_spec = np.asarray(stream_spec)

    n = bound.n_stages
    T = stream_spec.shape[-1]
    got = stream_spec[..., n:T]
    want = batch_spec[..., : T - n]
    np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.mark.parametrize(
    "model_name,mode,lstm",
    [
        ("DCCRN", "E", "complex"),
        ("DCCRN", "C", "complex"),
        ("DCCRN", "R", "complex"),
        ("DCCRN", "E", "real"),
        ("CRN", "E", "real"),
        ("DCCRN-noskip", "E", "complex"),
        ("CRN-noskip", "E", "real"),
    ],
)
def test_streaming_flush_exact_full_sequence(model_name, mode, lstm):
    """End-of-stream exactness: pushes over [wav || win-hop zero right
    pad] plus ``flush_stream`` reproduce the batch forward's WHOLE
    spectrum sequence, including the final n_stages frames (the batch
    decoder's sequence-end tail, which zero-feeding cannot produce —
    round-5 fix; previously only the interior matched)."""
    from se_tpu.models.streaming_crn import StreamingCRN

    model_name, _, noskip = model_name.partition("-")
    cfg = small_cfg(
        model=model_name, masking_mode=mode, lstm=lstm,
        skip_type=not noskip,
    )
    batch_model = build_model(cfg)
    variables = init_model(cfg, batch_model, batch=2, seconds=1)
    stream_model = (
        StreamingDCCRN(cfg) if model_name == "DCCRN" else StreamingCRN(cfg)
    )

    noisy, _ = example_batch(cfg, batch=2, seconds=1)
    if model_name == "DCCRN":
        out_r, out_i, batch_wav = batch_model.apply(
            variables, noisy, train=False
        )
        batch_spec = np.concatenate(
            [np.asarray(out_r), np.asarray(out_i)], axis=1
        )
    else:
        # CRN returns (est_mags, target_mags, wav) — compare waveforms
        _, _, batch_wav = batch_model.apply(variables, noisy, train=False)
        batch_spec = None

    bound = stream_model.bind(variables)
    n = bound.n_stages
    s = cfg.stft
    pad = np.zeros((2, s.win_len - s.win_inc), np.float32)
    # two wav chunks + the analysis right pad, state carried throughout
    mid = noisy.shape[-1] // 2 // s.win_inc * s.win_inc
    pieces = [noisy[:, :mid], noisy[:, mid:], jnp.asarray(pad)]
    state, specs = None, []
    for p in pieces:
        out, state = stream_model.apply(variables, p, state)
        specs.append(np.asarray(out))
    tail = stream_model.apply(variables, state, method="flush_stream")
    specs.append(np.asarray(tail))
    got = np.concatenate(specs, axis=-1)[..., n:]  # drop warm-up frames

    if batch_spec is not None:
        assert got.shape == batch_spec.shape, (got.shape, batch_spec.shape)
        np.testing.assert_allclose(got, batch_spec, atol=2e-4)
    # waveform-level: synthesize the full streamed sequence and compare
    # to the batch wav over its ENTIRE length — no excluded tail
    wav = np.asarray(
        stream_model.apply(variables, jnp.asarray(got), method="synthesize")
    )  # conv_istft already trims the win-hop edges
    np.testing.assert_allclose(
        wav, np.asarray(batch_wav), atol=2e-4
    )
