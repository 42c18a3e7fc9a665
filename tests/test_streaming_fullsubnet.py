"""Streaming FullSubNet must match the batch forward on interior frames
and be chunk-invariant under the cumulative norms (the reference's
streaming machinery, tools_for_model.py:1014-1104)."""

import numpy as np
import jax.numpy as jnp
import pytest

from se_tpu.config import Config, FullSubNetConfig
from se_tpu.models import build_model
from se_tpu.models.factory import init_model, example_batch
from se_tpu.models.streaming_fullsubnet import StreamingFullSubNet
from se_tpu.dsp import frame_stft
from se_tpu.ops.cirm import decompress_cIRM


def _cfg(norm_type="cumulative_laplace_norm", sequence_model="LSTM"):
    return Config(
        model="FullSubNet",
        loss="MSE",
        sequence_model=sequence_model,
        fullsubnet=FullSubNetConfig(
            fb_model_hidden_size=32,
            sb_model_hidden_size=24,
            sb_num_neighbors=3,
            norm_type=norm_type,
        ),
    )


def _mag(cfg, batch=2, seconds=1):
    noisy, _ = example_batch(cfg, batch=batch, seconds=seconds)
    spec = frame_stft(
        noisy, cfg.stft.fft_len, cfg.stft.torch_hop, cfg.stft.win_len
    )
    return spec, jnp.abs(spec)


@pytest.mark.parametrize(
    "norm_type,sequence_model",
    [
        ("cumulative_laplace_norm", "LSTM"),
        ("cumulative_layer_norm", "LSTM"),
        ("cumulative_laplace_norm", "GRU"),
    ],
)
def test_streaming_matches_batch_interior(norm_type, sequence_model):
    cfg = _cfg(norm_type, sequence_model)
    batch_model = build_model(cfg)
    variables = init_model(cfg, batch_model, batch=2, seconds=1)
    stream_model = StreamingFullSubNet(cfg)

    _, mag = _mag(cfg)
    la = cfg.fullsubnet.look_ahead
    T = mag.shape[-1]

    want = np.asarray(batch_model.apply(variables, mag, train=False))
    got, _ = stream_model.apply(variables, mag, method="__call__")
    got = np.asarray(got)

    # stream mask at frame t == batch output for frame t - look_ahead
    np.testing.assert_allclose(
        got[:, :, la:T], want[:, :, : T - la], atol=1e-5
    )


def test_streaming_chunk_invariance():
    cfg = _cfg()
    batch_model = build_model(cfg)
    variables = init_model(cfg, batch_model, batch=1, seconds=1)
    stream_model = StreamingFullSubNet(cfg)

    _, mag = _mag(cfg, batch=1)
    T = mag.shape[-1]
    cut = T // 3

    full, _ = stream_model.apply(variables, mag, method="__call__")

    out1, st = stream_model.apply(variables, mag[..., :cut], method="__call__")
    out2, _ = stream_model.apply(
        variables, mag[..., cut:], st, method="__call__"
    )
    split = jnp.concatenate([out1, out2], axis=2)
    np.testing.assert_allclose(np.asarray(split), np.asarray(full), atol=1e-6)


def test_enhance_chunk_applies_delayed_masks():
    """enhance_chunk must multiply the decompressed mask with the spectrum
    frame it belongs to (look_ahead frames earlier), including across chunk
    boundaries (reference decode: trainer.py:341-345)."""
    cfg = _cfg()
    batch_model = build_model(cfg)
    variables = init_model(cfg, batch_model, batch=1, seconds=1)
    stream_model = StreamingFullSubNet(cfg)

    spec, mag = _mag(cfg, batch=1)
    la = cfg.fullsubnet.look_ahead
    T = mag.shape[-1]
    cut = T // 2

    # expected: stream masks applied to frames shifted by look_ahead
    cRM, _ = stream_model.apply(variables, mag, method="__call__")
    cRM = decompress_cIRM(cRM)
    nr = jnp.real(spec)[:, :, : T - la]
    ni = jnp.imag(spec)[:, :, : T - la]
    want_r = cRM[..., la:, 0] * nr - cRM[..., la:, 1] * ni
    want_i = cRM[..., la:, 1] * nr + cRM[..., la:, 0] * ni

    e1, st = stream_model.apply(
        variables, spec[..., :cut], method="enhance_chunk"
    )
    e2, _ = stream_model.apply(
        variables, spec[..., cut:], st, method="enhance_chunk"
    )
    got = jnp.concatenate([e1, e2], axis=-1)[..., la:]

    np.testing.assert_allclose(
        np.asarray(jnp.real(got)), np.asarray(want_r), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(jnp.imag(got)), np.asarray(want_i), atol=1e-5
    )
