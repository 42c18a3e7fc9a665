"""Observability tests: tensorboard writer emits event files; plot helpers
render arrays."""

import os

import numpy as np

from se_tpu.obs import Writer
from se_tpu.obs.plots import (
    plot_spectrogram_to_numpy,
    plot_mask_to_numpy,
    plot_error_to_numpy,
)


def test_writer_emits_event_files(tmp_path, rng):
    w = Writer(str(tmp_path))
    w.log_loss(0.5, 0.6, 1)
    w.log_score(2.5, 0.85, 1)
    w.log_sub_loss(0.1, 0.2, 0.3, 0.4, 1)
    wav = rng.standard_normal(16000).astype(np.float32) * 0.1
    w.log_wav(wav, wav, wav, 10)
    w.log_spectrogram(wav, wav, wav, 10)
    mask = rng.uniform(0, 1, (50, 257)).astype(np.float32)
    w.log_mask_spectrogram(mask, mask, mask, 10)
    w.close()
    files = os.listdir(tmp_path)
    assert any("tfevents" in f for f in files), files


def test_plot_helpers_return_rgb(rng):
    wav = rng.standard_normal(8000)
    img = plot_spectrogram_to_numpy(wav, 16000, 512, 100)
    assert img.ndim == 3 and img.shape[2] == 3
    img = plot_mask_to_numpy(rng.uniform(0, 1, (40, 100)), 16000, 512, 100, 0, 1)
    assert img.ndim == 3 and img.shape[2] == 3
    img = plot_error_to_numpy(wav, wav + 0.01, 16000, 512, 100)
    assert img.ndim == 3 and img.shape[2] == 3


def test_reduce_complexity_separately(rng):
    from se_tpu.ops.unfold import reduce_complexity_separately

    sb = rng.standard_normal((6, 17, 1, 5, 8)).astype(np.float32)
    fb = rng.standard_normal((6, 17, 1, 3, 8)).astype(np.float32)
    out = np.asarray(reduce_complexity_separately(sb, fb))
    assert out.shape == (6, 5, 1, 8, 8)
    # first sub-batch uses freqs 1, 4, 7, ...
    np.testing.assert_allclose(out[0, 0, :, :5], sb[0, 1])
    np.testing.assert_allclose(out[0, 0, :, 5:], fb[0, 1])
