"""Data pipeline tests: dataset/loader semantics, prefetch, noisy mixing."""

import numpy as np
import pytest

from se_tpu.data import WaveDataset, DataLoader, create_dataloader, prefetch_to_device
from se_tpu.data.synth import mix_at_snr, read_wav, write_wav


def _corpus(n=7, t=100):
    rng = np.random.default_rng(0)
    return rng.standard_normal((n, 2, t)).astype(np.float32)


def test_dataset_shapes_and_pairs():
    data = _corpus()
    ds = WaveDataset(data)
    assert len(ds) == 7
    noisy, clean = ds[3]
    np.testing.assert_array_equal(noisy, data[3, 0])
    np.testing.assert_array_equal(clean, data[3, 1])


def test_train_loader_shuffles_and_drops_last():
    data = _corpus(n=7)
    dl = DataLoader(WaveDataset(data), batch_size=2, shuffle=True, drop_last=True)
    batches = list(dl)
    assert len(batches) == 3  # 7 // 2, last dropped
    assert all(b[0].shape == (2, 100) for b in batches)
    # different epochs give different orders (statistically)
    b1 = np.concatenate([b[0] for b in dl])
    b2 = np.concatenate([b[0] for b in dl])
    assert not np.array_equal(b1, b2)


def test_valid_loader_is_sequential_and_complete():
    data = _corpus(n=5)
    dl = create_dataloader("valid", data, batch=2)
    batches = list(dl)
    assert len(batches) == 3
    got = np.concatenate([b[0] for b in batches])
    np.testing.assert_array_equal(got, data[:, 0])


def test_test_mode_nested_indexing():
    # test corpus layout: input[type][snr] -> [N, 2, T]
    data = _corpus(n=4)
    nested = np.stack([np.stack([data, data * 2])])  # [1 type, 2 snr, ...]
    ds = WaveDataset(nested, mode="test", type=0, snr=1)
    np.testing.assert_array_equal(ds[0][0], data[0, 0] * 2)


def test_prefetch_preserves_order_and_values():
    data = _corpus(n=6)
    dl = DataLoader(WaveDataset(data), batch_size=3)
    direct = list(dl)
    prefetched = list(prefetch_to_device(iter(dl), depth=2))
    assert len(direct) == len(prefetched)
    for (a1, b1), (a2, b2) in zip(direct, prefetched):
        np.testing.assert_allclose(a1, np.asarray(a2))
        np.testing.assert_allclose(b1, np.asarray(b2))


def test_mix_at_snr_math():
    """reference math: alpha = sqrt(10^(-snr/10) * Ps / Pn)
    (generate_noisy_data.py:63)."""
    rng = np.random.default_rng(1)
    clean = rng.standard_normal(8000)
    noise = rng.standard_normal(20000)
    for snr in (0.0, 5.0, 10.0):
        noisy, c = mix_at_snr(clean, noise, snr, rng)
        added = noisy - c
        measured = 10 * np.log10(np.mean(c**2) / np.mean(added**2))
        assert abs(measured - snr) < 0.5, (snr, measured)


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(1600) * 0.1).astype(np.float64)
    p = str(tmp_path / "x.wav")
    write_wav(p, x, 16000)
    y, fs = read_wav(p)
    assert fs == 16000
    np.testing.assert_allclose(y, x, atol=1e-4)  # int16 quantisation
