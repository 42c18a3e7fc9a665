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


def test_mixing_dataset_deterministic_and_fresh_per_epoch():
    """Same seed -> identical mixtures; different seed differs; epochs
    reshuffle the noise/SNR draws (fresh_each_epoch) unless frozen."""
    from se_tpu.data import MixingDataset

    rng = np.random.default_rng(3)
    clean = [rng.standard_normal(8000) * 0.1 for _ in range(4)]
    noises = [rng.standard_normal(30000), rng.standard_normal(12000)]
    a = MixingDataset(clean, noises, snrs=[0, 5, 10], seed=7)
    b = MixingDataset(clean, noises, snrs=[0, 5, 10], seed=7)
    c = MixingDataset(clean, noises, snrs=[0, 5, 10], seed=8)
    for i in range(4):
        np.testing.assert_array_equal(a[i][0], b[i][0])
    assert not np.array_equal(a[0][0], c[0][0])
    # epoch advance changes the draws...
    e0 = a[0][0].copy()
    a.set_epoch(1)
    assert not np.array_equal(a[0][0], e0)
    a.set_epoch(0)
    np.testing.assert_array_equal(a[0][0], e0)
    # ...unless frozen
    frozen = MixingDataset(clean, noises, snrs=[0], seed=7,
                           fresh_each_epoch=False)
    f0 = frozen[2][0].copy()
    frozen.set_epoch(5)
    np.testing.assert_array_equal(frozen[2][0], f0)


def test_mixing_dataset_snr_and_clean_row():
    """Each draw hits one of the target SNRs with the reference's mixing
    math, and the clean row is the DC-removed clean signal."""
    from se_tpu.data import MixingDataset

    rng = np.random.default_rng(4)
    clean = [rng.standard_normal(8000) * 0.1]
    noises = [rng.standard_normal(30000)]
    ds = MixingDataset(clean, noises, snrs=[5.0], seed=0)
    for epoch in range(3):
        ds.set_epoch(epoch)
        noisy, c = ds[0]
        np.testing.assert_allclose(
            c, clean[0] - np.mean(clean[0]), atol=1e-6
        )
        added = noisy - c
        measured = 10 * np.log10(np.mean(c**2) / np.mean(added**2))
        assert abs(measured - 5.0) < 0.5, measured


def test_mixing_dataset_through_loader_and_trainer(tmp_path):
    """MixingDataset plugs into the DataLoader (which advances its epoch)
    and the Trainer end-to-end (on-the-fly training pipeline)."""
    from se_tpu.config import TrainConfig
    from se_tpu.data import MixingDataset, DataLoader
    from se_tpu.train.loop import Trainer
    from tests.test_models import small_cfg

    rng = np.random.default_rng(5)
    t = np.arange(16000) / 16000.0
    clean = [
        (0.2 * np.sin(2 * np.pi * (200 + 40 * k) * t)).astype(np.float32)
        for k in range(4)
    ]
    noises = [rng.standard_normal(40000).astype(np.float32) * 0.1]
    ds = MixingDataset(clean, noises, snrs=[0, 5], seed=1)

    dl = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True, seed=2)
    first = [n.copy() for n, _ in dl]
    second = [n.copy() for n, _ in dl]
    assert all(n.shape == (2, 16000) for n in first)
    # fresh mixtures each epoch (the loader advanced the dataset epoch)
    assert not all(
        np.array_equal(x, y)
        for x, y in zip(np.sort(np.concatenate(first), 0),
                        np.sort(np.concatenate(second), 0))
    )

    valid = rng.standard_normal((2, 2, 16000)).astype(np.float32) * 0.05
    cfg = small_cfg(model="CRN", lstm="real", loss="MSE").replace(
        train=TrainConfig(
            max_epochs=1,
            batch=2,
            job_dir=str(tmp_path / "models") + "/",
            logs_dir=str(tmp_path / "logs") + "/",
        )
    )
    tr = Trainer(cfg, ds, valid,
                 score_fn=lambda e, c: ([2.0] * len(e), [0.9] * len(e)))
    tr.setup()
    mse = tr.run()
    assert np.isfinite(mse[0]) and mse[0] != 0
