"""Dataset + loader over the monolithic [N, 2, T] waveform corpus.

reference: dataloader.py:11-71 — a torch Dataset over one ``np.load``-ed
array and three DataLoader modes (train: shuffle + drop_last; valid/test:
sequential).  Host-side redesign: memory-mapped loading, a pure-numpy
batching iterator (no torch dependency), and a prefetch stage
(se_tpu.data.prefetch) that double-buffers host->device transfers — the
reference runs ``num_workers=0`` synchronous loading (dataloader.py:17).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np


class WaveDataset:
    """Paired (noisy, clean) waveforms from one array of shape [N, 2, T].

    Test mode indexes ``input[type][snr]`` first, matching the reference's
    nested test corpus layout (dataloader.py:58).
    """

    def __init__(
        self,
        path_or_array,
        mode: str = "train",
        type: int = 0,
        snr: int = 0,
        mmap: bool = True,
    ):
        if isinstance(path_or_array, np.ndarray):
            data = path_or_array
        else:
            data = np.load(path_or_array, mmap_mode="r" if mmap else None)
        if mode == "test":
            data = data[type][snr]
        assert data.ndim == 3 and data.shape[1] == 2, data.shape
        self.mode = mode
        self.data = data

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        pair = self.data[idx]
        return np.asarray(pair[0], np.float32), np.asarray(pair[1], np.float32)


def gather_pairs(dataset, idx: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Fetch a batch of (noisy, clean) rows.  Array-backed datasets are
    fancy-indexed in one shot; synthesised datasets (e.g. MixingDataset)
    fall back to per-item ``__getitem__``."""
    data = getattr(dataset, "data", None)
    if data is not None:
        arr = np.asarray(data[idx], np.float32)
        return arr[:, 0], arr[:, 1]
    pairs = [dataset[int(i)] for i in idx]
    noisy = np.stack([p[0] for p in pairs]).astype(np.float32)
    clean = np.stack([p[1] for p in pairs]).astype(np.float32)
    return noisy, clean


class MixingDataset:
    """On-the-fly noisy-mixture dataset: a fresh random noise crop and a
    random SNR per draw, using the exact reference mixing math
    (generate_noisy_data.py:46-67 via ``synth.mix_at_snr``; the random
    SNR-per-file draw mirrors the reference's validation-mode generator,
    generate_noisy_data.py:133-168).

    Deterministic: every item is keyed by ``(seed, epoch, index)``, so a
    run is reproducible from its seed while every epoch still sees fresh
    mixtures (``fresh_each_epoch=False`` freezes epoch 0's mixtures,
    giving a fixed random corpus).  The epoch is advanced by the
    DataLoader at iteration start via ``set_epoch``.

    Plugs directly into the Trainer: ``Trainer(cfg, train_data=
    MixingDataset(clean, noises, snrs))``.
    """

    def __init__(self, clean, noises, snrs, seed: int = 0,
                 fresh_each_epoch: bool = True):
        self.clean = [np.asarray(c, np.float32) for c in clean]
        self.noises = [np.asarray(n, np.float32) for n in noises]
        if not self.noises:
            raise ValueError("MixingDataset needs at least one noise signal")
        self.snrs = [float(s) for s in snrs]
        self.seed = seed
        self.fresh_each_epoch = fresh_each_epoch
        self._epoch = 0

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def __len__(self) -> int:
        return len(self.clean)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        from .synth import mix_at_snr

        e = self._epoch if self.fresh_each_epoch else 0
        rng = np.random.default_rng((self.seed, e, idx))
        snr = self.snrs[rng.integers(len(self.snrs))]
        noise = self.noises[rng.integers(len(self.noises))]
        noisy, clean = mix_at_snr(self.clean[idx], noise, snr, rng)
        return noisy.astype(np.float32), clean.astype(np.float32)


class DataLoader:
    """Minimal batching iterator: shuffle / drop_last semantics of the
    reference's torch loaders (dataloader.py:13-31)."""

    def __init__(
        self,
        dataset: WaveDataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Position the loader at ``epoch`` (0-based).  The shuffle is
        keyed by (seed, epoch), so a resumed run continues the data
        order it would have seen uninterrupted instead of replaying the
        start-of-training permutations (Trainer.setup calls this on
        resume)."""
        self._epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            # keyed by (seed, epoch): deterministic, resume-positionable
            np.random.default_rng((self.seed, self._epoch)).shuffle(order)
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(self._epoch)
        self._epoch += 1
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            idx = order[start : start + self.batch_size]
            yield gather_pairs(self.dataset, idx)


def create_dataloader(
    mode: str,
    path_or_array=None,
    batch: int = 10,
    type: int = 0,
    snr: int = 0,
    seed: int = 0,
) -> DataLoader:
    """Drop-in surface of reference create_dataloader (dataloader.py:11-31)."""
    ds = WaveDataset(path_or_array, mode=mode, type=type, snr=snr)
    if mode == "train":
        return DataLoader(ds, batch, shuffle=True, drop_last=True, seed=seed)
    return DataLoader(ds, batch, shuffle=False, drop_last=False)
