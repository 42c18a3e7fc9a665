"""Multi-host input pipeline: each host feeds its shard of the global batch.

The reference is single-process with synchronous loading (reference:
dataloader.py:17, ``num_workers=0``).  The TPU-native scale-out splits
every global batch across JAX processes: all hosts draw the SAME shuffled
order of the global [N, 2, T] corpus from a shared seed, each host reads
only its contiguous slice of every batch (memory-mapped — no host
materialises rows it does not own), and the per-host slices are assembled
into one globally-sharded device array with
``jax.make_array_from_process_local_data`` over the mesh's data axis.

Single-process runs degrade to the ordinary loader semantics, so the same
code path is exercised by the CPU test mesh (tests/test_multihost.py).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np

from .dataset import WaveDataset, gather_pairs


def host_shard(n: int, process_index: int, process_count: int):
    """Contiguous ``[start, stop)`` share of an ``n``-element index space
    owned by host ``process_index``: as even as possible, with the first
    ``n % process_count`` hosts taking one extra element."""
    if not 0 <= process_index < process_count:
        raise ValueError(f"process_index {process_index} of {process_count}")
    base, extra = divmod(n, process_count)
    start = process_index * base + min(process_index, extra)
    stop = start + base + (1 if process_index < extra else 0)
    return start, stop


class MultiHostLoader:
    """Per-host batching iterator over the shared corpus.

    Every host computes the identical global shuffle (same seed and epoch
    counter), partitions each global batch of ``global_batch`` examples
    contiguously by process index, and yields its LOCAL
    ``global_batch // process_count`` rows as (noisy, clean) float32
    arrays.  ``global_batch`` must divide evenly across processes.

    ``drop_last=True`` (the training default) drops a partial final global
    batch — it cannot be formed collectively at a smaller static shape.
    ``drop_last=False`` (validation) instead wrap-pads the remainder rows
    cyclically up to a full global batch so the collective path keeps its
    static shape; callers mask the padding using ``valid_per_batch``
    (global real-row count per yielded batch) and ``local_valid`` (this
    host's share of those real rows).
    """

    def __init__(
        self,
        dataset: WaveDataset,
        global_batch: int,
        process_index: int | None = None,
        process_count: int | None = None,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
    ):
        import jax

        self.dataset = dataset
        self.global_batch = global_batch
        self.process_index = (
            jax.process_index() if process_index is None else process_index
        )
        self.process_count = (
            jax.process_count() if process_count is None else process_count
        )
        if global_batch % self.process_count:
            raise ValueError(
                f"global_batch {global_batch} not divisible by "
                f"process_count {self.process_count}"
            )
        self.local_batch = global_batch // self.process_count
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Position the loader at ``epoch`` (0-based) — the shuffle is
        already keyed (seed, epoch), so resume just sets the counter."""
        self._epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.global_batch
        return -(-n // self.global_batch)

    @property
    def valid_per_batch(self):
        """Global count of real (non-wrap-padded) rows per yielded batch."""
        n = len(self.dataset)
        counts = [self.global_batch] * (n // self.global_batch)
        rem = n % self.global_batch
        if rem and not self.drop_last:
            counts.append(rem)
        return counts

    def local_valid(self, global_valid: int) -> int:
        """This host's count of real rows in a batch whose first
        ``global_valid`` global rows are real.  Batches are sliced
        contiguously by process index, so a host's real rows are always
        the leading rows of its local slice."""
        lo = self.process_index * self.local_batch
        return max(0, min(lo + self.local_batch, global_valid) - lo)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            # identical across hosts: keyed only by (seed, epoch)
            np.random.default_rng((self.seed, self._epoch)).shuffle(order)
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(self._epoch)
        self._epoch += 1
        lo = self.process_index * self.local_batch
        hi = lo + self.local_batch
        stop = (n // self.global_batch) * self.global_batch
        for start in range(0, stop, self.global_batch):
            idx = order[start : start + self.global_batch][lo:hi]
            yield gather_pairs(self.dataset, idx)
        if n - stop and not self.drop_last:
            # wrap-pad the tail cyclically to a full static-shape batch
            idx = np.resize(order[stop:], self.global_batch)[lo:hi]
            yield gather_pairs(self.dataset, idx)


def make_global_batch(mesh, local_noisy, local_clean, axis: str = "data"):
    """Assemble per-host local rows into globally batch-sharded arrays."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    return (
        jax.make_array_from_process_local_data(sharding, local_noisy),
        jax.make_array_from_process_local_data(sharding, local_clean),
    )
