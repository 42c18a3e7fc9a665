"""Console progress bar over a loader (reference: tools_for_model.py:1354-1421)."""

from __future__ import annotations

import time


class Bar:
    """Wrap any sized iterable of batches; prints ``i/N [===>...] ETA``."""

    DISPLAY_LENGTH = 50

    def __init__(self, loader, total: int | None = None):
        self.loader = loader
        self.total = total if total is not None else len(loader)
        self._last = None

    def __len__(self):
        return self.total

    def __iter__(self):
        start = time.time()
        for idx, batch in enumerate(self.loader):
            now = time.time()
            rate = (idx + 1) / self.total
            if idx:
                eta = (now - start) / idx * (self.total - idx)
            else:
                eta = 0.0
            len_bar = int(rate * self.DISPLAY_LENGTH)
            bar = ("=" * len_bar + ">").ljust(self.DISPLAY_LENGTH, ".")
            print(
                f"\r{idx + 1}/{self.total}: [{bar}] - ETA {eta:.1f}s",
                end="",
                flush=True,
            )
            yield batch
        print()
