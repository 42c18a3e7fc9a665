"""Model factory + parameter counting (reference: train_interface.py:33-42)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from .dccrn import DCCRN
from .crn import CRN
from .fullsubnet import FullSubNet


def build_model(cfg: Config):
    if cfg.model == "DCCRN":
        return DCCRN(cfg)
    if cfg.model == "CRN":
        return CRN(cfg)
    if cfg.model == "FullSubNet":
        return FullSubNet(cfg)
    raise ValueError(f"unknown model {cfg.model!r}")


def example_batch(cfg: Config, batch: int | None = None, seconds: int = 3):
    """A (noisy, clean) example batch shaped like the reference corpus
    ([N, 2, fs*seconds], README.md:37-41)."""
    b = batch or cfg.train.batch
    L = cfg.stft.fs * seconds
    rng = np.random.default_rng(0)
    noisy = rng.standard_normal((b, L)).astype(np.float32) * 0.1
    clean = rng.standard_normal((b, L)).astype(np.float32) * 0.1
    return jnp.asarray(noisy), jnp.asarray(clean)


def init_model(cfg: Config, model, seed: int = 0, batch: int = 2, seconds: int = 1):
    """Initialise parameters + batch stats with a small dummy batch."""
    noisy, clean = example_batch(cfg, batch=batch, seconds=seconds)
    key = jax.random.PRNGKey(seed)
    if cfg.model == "FullSubNet":
        from ..dsp import frame_stft

        mag = jnp.abs(
            frame_stft(
                noisy,
                cfg.stft.fft_len,
                cfg.stft.torch_hop,
                cfg.stft.win_len,
            )
        )
        variables = model.init(
            {"params": key, "dropout": key}, mag, train=False
        )
    else:
        variables = model.init(
            {"params": key, "dropout": key}, noisy, clean, train=False
        )
    return variables


def calculate_total_params(params) -> int:
    """Total parameter count (reference: train_interface.py:33-42)."""
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
