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
        if cfg.fullsubnet.weight_init:
            variables = dict(variables)
            variables["params"] = apply_reference_weight_init(
                variables["params"], jax.random.PRNGKey(seed + 1)
            )
    else:
        variables = model.init(
            {"params": key, "dropout": key}, noisy, clean, train=False
        )
    return variables


def apply_reference_weight_init(params, key):
    """FullSubNet optional init table (reference: tools_for_model.py:1120-1186,
    gated by config weight_init, config.py:79): orthogonal for >=2-D RNN
    weights, xavier-normal for Linear weights, standard-normal biases."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree.structure(params)
    new_leaves = []
    keys = jax.random.split(key, len(flat))
    for (path, leaf), k in zip(flat, keys):
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        if leaf.ndim >= 2:
            if "weight_ih" in name or "weight_hh" in name:
                new_leaves.append(
                    jax.nn.initializers.orthogonal()(k, leaf.shape, leaf.dtype)
                )
            elif "fc_output_layer/weight" in name:
                new_leaves.append(
                    jax.nn.initializers.xavier_normal()(k, leaf.shape, leaf.dtype)
                )
            else:
                new_leaves.append(leaf)
        else:
            new_leaves.append(jax.random.normal(k, leaf.shape, leaf.dtype))
    return jax.tree.unflatten(treedef, new_leaves)


def calculate_total_params(params) -> int:
    """Total parameter count (reference: train_interface.py:33-42)."""
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
