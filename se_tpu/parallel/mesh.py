"""Device mesh + sharding helpers.

The reference is strictly single-device (SURVEY.md section 2); the faithful
TPU scaling axis for independent 3-second utterances is batch data
parallelism over a 1-D ICI mesh: batch-sharded inputs, replicated params,
XLA-inserted psum for the gradient reduction.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices
    (0 = all)."""
    devices = jax.devices()
    if num_devices:
        if num_devices > len(devices):
            raise ValueError(
                f"requested a {num_devices}-device mesh but only "
                f"{len(devices)} devices are available — a silently "
                f"smaller mesh would double the per-device batch"
            )
        devices = devices[:num_devices]
    return Mesh(devices, (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays, axis: str = "data"):
    """Place host arrays batch-sharded over the mesh."""
    s = batch_sharding(mesh, axis)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / train state) over the mesh."""
    s = replicated(mesh)
    return jax.device_put(tree, s)
