"""Orbax checkpointing: (params, opt_state, batch_stats, epoch) per epoch.

reference behaviour: torch.save of {'model','optimizer','epoch'} to
``{dir}/chkpt_{N}.pt`` every epoch BEFORE validation
(train_interface.py:166-171,:205-210), resume restores both state dicts and
continues at epoch+1 (:101-116), and after training the best epoch is
copied to ``chkpt_opt`` (:233-239).
"""

from __future__ import annotations

import os
import shutil
from typing import Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


def _ckpt_path(dir_to_save: str, epoch) -> str:
    return os.path.abspath(os.path.join(dir_to_save, f"chkpt_{epoch}"))


def save_checkpoint(dir_to_save: str, state: TrainState, epoch: int) -> str:
    path = _ckpt_path(dir_to_save, epoch)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "batch_stats": jax.device_get(state.batch_stats),
        "step": jax.device_get(state.step),
        "epoch": np.asarray(epoch),
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, state: TrainState) -> Tuple[TrainState, int]:
    """Restore into an existing (freshly created) state. Returns
    (state, epoch)."""
    ckptr = ocp.StandardCheckpointer()
    target = {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "batch_stats": jax.device_get(state.batch_stats),
        "step": jax.device_get(state.step),
        "epoch": np.asarray(0),
    }
    restored = ckptr.restore(os.path.abspath(path), target)

    # Re-place restored leaves with the template's shardings: orbax hands
    # back host numpy arrays, and (a) under a mesh the carried state must
    # keep its NamedSharding placement or the first step pays a full
    # recompile (docs/PERF.md "mesh overhead" pitfall), (b) the axon TPU
    # backend fails with an opaque UNIMPLEMENTED when some jitted
    # computations (e.g. the FullSubNet streaming step) receive
    # host-numpy parameter leaves (round-5 finding).
    def _place(template, value):
        if isinstance(template, jax.Array):
            return jax.device_put(value, template.sharding)
        return value

    new_state = state.replace(
        params=jax.tree.map(_place, state.params, restored["params"]),
        opt_state=jax.tree.map(_place, state.opt_state, restored["opt_state"]),
        batch_stats=jax.tree.map(
            _place, state.batch_stats, restored["batch_stats"]
        ),
        step=int(restored["step"]),
    )
    return new_state, int(restored["epoch"])


def copy_best_checkpoint(dir_to_save: str, mse_vali_total: np.ndarray) -> str:
    """argmin(val loss) -> chkpt_opt (reference: train_interface.py:233-239).

    Exact-0.0 entries are never-validated epochs (the array is
    zero-initialised and a real validation loss is never exactly 0.0):
    a run that crashed between save_checkpoint and validation, or ended
    before max_epochs, must not have those placeholder zeros win the
    argmin and promote an unvalidated checkpoint — the reference has
    exactly that flaw (its argmin runs over the zero-padded array).
    Keeping zeros in the saved artifact preserves the reference's
    mse_vali_total.npy format."""
    validated = mse_vali_total != 0.0
    if validated.any():
        candidates = np.where(validated, mse_vali_total, np.inf)
    else:
        candidates = mse_vali_total
    min_index = int(np.argmin(candidates))
    src = _ckpt_path(dir_to_save, min_index + 1)
    tgt = _ckpt_path(dir_to_save, "opt")
    if os.path.exists(tgt):
        shutil.rmtree(tgt)
    shutil.copytree(src, tgt)
    return tgt
