"""Training state: params + batch stats + Adam optimiser state.

The reference holds this as mutable module state plus a torch.optim.Adam
(reference: train_interface.py:52-60); here it is an explicit pytree that
jitted steps thread through, checkpointable with orbax.
"""

from __future__ import annotations

from typing import Any

import optax
from flax import struct

from ..config import Config
from ..models.factory import build_model, init_model


class TrainState(struct.PyTreeNode):
    step: int
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
        )


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """torch.optim.Adam parity: lr, betas (0.9, 0.999), eps 1e-8, no
    weight decay (reference: train_interface.py:59).

    ``cfg.train.adam_mu_dtype`` optionally stores the first moment in a
    narrower dtype (optax mu_dtype); the second moment stays f32 — it
    needs precision near zero that bf16 lacks."""
    import jax.numpy as jnp

    mu_dtype = (
        jnp.dtype(cfg.train.adam_mu_dtype)
        if cfg.train.adam_mu_dtype else None
    )
    return optax.adam(
        cfg.train.learning_rate, b1=0.9, b2=0.999, eps=1e-8,
        mu_dtype=mu_dtype,
    )


def create_train_state(cfg: Config, seed: int | None = None) -> tuple:
    """Build model + init variables + optimiser. Returns (model, state)."""
    model = build_model(cfg)
    variables = init_model(cfg, model, seed=seed if seed is not None else cfg.train.seed)
    tx = make_optimizer(cfg)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    state = TrainState(
        step=0,
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )
    return model, state
