"""SPMD data-parallel train / eval steps over an ICI mesh.

jit with explicit NamedShardings: the batch is sharded on the mesh's data
axis, the TrainState is replicated, and XLA inserts the psum gradient
all-reduce over ICI — the jax.sharding equivalent of a DistributedSampler
plus DDP, neither of which the reference has (SURVEY.md section 2).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..train.steps import (
    _loss_and_outputs,
    trainer_variant,
    fullsubnet_enhance,
    train_step_body,
)


def make_parallel_train_step(cfg: Config, model, mesh: Mesh, axis: str = "data"):
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(axis))

    # the shared step body (incl. grad_accum micro-batching; the scan's
    # micro-batch reshape composes with the batch sharding as long as
    # each micro-batch still divides the mesh)
    return jax.jit(
        train_step_body(cfg, model),
        in_shardings=(repl, bsh, bsh, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_parallel_eval_step(cfg: Config, model, mesh: Mesh, axis: str = "data"):
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(axis))
    variant = trainer_variant(cfg)

    def eval_step(state, inputs, targets):
        loss, (aux, outputs, _) = _loss_and_outputs(
            cfg, model, state.params, state.batch_stats, inputs, targets,
            train=False, dropout_rng=jax.random.PRNGKey(0),
        )
        if variant == "fullsubnet":
            cRM, noisy_complex = outputs
            outputs = fullsubnet_enhance(
                cfg, cRM, noisy_complex, length=inputs.shape[-1]
            )
        return {"loss": loss, **aux}, outputs

    return jax.jit(
        eval_step,
        in_shardings=(repl, bsh, bsh),
        out_shardings=(repl, bsh),
    )
