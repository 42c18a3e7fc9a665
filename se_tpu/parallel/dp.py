"""SPMD data-parallel train / eval steps over an ICI mesh.

jit with explicit NamedShardings: the batch is sharded on the mesh's data
axis, the TrainState is replicated, and XLA inserts the psum gradient
all-reduce over ICI — the jax.sharding equivalent of a DistributedSampler
plus DDP, neither of which the reference has (SURVEY.md section 2).

The step bodies are traced under ``rnn_ops.shard_context`` so the fused
Pallas LSTM/GRU recurrences stay enabled under the mesh: each kernel call
is wrapped in jax.shard_map over the data axis (batch-tiled kernels on the
local shard — numerically identical), while everything else remains
global-view jit, keeping BatchNorm statistics and the gradient reduction
bit-identical to the single-device step.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..ops import rnn as rnn_ops
from ..train.steps import eval_step_body, train_step_body


def make_parallel_train_step(cfg: Config, model, mesh: Mesh, axis: str = "data"):
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(axis))

    # the shared step body (incl. grad_accum micro-batching; the scan's
    # micro-batch reshape composes with the batch sharding as long as
    # each micro-batch still divides the mesh)
    body = train_step_body(cfg, model)

    def step(state, inputs, targets, dropout_rng):
        with rnn_ops.shard_context(mesh, axis):
            return body(state, inputs, targets, dropout_rng)

    return jax.jit(
        step,
        in_shardings=(repl, bsh, bsh, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_parallel_eval_step(cfg: Config, model, mesh: Mesh, axis: str = "data"):
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(axis))
    # shared body with the single-device path (se_tpu/train/steps.py) so
    # the mesh and single-device validation can never diverge
    body = eval_step_body(cfg, model)

    def step(state, inputs, targets):
        with rnn_ops.shard_context(mesh, axis):
            return body(state, inputs, targets)

    return jax.jit(
        step,
        in_shardings=(repl, bsh, bsh),
        out_shardings=(repl, bsh),
    )
