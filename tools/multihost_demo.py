"""Real multi-process run of the multi-host data + training pipeline.

``tests/test_multihost.py`` simulates N hosts inside one process; this
script runs the genuinely multi-process behaviours on this machine with
2 (or more) CPU processes: ``jax.distributed.initialize`` against a
coordinator, a device mesh spanning processes, ``MultiHostLoader``
feeding each process only its shard, ``make_global_batch`` assembling
only-addressable shards via ``jax.make_array_from_process_local_data``,
cross-process shuffle agreement, and lock-step data-parallel train steps
whose gradient psum rides the gloo CPU collectives.

Launch one process per host (see tests/test_multihost_2proc.py):

    python tools/multihost_demo.py --coordinator localhost:PORT \
        --num-processes 2 --process-id {0,1} [--steps 4] \
        [--local-devices 4] [--global-batch 8]

or single-process reference mode (same global math on one process —
losses must match the multi-process run step for step):

    python tools/multihost_demo.py --single [--local-devices 8] ...

Each process prints ``STEP <k> LOSS <value>`` lines; process 0's lines
are the comparable record.  The corpus is generated deterministically
from a seed, so separate invocations see identical data.

reference context: the reference has no distributed anything (SURVEY
section 2); this is the framework's own scaling surface, proven here by
execution rather than simulation.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_corpus(n=32, samples=8000, seed=7):
    """Deterministic tiny [N, 2, T] corpus, identical in every process."""
    rng = np.random.default_rng(seed)
    clean = (rng.standard_normal((n, samples)) * 0.05).astype(np.float32)
    noise = (rng.standard_normal((n, samples)) * 0.05).astype(np.float32)
    return np.stack([clean + noise, clean], axis=1)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--coordinator", default="localhost:9911")
    p.add_argument("--num-processes", type=int, default=2)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--single", action="store_true",
                   help="single-process reference run (no jax.distributed)")
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--local-devices", type=int, default=4)
    p.add_argument("--global-batch", type=int, default=8)
    p.add_argument("--epochs", type=int, default=2)
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.local_devices)
    if not args.single:
        # gloo is the CPU cross-process collectives transport; without it
        # the gradient psum over the 2-process mesh cannot execute
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        assert jax.process_count() == args.num_processes, jax.process_count()

    import jax.numpy as jnp
    from jax.sharding import Mesh

    from se_tpu.config import Config, DccrnConfig
    from se_tpu.data import MultiHostLoader, WaveDataset, make_global_batch
    from se_tpu.data.dataset import gather_pairs  # noqa: F401 (import check)
    from se_tpu.parallel import replicate
    from se_tpu.parallel.dp import make_parallel_train_step
    from se_tpu.train import create_train_state

    n_dev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), ("data",))
    print(
        f"process {jax.process_index()}/{jax.process_count()}: "
        f"{jax.local_device_count()} local of {n_dev} global devices",
        flush=True,
    )

    cfg = Config(
        use_pallas_lstm="off",
        dccrn=DccrnConfig(kernel_num=(8, 16, 16, 32, 32, 32), rnn_units=32),
    )
    model, state = create_train_state(cfg)
    step_fn = make_parallel_train_step(cfg, model, mesh)
    state = replicate(mesh, state)

    dataset = WaveDataset(make_corpus(), "train")
    loader = MultiHostLoader(dataset, args.global_batch, seed=0)

    k = 0
    for _epoch in range(args.epochs):
        for local_noisy, local_clean in loader:
            if k >= args.steps:
                break
            noisy, clean = make_global_batch(mesh, local_noisy, local_clean)
            # lock-step dropout key: identical across processes
            state, metrics = step_fn(state, noisy, clean,
                                     jax.random.PRNGKey(k))
            loss = float(metrics["loss"])
            assert np.isfinite(loss), loss
            print(f"STEP {k} LOSS {loss:.8f}", flush=True)
            k += 1

    # cross-process shuffle agreement receipt: every process derives the
    # same epoch-1 permutation head from the shared (seed, epoch) key
    order = np.arange(len(dataset))
    np.random.default_rng((0, 0)).shuffle(order)
    print("SHUFFLE_HEAD " + ",".join(map(str, order[:8])), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
