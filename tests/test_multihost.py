"""Multi-host input pipeline: partitioning, cross-host batch assembly, and
end-to-end feeding of the data-parallel train step on the virtual mesh.

The reference has no multi-host anything (SURVEY.md section 2); these
tests simulate N hosts inside one process by instantiating one
MultiHostLoader per process_index and checking their union reproduces the
single-host stream exactly.
"""

import numpy as np
import pytest

from se_tpu.data import (
    DataLoader,
    MultiHostLoader,
    WaveDataset,
    host_shard,
    make_global_batch,
)


def _corpus(n=16, t=800, seed=3):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, 2, t)).astype(np.float32)


@pytest.mark.parametrize("n,count", [(10, 3), (8, 8), (7, 2), (5, 1), (3, 5)])
def test_host_shard_partitions_evenly(n, count):
    spans = [host_shard(n, i, count) for i in range(count)]
    covered = []
    for lo, hi in spans:
        covered.extend(range(lo, hi))
    assert covered == list(range(n))  # disjoint, ordered, complete
    sizes = [hi - lo for lo, hi in spans]
    assert max(sizes) - min(sizes) <= 1  # balanced


def test_union_of_hosts_equals_single_host_stream():
    data = _corpus()
    count, gb = 4, 8
    single = MultiHostLoader(
        WaveDataset(data), gb, process_index=0, process_count=1, seed=7
    )
    hosts = [
        MultiHostLoader(
            WaveDataset(data), gb, process_index=k, process_count=count,
            seed=7,
        )
        for k in range(count)
    ]
    for global_batch, per_host in zip(single, zip(*hosts)):
        noisy = np.concatenate([b[0] for b in per_host])
        clean = np.concatenate([b[1] for b in per_host])
        np.testing.assert_array_equal(noisy, global_batch[0])
        np.testing.assert_array_equal(clean, global_batch[1])


def test_shuffle_differs_across_epochs_but_agrees_across_hosts():
    data = _corpus()
    a = MultiHostLoader(
        WaveDataset(data), 8, process_index=0, process_count=2, seed=1
    )
    b = MultiHostLoader(
        WaveDataset(data), 8, process_index=0, process_count=2, seed=1
    )
    e1a = [x[0] for x in a]
    e1b = [x[0] for x in b]
    for x, y in zip(e1a, e1b):
        np.testing.assert_array_equal(x, y)  # same epoch -> same order
    e2a = [x[0] for x in a]
    assert not all(
        np.array_equal(x, y) for x, y in zip(e1a, e2a)
    )  # epochs reshuffle


def test_rejects_indivisible_global_batch():
    with pytest.raises(ValueError):
        MultiHostLoader(
            WaveDataset(_corpus()), 9, process_index=0, process_count=2
        )


def test_global_batch_assembly_and_train_step_on_mesh():
    import jax
    from se_tpu.config import Config
    from se_tpu.parallel import make_mesh, replicate
    from se_tpu.parallel.dp import make_parallel_train_step
    from se_tpu.train import create_train_state

    data = _corpus(n=16, t=8000)
    mesh = make_mesh()
    cfg = Config()
    model, state = create_train_state(cfg)
    state = replicate(mesh, state)
    step = make_parallel_train_step(cfg, model, mesh)

    loader = MultiHostLoader(WaveDataset(data), 8, seed=0)  # 1 process
    noisy_l, clean_l = next(iter(loader))
    noisy, clean = make_global_batch(mesh, noisy_l, clean_l)
    assert noisy.shape == (8, 8000)
    # globally sharded over the mesh's data axis
    assert len(noisy.sharding.device_set) == len(mesh.devices.ravel())
    state, metrics = step(state, noisy, clean, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
