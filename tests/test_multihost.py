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


def test_mixing_dataset_under_multihost_matches_single_host():
    """On-the-fly mixing composed with host sharding: every host draws
    the same (seed, epoch, index)-keyed mixture for the rows it owns, so
    the N-host union reproduces the single-host mixed stream exactly —
    including across epochs (set_epoch must reach the dataset through
    MultiHostLoader on every host)."""
    from se_tpu.data import MixingDataset

    rng = np.random.default_rng(5)
    clean = [rng.standard_normal(800).astype(np.float32) for _ in range(12)]
    noises = [rng.standard_normal(4000).astype(np.float32) for _ in range(3)]

    def make(k, count):
        return MultiHostLoader(
            MixingDataset(clean, noises, snrs=[0, 5, 10], seed=7),
            8, process_index=k, process_count=count, seed=7,
        )

    single = make(0, 1)
    hosts = [make(k, 4) for k in range(4)]
    for _epoch in range(2):
        for global_batch, per_host in zip(single, zip(*hosts)):
            noisy = np.concatenate([b[0] for b in per_host])
            cln = np.concatenate([b[1] for b in per_host])
            np.testing.assert_array_equal(noisy, global_batch[0])
            np.testing.assert_array_equal(cln, global_batch[1])


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


def test_validation_tail_wrap_padded_and_masked():
    """drop_last=False wrap-pads the remainder to a full static-shape
    global batch; valid_per_batch/local_valid identify the real rows and
    their union across hosts is exactly the dataset tail."""
    data = _corpus(n=11)  # 11 rows, gb=8 -> one full batch + 3-row tail
    count, gb = 4, 8
    hosts = [
        MultiHostLoader(
            WaveDataset(data), gb, process_index=k, process_count=count,
            shuffle=False, drop_last=False,
        )
        for k in range(count)
    ]
    assert len(hosts[0]) == 2
    assert hosts[0].valid_per_batch == [8, 3]
    batches = list(zip(*hosts))
    assert len(batches) == 2
    # every local slice keeps the full static shape
    for per_host in batches:
        for noisy_l, _ in per_host:
            assert noisy_l.shape == (gb // count, data.shape[-1])
    # masked union of the tail batch == dataset rows 8..10, in order
    tail_rows = []
    for k, (noisy_l, _) in enumerate(batches[1]):
        lv = hosts[k].local_valid(3)
        tail_rows.append(noisy_l[:lv])
    tail = np.concatenate(tail_rows)
    np.testing.assert_array_equal(tail, data[8:11, 0])
    # and a dataset smaller than the global batch still yields one batch
    tiny = [
        MultiHostLoader(
            WaveDataset(_corpus(n=3)), gb, process_index=k,
            process_count=count, shuffle=False, drop_last=False,
        )
        for k in range(count)
    ]
    assert len(tiny[0]) == 1 and tiny[0].valid_per_batch == [3]
    got = [list(h) for h in tiny]
    assert all(len(g) == 1 for g in got)


def test_trainer_validation_scores_only_real_rows(tmp_path):
    """Trainer.validate_epoch over a MultiHostLoader validation set that
    does not divide the global batch: no crash, and exactly one SCORES
    line per real validation sample (padding is masked out)."""
    from se_tpu.config import TrainConfig
    from se_tpu.train.loop import Trainer
    from tests.test_models import small_cfg

    rng = np.random.default_rng(0)
    train = rng.standard_normal((8, 2, 16000)).astype(np.float32) * 0.05
    valid = rng.standard_normal((5, 2, 16000)).astype(np.float32) * 0.05
    cfg = small_cfg(model="CRN", lstm="real", loss="MSE").replace(
        train=TrainConfig(
            max_epochs=1,
            batch=8,
            job_dir=str(tmp_path / "models") + "/",
            logs_dir=str(tmp_path / "logs") + "/",
        )
    )
    scored = []

    def fake_score(est, clean):
        scored.append(len(est))
        return [2.0] * len(est), [0.5] * len(est)

    t = Trainer(cfg, train, valid, use_mesh=True, score_fn=fake_score)
    t.setup()
    mse = t.run()
    assert np.isfinite(mse[0]) and mse[0] != 0
    assert sum(scored) == 5  # every real row scored once, no padding
    import os

    score_file = os.path.join(t.dir_to_save, "Epoch_1_SCORES")
    with open(score_file) as f:
        assert len(f.readlines()) == 5


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
