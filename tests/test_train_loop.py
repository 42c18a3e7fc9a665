"""Full orchestration test: 2-epoch synthetic run with checkpoints, resume,
best-copy, logs — the reference's end-to-end behaviour
(train_interface.py:101-239) on the tutorial-style synthetic corpus."""

import os

import numpy as np
import pytest

from se_tpu.config import TrainConfig
from se_tpu.train.loop import Trainer
from tests.test_models import small_cfg


def _fake_scores(est, clean):
    return [2.0] * len(est), [0.9] * len(est)


def _make_cfg(tmp_path, **kw):
    rng = np.random.default_rng(0)
    train_data = rng.standard_normal((6, 2, 16000)).astype(np.float32) * 0.05
    valid_data = rng.standard_normal((4, 2, 16000)).astype(np.float32) * 0.05
    cfg = small_cfg(model="CRN", lstm="real", loss="MSE").replace(
        train=TrainConfig(
            max_epochs=2,
            batch=2,
            job_dir=str(tmp_path / "models") + "/",
            logs_dir=str(tmp_path / "logs") + "/",
            **kw,
        )
    )
    return cfg, train_data, valid_data


def test_two_epoch_run_produces_artifacts(tmp_path):
    cfg, train_data, valid_data = _make_cfg(tmp_path)
    t = Trainer(cfg, train_data, valid_data, score_fn=_fake_scores)
    t.setup()
    mse = t.run()

    d = t.dir_to_save
    assert os.path.exists(os.path.join(d, "chkpt_1"))
    assert os.path.exists(os.path.join(d, "chkpt_2"))
    assert os.path.exists(os.path.join(d, "chkpt_opt"))
    assert os.path.exists(os.path.join(d, "log.txt"))
    assert os.path.exists(os.path.join(d, "mse_vali_total.npy"))
    assert os.path.exists(os.path.join(d, "Epoch_1_SCORES"))
    assert np.all(mse[:2] != 0)

    with open(os.path.join(d, "Epoch_1_SCORES")) as f:
        lines = f.readlines()
    assert len(lines) == 4  # one line per validation sample
    assert lines[0].startswith("PESQ ")

    with open(os.path.join(d, "log.txt")) as f:
        log = f.read()
    assert "total params" in log
    assert "Epoch [1]" in log and "Epoch [2]" in log


def test_resume_continues_from_checkpoint(tmp_path):
    cfg, train_data, valid_data = _make_cfg(tmp_path)
    t = Trainer(cfg, train_data, valid_data, score_fn=_fake_scores)
    t.setup()
    t.run()
    run_name = os.path.basename(t.dir_to_save)

    # resume from epoch 1 with max_epochs 3
    cfg2 = cfg.replace(
        train=TrainConfig(
            max_epochs=3,
            batch=2,
            job_dir=cfg.train.job_dir,
            logs_dir=cfg.train.logs_dir,
            chkpt_model=run_name,
            chkpt="1",
        )
    )
    t2 = Trainer(cfg2, train_data, valid_data, score_fn=_fake_scores)
    t2.setup()
    assert t2.epoch_start_idx == 2
    assert len(t2.mse_vali_total) == 3
    mse = t2.run()
    assert os.path.exists(os.path.join(t2.dir_to_save, "chkpt_3"))
    assert np.all(mse != 0)


def test_resume_continues_data_order_not_replays_it(tmp_path):
    """A resumed run must see the shuffles (and MixingDataset mixtures)
    of the epochs it is about to train, not replay epoch 1's — the
    loaders key their order by (seed, epoch) and Trainer.setup positions
    them at epoch_start_idx - 1 on resume."""
    from se_tpu.data import DataLoader, WaveDataset

    rng = np.random.default_rng(9)
    data = rng.standard_normal((8, 2, 400)).astype(np.float32)

    def first_rows(loader, n_epochs):
        out = []
        for _ in range(n_epochs):
            out.append(next(iter(loader))[0][0].copy())
        return out

    # uninterrupted: epochs 1..3
    full = DataLoader(WaveDataset(data), 2, shuffle=True, drop_last=True,
                      seed=3)
    rows = first_rows(full, 3)

    # 'resumed at epoch 3': fresh loader positioned at epoch index 2
    resumed = DataLoader(WaveDataset(data), 2, shuffle=True, drop_last=True,
                         seed=3)
    resumed.set_epoch(2)
    row3 = next(iter(resumed))[0][0]
    np.testing.assert_array_equal(row3, rows[2])
    assert not np.array_equal(rows[0], rows[2])  # epochs really differ


def test_fullsubnet_loop_end_to_end(tmp_path):
    """FullSubNet through the full orchestration: dropout rngs, cIRM eval
    decode to waveforms, checkpointing."""
    rng = np.random.default_rng(1)
    train_data = rng.standard_normal((4, 2, 16000)).astype(np.float32) * 0.05
    valid_data = rng.standard_normal((2, 2, 16000)).astype(np.float32) * 0.05
    cfg = small_cfg(model="FullSubNet", loss="MSE").replace(
        train=TrainConfig(
            max_epochs=1,
            batch=2,
            job_dir=str(tmp_path / "models") + "/",
            logs_dir=str(tmp_path / "logs") + "/",
        )
    )
    t = Trainer(cfg, train_data, valid_data, score_fn=_fake_scores)
    t.setup()
    mse = t.run()
    assert np.isfinite(mse[0]) and mse[0] != 0
    assert os.path.exists(os.path.join(t.dir_to_save, "chkpt_opt"))


def test_validation_scoring_overlaps_eval(tmp_path):
    """Scoring of batch i must run concurrently with batch i+1's eval_step
    (producer/consumer pipeline): the second eval call starts BEFORE the
    first batch's scoring finishes."""
    import time
    import numpy as np
    from se_tpu.config import TrainConfig
    from se_tpu.train.loop import Trainer
    from tests.test_models import small_cfg

    rng = np.random.default_rng(0)
    train = rng.standard_normal((4, 2, 16000)).astype(np.float32) * 0.05
    valid = rng.standard_normal((4, 2, 16000)).astype(np.float32) * 0.05
    events = []

    def slow_score(est, clean):
        events.append(("score_start", time.perf_counter()))
        time.sleep(1.0)
        events.append(("score_end", time.perf_counter()))
        return [2.0] * len(est), [0.9] * len(est)

    cfg = small_cfg(model="CRN", lstm="real", loss="MSE").replace(
        train=TrainConfig(
            max_epochs=1,
            batch=2,
            job_dir=str(tmp_path / "models") + "/",
            logs_dir=str(tmp_path / "logs") + "/",
        )
    )
    t = Trainer(cfg, train, valid, score_fn=slow_score)
    t.setup()
    real_eval = t.eval_step

    def traced_eval(state, noisy, clean):
        events.append(("eval_start", time.perf_counter()))
        out = real_eval(state, noisy, clean)
        return out

    t.eval_step = traced_eval
    t.validate_epoch(epoch=1)
    kinds = [k for k, _ in events]
    assert kinds.count("eval_start") == 2 and kinds.count("score_start") == 2
    ts = {(k, kinds[: i + 1].count(k)): v for i, (k, v) in enumerate(events)}
    # second eval starts while the first batch is still being scored
    assert ts[("eval_start", 2)] < ts[("score_end", 1)], events


def test_composition_mesh_mixing_perceptual_resume(tmp_path):
    """The full production composition in ONE orchestration: SPMD mesh
    (8 virtual devices) + on-the-fly MixingDataset + perceptual (LMS)
    training (reference trainer.py:45-82) + mid-run checkpoint resume.
    Every piece has its own test; this pins that they compose — mesh
    validation wrap-pads the remainder, the perceptual sub-losses are
    logged, and the resumed run restores the replicated state and the
    loader's (seed, epoch) position."""
    from se_tpu.data import MixingDataset

    rng = np.random.default_rng(7)
    clean = [rng.standard_normal(16000).astype(np.float32) * 0.05
             for _ in range(8)]
    noises = [rng.standard_normal(24000).astype(np.float32) * 0.05
              for _ in range(2)]
    valid = rng.standard_normal((5, 2, 16000)).astype(np.float32) * 0.05

    def make_mix():
        return MixingDataset(clean, noises, snrs=[0.0, 5.0], seed=11)

    cfg = small_cfg(model="DCCRN", loss="SDR", perceptual="LMS").replace(
        train=TrainConfig(
            max_epochs=1,
            batch=8,
            job_dir=str(tmp_path / "models") + "/",
            logs_dir=str(tmp_path / "logs") + "/",
        )
    )
    t = Trainer(cfg, make_mix(), valid, use_mesh=True, score_fn=_fake_scores)
    t.setup()
    mse = t.run()
    assert np.isfinite(mse[0]) and mse[0] != 0
    run_name = os.path.basename(t.dir_to_save)

    # every real validation row scored exactly once (padding masked out)
    with open(os.path.join(t.dir_to_save, "Epoch_1_SCORES")) as f:
        assert len(f.readlines()) == 5
    with open(os.path.join(t.dir_to_save, "log.txt")) as f:
        log = f.read()
    # perceptual runs log main AND perceptual sub-losses (reference
    # train_interface.py:159-197 perceptual epoch loop)
    assert "Epoch [1]" in log and "| V" in log

    # resume at epoch 2 with the same composition
    cfg2 = cfg.replace(
        train=TrainConfig(
            max_epochs=2,
            batch=8,
            job_dir=cfg.train.job_dir,
            logs_dir=cfg.train.logs_dir,
            chkpt_model=run_name,
            chkpt="1",
        )
    )
    t2 = Trainer(cfg2, make_mix(), valid, use_mesh=True,
                 score_fn=_fake_scores)
    t2.setup()
    assert t2.epoch_start_idx == 2
    # the resumed loader must be positioned at epoch 2's mixtures, not
    # epoch 1's (MixingDataset keys its mixtures by (seed, epoch, idx);
    # the loader pushes its epoch into the dataset at iteration start)
    assert t2.train_loader._epoch == 1
    mse2 = t2.run()
    assert os.path.exists(os.path.join(t2.dir_to_save, "chkpt_2"))
    assert os.path.exists(os.path.join(t2.dir_to_save, "chkpt_opt"))
    assert np.all(np.isfinite(mse2)) and mse2[1] != 0


def test_mesh_trainer_rejects_indivisible_batch(tmp_path):
    """A mesh-mode Trainer whose train.batch does not divide over
    grad_accum x devices must fail at setup with a clear message, not a
    mid-run sharding error."""
    cfg, train_data, valid_data = _make_cfg(tmp_path)
    import dataclasses
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, batch=6))
    t = Trainer(cfg, train_data, valid_data, use_mesh=True,
                score_fn=_fake_scores)
    with pytest.raises(ValueError, match="divisible by grad_accum"):
        t.setup()
