"""Benchmark: train & enhance throughput (3-s utterances / sec / chip) for
all three model families.

Runs each model's train and inference steps as jitted steps on the
available accelerator and prints one JSON line per metric, DCCRN train
last (it is the headline number).  DCCRN's headline train metric uses
bf16 activations with f32 params/optimizer/BN statistics — the TPU-native
mixed-precision production path (convergence covered by
tests/test_train_step.py::test_dccrn_bf16_compute_trains and the
tools/train_demo_tpu.py quality demo); the f32 series keeps its
historical metric name (precision policy in BASELINE.md).

Batch sizes are measured single-chip sweet spots on v5e (docs/PERF.md;
the reference default of 10 underutilises the chip).

``vs_baseline`` compares against the strongest measurable PyTorch
reference-architecture run on this host (tools/measure_torch_baseline.py,
recorded in BASELINE.md) — the upstream repo publishes no numbers
(SURVEY.md section 6).
"""

from __future__ import annotations

import json
import time

import numpy as np

# torch-CPU reference throughput on this host (1-core; eager beats
# torch.compile here — tools/measure_torch_baseline.py), utterances/sec.
BASELINES = {
    "dccrn": {"train": 0.155, "enhance": 0.737},
    "crn": {"train": 1.300, "enhance": 3.797},
    "fullsubnet": {"train": 0.153, "enhance": 0.541},
    "fullsubnet_gru": {"train": 0.183, "enhance": 0.541},
    # perceptual trainer modes, measured round 4 same-day with a plain
    # re-measure for drift context (BASELINE.md)
    "dccrn_lms": {"train": 0.267},
    "dccrn_pmsqe": {"train": 0.268},
}

DCCRN_TRAIN_BATCH_F32 = 112      # f32 single-chip ceiling (docs/PERF.md)
DCCRN_TRAIN_BATCH_BF16 = 128     # bf16 fits (and is fastest at) B=128
DCCRN_ENHANCE_BATCH_F32 = 96
DCCRN_ENHANCE_BATCH_BF16 = 128
CRN_TRAIN_BATCH = 112
CRN_ENHANCE_BATCH = 224
CRN_TRAIN_BATCH_BF16 = 128       # bf16 sweet spots (docs/PERF.md round-3)
CRN_ENHANCE_BATCH_BF16 = 256
# FullSubNet's sub-band stage batches B*257 sequences; measured
# single-chip sweet spots (fused Pallas LSTM + gather unfold —
# docs/PERF.md round-3).  bf16 fits B=48 train but B=32 stays fastest.
FSN_TRAIN_BATCH = 32
FSN_ENHANCE_BATCH = 96

N_ITERS = 20


def _make_batch(cfg, batch, rng):
    import jax.numpy as jnp

    L = cfg.stft.fs * 3
    noisy = jnp.asarray((rng.standard_normal((batch, L)) * 0.1).astype(np.float32))
    clean = jnp.asarray((rng.standard_normal((batch, L)) * 0.1).astype(np.float32))
    return noisy, clean


def _timed_train_rate(step, state, batch, noisy, clean, key):
    """One warm-up call (compile), then N_ITERS timed carried-state steps.
    Synchronisation is a scalar float fetch — block_until_ready is
    unreliable on the tunnelled axon platform (docs/PERF.md)."""
    state, m = step(state, noisy, clean, key)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        state, m = step(state, noisy, clean, key)
    float(m["loss"])
    return batch / ((time.perf_counter() - t0) / N_ITERS)


def _bench_train(cfg, batch, key, rng):
    from se_tpu.train import create_train_state, make_train_step

    model, state = create_train_state(cfg)
    noisy, clean = _make_batch(cfg, batch, rng)
    step = make_train_step(cfg, model)
    return _timed_train_rate(step, state, batch, noisy, clean, key)


def _bench_enhance(cfg, batch, rng):
    from se_tpu.train import create_train_state
    from se_tpu.train.steps import make_eval_step

    model, state = create_train_state(cfg)
    noisy, clean = _make_batch(cfg, batch, rng)
    eval_step = make_eval_step(cfg, model)
    m, out = eval_step(state, noisy, clean)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        m, out = eval_step(state, noisy, clean)
    float(m["loss"])
    return batch / ((time.perf_counter() - t0) / N_ITERS)


def _bench_train_mesh(cfg, batch, key, rng):
    """The SPMD data-parallel train step (parallel/dp.py) on a 1-device
    mesh — measures the sharding machinery (NamedSharding plumbing +
    shard_map-wrapped Pallas recurrences) against plain jit on the same
    chip, so multi-chip throughput extrapolation has a measured base."""
    import jax
    from jax.sharding import Mesh
    from se_tpu.train import create_train_state
    from se_tpu.parallel import replicate
    from se_tpu.parallel.dp import make_parallel_train_step

    model, state = create_train_state(cfg)
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("data",))
    noisy, clean = _make_batch(cfg, batch, rng)
    step = make_parallel_train_step(cfg, model, mesh)
    # the state MUST be placed with the step's replicated NamedSharding
    # before the first call: a bare device_put commits it as
    # SingleDeviceSharding, so the carried state (NamedSharding) would be
    # a second jit signature and trigger an ~18 s recompile mid-loop
    # (measured, docs/PERF.md "mesh overhead")
    state = replicate(mesh, state)
    return _timed_train_rate(step, state, batch, noisy, clean, key)


def _emit(metric, thunk, baseline, retries: int = 2):
    """Measure and print one metric as a JSON line.

    The tunnelled axon TPU flaps in windows of minutes (docs/PERF.md);
    a transient failure on one metric must not kill the whole bench, so
    each measurement retries after a backoff and a persistent failure
    skips just that metric (error to stderr, next metric still runs)."""
    import sys
    import traceback

    for attempt in range(retries + 1):
        try:
            value = thunk()
            break
        except Exception:
            if attempt == retries:
                print(f"[bench] {metric} failed after {retries + 1} "
                      f"attempts:\n{traceback.format_exc()}",
                      file=sys.stderr, flush=True)
                return
            time.sleep(20.0 * (attempt + 1))
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 3),
                "unit": "3s-utterances/sec/chip",
                "vs_baseline": round(value / baseline, 3),
            }
        ),
        flush=True,
    )


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from se_tpu.config import Config

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    # -- CRN (real magnitude masking; reference models.py:329-565) ---------
    crn = Config(model="CRN", lstm="real", loss="MSE")
    crn16 = crn.replace(compute_dtype="bfloat16")
    _emit(
        "crn_enhance_utterances_per_sec_per_chip",
        lambda: _bench_enhance(crn, CRN_ENHANCE_BATCH, rng),
        BASELINES["crn"]["enhance"],
    )
    _emit(
        "crn_enhance_bf16_utterances_per_sec_per_chip",
        lambda: _bench_enhance(crn16, CRN_ENHANCE_BATCH_BF16, rng),
        BASELINES["crn"]["enhance"],
    )
    _emit(
        "crn_train_utterances_per_sec_per_chip",
        lambda: _bench_train(crn, CRN_TRAIN_BATCH, key, rng),
        BASELINES["crn"]["train"],
    )
    _emit(
        "crn_train_bf16_utterances_per_sec_per_chip",
        lambda: _bench_train(crn16, CRN_TRAIN_BATCH_BF16, key, rng),
        BASELINES["crn"]["train"],
    )

    # -- FullSubNet (cIRM, MSE; reference models.py:568-682) ---------------
    fsn = Config(model="FullSubNet", loss="MSE")
    fsn16 = fsn.replace(compute_dtype="bfloat16")
    _emit(
        "fullsubnet_enhance_utterances_per_sec_per_chip",
        lambda: _bench_enhance(fsn, FSN_ENHANCE_BATCH, rng),
        BASELINES["fullsubnet"]["enhance"],
    )
    _emit(
        "fullsubnet_enhance_bf16_utterances_per_sec_per_chip",
        lambda: _bench_enhance(fsn16, FSN_ENHANCE_BATCH, rng),
        BASELINES["fullsubnet"]["enhance"],
    )
    _emit(
        "fullsubnet_train_utterances_per_sec_per_chip",
        lambda: _bench_train(fsn, FSN_TRAIN_BATCH, key, rng),
        BASELINES["fullsubnet"]["train"],
    )
    _emit(
        "fullsubnet_train_bf16_utterances_per_sec_per_chip",
        lambda: _bench_train(fsn16, FSN_TRAIN_BATCH, key, rng),
        BASELINES["fullsubnet"]["train"],
    )

    # -- FullSubNet GRU variant (fused Pallas GRU cell; the scan lowering
    #    fails to compile at these batches — docs/PERF.md round-3) --------
    fsn_gru16 = Config(
        model="FullSubNet", loss="MSE", sequence_model="GRU",
        compute_dtype="bfloat16",
    )
    _emit(
        "fullsubnet_gru_enhance_bf16_utterances_per_sec_per_chip",
        lambda: _bench_enhance(fsn_gru16, FSN_ENHANCE_BATCH, rng),
        BASELINES["fullsubnet_gru"]["enhance"],
    )
    _emit(
        "fullsubnet_gru_train_bf16_utterances_per_sec_per_chip",
        lambda: _bench_train(fsn_gru16, FSN_TRAIN_BATCH, key, rng),
        BASELINES["fullsubnet_gru"]["train"],
    )

    # -- DCCRN flagship (complex LSTM, E-mask, SDR) ------------------------
    dccrn = Config()
    dccrn16 = dccrn.replace(compute_dtype="bfloat16")
    # historical series names are f32 since round 1; the bf16 production
    # path reports under its own *_bf16_* names so the precision of a
    # series never silently changes (BASELINE.md)
    _emit(
        "dccrn_enhance_utterances_per_sec_per_chip",
        lambda: _bench_enhance(dccrn, DCCRN_ENHANCE_BATCH_F32, rng),
        BASELINES["dccrn"]["enhance"],
    )
    _emit(
        "dccrn_enhance_bf16_utterances_per_sec_per_chip",
        lambda: _bench_enhance(dccrn16, DCCRN_ENHANCE_BATCH_BF16, rng),
        BASELINES["dccrn"]["enhance"],
    )
    _emit(
        "dccrn_train_utterances_per_sec_per_chip",
        lambda: _bench_train(dccrn, DCCRN_TRAIN_BATCH_F32, key, rng),
        BASELINES["dccrn"]["train"],
    )
    _emit(
        "dccrn_train_bf16_utterances_per_sec_per_chip",
        lambda: _bench_train(dccrn16, DCCRN_TRAIN_BATCH_BF16, key, rng),
        BASELINES["dccrn"]["train"],
    )

    # -- DCCRN perceptual trainer modes (reference trainer.py:45-82):
    #    SDR main loss + LMS / PMSQE perceptual term.  Baselines are the
    #    torch reference trainers with the loss restatements in
    #    tools/torch_perceptual.py (BASELINE.md) --------------------------
    dccrn_lms16 = dccrn16.replace(perceptual="LMS")
    dccrn_pmsqe16 = dccrn16.replace(perceptual="PMSQE")
    _emit(
        "dccrn_lms_train_bf16_utterances_per_sec_per_chip",
        lambda: _bench_train(dccrn_lms16, DCCRN_TRAIN_BATCH_BF16, key, rng),
        BASELINES["dccrn_lms"]["train"],
    )
    _emit(
        "dccrn_pmsqe_train_bf16_utterances_per_sec_per_chip",
        lambda: _bench_train(dccrn_pmsqe16, DCCRN_TRAIN_BATCH_BF16, key, rng),
        BASELINES["dccrn_pmsqe"]["train"],
    )

    # -- mesh-path overhead: the SPMD data-parallel step on a 1-device
    #    mesh vs the plain-jit headline above (docs/PERF.md) --------------
    _emit(
        "dccrn_train_bf16_mesh_utterances_per_sec_per_chip",
        lambda: _bench_train_mesh(dccrn16, DCCRN_TRAIN_BATCH_BF16, key, rng),
        BASELINES["dccrn"]["train"],
    )


if __name__ == "__main__":
    main()
