"""Training entry point — drop-in equivalent of the reference's
train_interface.py, driven by the frozen config plus CLI overrides instead
of editing a module (reference: config.py "edit this file" workflow).

Usage:
    python train_interface.py --model DCCRN --loss SDR \
        --train-data data/train.npy --valid-data data/valid.npy
"""

from __future__ import annotations

import argparse
import os

from se_tpu.config import Config, DccrnConfig, TrainConfig


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="DCCRN", choices=["DCCRN", "CRN", "FullSubNet"])
    p.add_argument("--loss", default="SDR", choices=["MSE", "SDR", "SI-SNR", "SI-SDR"])
    p.add_argument("--perceptual", default="False", choices=["False", "LMS", "PMSQE"])
    p.add_argument("--lstm", default="complex", choices=["real", "complex"])
    p.add_argument("--sequence-model", default="LSTM", choices=["LSTM", "GRU"])
    p.add_argument(
        "--masking-mode", default="E",
        choices=["Direct(None make)", "E", "C", "R"],
    )
    p.add_argument("--no-skip", action="store_true", help="remove skip connections")
    p.add_argument("--use-cbn", action="store_true",
                   help="complex batch norm in DCCRN (reference use_cbn)")
    p.add_argument("--max-epochs", type=int, default=100)
    p.add_argument("--learning-rate", type=float, default=1e-3)
    p.add_argument("--batch", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--train-data", required=True, help=".npy of [N, 2, T]")
    p.add_argument("--valid-data", required=True, help=".npy of [N, 2, T]")
    p.add_argument("--job-dir", default="./models/")
    p.add_argument("--logs-dir", default="./logs/")
    p.add_argument("--expr-num", default="EXPERIMENT_NUMBER")
    p.add_argument("--chkpt-model", default=None, help="run dir name to resume")
    p.add_argument("--chkpt", default="EPOCH", help="epoch number to resume from")
    p.add_argument("--mesh", action="store_true",
                   help="data-parallel over all available devices")
    p.add_argument(
        "--compute-dtype", default="float32",
        choices=["float32", "bfloat16"],
        help="activation dtype for the compute path (bfloat16 keeps f32 "
        "params/optimizer/norm statistics; the TPU production setting — "
        "docs/PERF.md)",
    )
    p.add_argument(
        "--grad-accum", type=int, default=1,
        help="sequential micro-batches per optimizer step (effective "
        "batch = batch * grad_accum at ~constant HBM)",
    )
    p.add_argument(
        "--pallas-lstm", default="auto", choices=["auto", "on", "off"],
        help="fused Pallas recurrence cells (auto: on for single-chip "
        "TPU execution)",
    )
    p.add_argument(
        "--fsn-norm", default=None,
        help="FullSubNet norm_type override (reference config.py:80 "
        "norm_type; e.g. cumulative_laplace_norm to train a model whose "
        "statistics are causal — the norm to pick when the checkpoint "
        "will be served with enhance.py --streaming)",
    )
    p.add_argument(
        "--adam-mu-dtype", default="float32",
        choices=["float32", "bfloat16"],
        help="storage dtype of Adam's first moment",
    )
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    # persistent compile cache: on the tunnelled TPU platform a dropped
    # connection kills the process, and the resume run should not pay
    # the ~20-40 s compilations again (same setting as bench.py and
    # tools/train_demo_tpu.py)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("SE_TPU_COMPILE_CACHE", "/tmp/jax_tpu_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from se_tpu.config import FullSubNetConfig

    fsn_kw = (
        {"fullsubnet": FullSubNetConfig(norm_type=args.fsn_norm)}
        if args.fsn_norm
        else {}
    )
    cfg = Config(
        model=args.model,
        loss=args.loss,
        **fsn_kw,
        perceptual=False if args.perceptual == "False" else args.perceptual,
        lstm=args.lstm,
        sequence_model=args.sequence_model,
        masking_mode=args.masking_mode,
        skip_type=not args.no_skip,
        dccrn=DccrnConfig(use_cbn=args.use_cbn),
        compute_dtype=args.compute_dtype,
        use_pallas_lstm=args.pallas_lstm,
        train=TrainConfig(
            max_epochs=args.max_epochs,
            learning_rate=args.learning_rate,
            batch=args.batch,
            seed=args.seed,
            job_dir=args.job_dir,
            logs_dir=args.logs_dir,
            expr_num=args.expr_num,
            chkpt_model=args.chkpt_model,
            chkpt=args.chkpt,
            train_data_path=args.train_data,
            valid_data_path=args.valid_data,
            grad_accum=args.grad_accum,
            adam_mu_dtype=args.adam_mu_dtype,
        ),
    )
    from se_tpu.train.loop import train

    train(cfg, use_mesh=args.mesh)


if __name__ == "__main__":
    main()
