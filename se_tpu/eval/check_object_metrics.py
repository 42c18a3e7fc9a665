"""Offline objective-metric checker CLI.

reference: estimation/check_object_metrics.py — single-pair mode and a
directory-walk mode matching ``target`` -> ``estimated`` file names,
printing PESQ / STOI / CSIG / CBAK / COVL.

Usage:
    python -m se_tpu.eval.check_object_metrics clean.wav enhanced.wav
    python -m se_tpu.eval.check_object_metrics --dir targets/ estimates/
"""

from __future__ import annotations

import os
import sys

import numpy as np

from ..data.synth import read_wav
from .metrics import run_pesq_waveforms, composite
from .stoi import stoi


def check_pair(clean_path: str, estimated_path: str):
    clean, fs = read_wav(clean_path)
    est, fs2 = read_wav(estimated_path)
    assert fs == fs2, "sample rates differ"
    n = min(len(clean), len(est))
    clean, est = clean[:n], est[:n]
    pesq_score = run_pesq_waveforms(est, clean, fs)
    stoi_score = stoi(clean, est, fs, extended=False)
    csig, cbak, covl, ssnr = composite(clean_path, estimated_path)
    print(
        f"{os.path.basename(estimated_path)}: "
        f"PESQ {pesq_score:.4f} | STOI {stoi_score:.4f} | "
        f"CSIG {csig:.4f} | CBAK {cbak:.4f} | COVL {covl:.4f} | "
        f"segSNR {ssnr:.4f}"
    )
    return pesq_score, stoi_score, csig, cbak, covl, ssnr


def check_dirs(target_dir: str, estimated_dir: str):
    """Walk matching pairs: a target file ``X`` scores against the
    estimated file whose name replaces 'target' with 'estimated' (or the
    identical name)."""
    results = []
    for name in sorted(os.listdir(target_dir)):
        if not name.endswith(".wav"):
            continue
        est_name = name.replace("target", "estimated")
        est_path = os.path.join(estimated_dir, est_name)
        if not os.path.exists(est_path):
            est_path = os.path.join(estimated_dir, name)
        if not os.path.exists(est_path):
            print(f"skip {name}: no matching estimate")
            continue
        results.append(check_pair(os.path.join(target_dir, name), est_path))
    if results:
        arr = np.asarray(results)
        mean = arr.mean(axis=0)
        print(
            f"\nMEAN: PESQ {mean[0]:.4f} | STOI {mean[1]:.4f} | "
            f"CSIG {mean[2]:.4f} | CBAK {mean[3]:.4f} | COVL {mean[4]:.4f} | "
            f"segSNR {mean[5]:.4f}"
        )
    return results


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return
    if argv[0] == "--dir":
        check_dirs(argv[1], argv[2])
    else:
        check_pair(argv[0], argv[1])


if __name__ == "__main__":
    main()
