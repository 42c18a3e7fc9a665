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
from .metrics import run_pesq_waveforms
from .stoi import stoi


def check_pair(clean_path: str, estimated_path: str):
    from .composite import composite_measures

    clean, fs = read_wav(clean_path)
    est, fs2 = read_wav(estimated_path)
    assert fs == fs2, "sample rates differ"
    n = min(len(clean), len(est))
    clean, est = clean[:n], est[:n]
    pesq_score = run_pesq_waveforms(est, clean, fs)
    stoi_score = stoi(clean, est, fs, extended=False)
    # composite from the SAME truncated arrays and the SAME PESQ score
    # (PESQ is the expensive metric — computing it again inside a
    # path-based composite() would double the cost and, for
    # different-length files, fold a different MOS into CSIG/CBAK/COVL
    # than the printed one; reference re-add: tools_for_estimate.py:27-29)
    csig, cbak, covl, ssnr = composite_measures(clean, est, fs)
    csig += 0.603 * pesq_score
    cbak += 0.478 * pesq_score
    covl += 0.805 * pesq_score
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
    if argv and argv[0] == "--dir":
        if len(argv) != 3:
            print(__doc__)
            raise SystemExit("--dir needs TARGET_DIR and ESTIMATED_DIR")
        check_dirs(argv[1], argv[2])
    elif len(argv) == 2:
        check_pair(argv[0], argv[1])
    else:
        print(__doc__)
        if argv:
            raise SystemExit("expected: CLEAN.wav ENHANCED.wav")


if __name__ == "__main__":
    main()
