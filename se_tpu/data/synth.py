"""Noisy-mixture synthesis: offline corpus generation + on-the-fly mixing.

reference: generate_noisy_data.py — random noise crop (:52-54), DC removal
and signal powers (:57-60), SNR scale alpha = sqrt(10^(-snr/10) * Ps / Pn)
(:63), int16 write scaling (:64-65); train mode mixes every clean file at
every requested SNR with a random noise file, validation picks a random
SNR per file (:102-168).

Resampling uses scipy polyphase filtering instead of librosa (not in this
image).  ``mix_at_snr`` also powers the on-the-fly training pipeline:
``se_tpu.data.MixingDataset`` draws a fresh noise crop + random SNR per
epoch and plugs directly into the Trainer (dataset.py).
"""

from __future__ import annotations

import os
import sys
from typing import List, Tuple

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


def scan_directory(dir_name: str) -> List[str]:
    """Recursively collect .wav paths (reference: generate_noisy_data.py:23-43)."""
    if not os.path.isdir(dir_name):
        raise FileNotFoundError(f"{dir_name} is not a valid directory")
    out = []
    for root, _, files in os.walk(dir_name):
        for f in files:
            if f.endswith(".wav"):
                out.append(os.path.join(root, f))
    return sorted(out)


def read_wav(path: str, target_fs: int | None = None) -> Tuple[np.ndarray, int]:
    """Read wav as float64 in [-1, 1]; resample if requested."""
    fs, x = wavfile.read(path)
    if x.dtype == np.int16:
        x = x.astype(np.float64) / 32768.0
    elif x.dtype == np.int32:
        x = x.astype(np.float64) / 2147483648.0
    elif x.dtype == np.uint8:
        x = (x.astype(np.float64) - 128.0) / 128.0
    else:
        x = x.astype(np.float64)
    if x.ndim > 1:
        x = x.mean(axis=1)
    if target_fs is not None and fs != target_fs:
        g = np.gcd(int(target_fs), int(fs))
        x = resample_poly(x, target_fs // g, fs // g)
        fs = target_fs
    return x, fs


def write_wav(path: str, x: np.ndarray, fs: int):
    """int16 write with the reference's x32768 scaling
    (generate_noisy_data.py:64-65).

    Documented deviation: the reference's bare ``astype(np.int16)``
    WRAPS samples at or above 1.0 (1.2 * 32768 -> -26215), writing
    polarity-flipped full-scale clicks into low-SNR mixtures whose sum
    exceeds full scale; we saturate instead."""
    wavfile.write(
        path, fs,
        np.clip(x * 32768, -32768, 32767).astype(np.int16),
    )


def mix_at_snr(
    clean: np.ndarray,
    noise: np.ndarray,
    snr_db: float,
    rng: np.random.Generator | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Mix a random noise crop into clean speech at the target SNR.

    Returns (noisy, clean) float arrays.  Exact reference math
    (generate_noisy_data.py:46-67): random crop, per-signal DC removal,
    power ratio, alpha scaling.
    """
    rng = rng or np.random.default_rng()
    if len(noise) <= len(clean):
        reps = -(-len(clean) // len(noise)) + 1
        noise = np.tile(noise, reps)
    start = rng.integers(0, len(noise) - len(clean))
    noise_seg = noise[start : start + len(clean)]

    clean = clean - np.mean(clean)
    noise_seg = noise_seg - np.mean(noise_seg)
    p_speech = np.mean(clean**2)
    p_noise = np.mean(noise_seg**2) + 1e-20
    alpha = np.sqrt(10.0 ** (-snr_db / 10.0) * p_speech / p_noise)
    noisy = clean + alpha * noise_seg
    return noisy, clean


def generate_noisy_wav(
    clean_path: str,
    noise_path: str,
    snr_db: float,
    fs: int = 16000,
    rng: np.random.Generator | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    clean, _ = read_wav(clean_path, fs)
    noise, _ = read_wav(noise_path, fs)
    return mix_at_snr(clean, noise, snr_db, rng)


def generate_corpus(
    mode: str,
    snrs: List[float],
    fs: int = 16000,
    root: str = ".",
    seed: int = 0,
):
    """Offline corpus synthesis (reference main, generate_noisy_data.py:70-168).

    Layout: ``{root}/{mode}/clean``, ``{root}/train/noise`` in,
    ``{root}/{mode}/noisy`` + TSV log out.  Train mode: every clean file at
    every SNR with a random noise file; validation: one random SNR per file.
    """
    rng = np.random.default_rng(seed)
    clean_dir = os.path.join(root, mode, "clean")
    noise_dir = os.path.join(root, "train", "noise")
    out_dir = os.path.join(root, mode, "noisy")
    os.makedirs(out_dir, exist_ok=True)

    clean_files = scan_directory(clean_dir)
    noise_files = scan_directory(noise_dir)
    log_path = os.path.join(root, mode, "log.tsv")

    with open(log_path, "w") as log:
        if mode == "train":
            for snr in snrs:
                for cf in clean_files:
                    nf = noise_files[rng.integers(0, len(noise_files))]
                    noisy, _ = generate_noisy_wav(cf, nf, snr, fs, rng)
                    name = (
                        os.path.splitext(os.path.basename(cf))[0]
                        + f"_{os.path.splitext(os.path.basename(nf))[0]}"
                        + f"_{snr}dB.wav"
                    )
                    write_wav(os.path.join(out_dir, name), noisy, fs)
                    log.write(f"{cf}\t{nf}\t{snr}\t{name}\n")
        else:
            for cf in clean_files:
                snr = snrs[rng.integers(0, len(snrs))]
                nf = noise_files[rng.integers(0, len(noise_files))]
                noisy, _ = generate_noisy_wav(cf, nf, snr, fs, rng)
                name = (
                    os.path.splitext(os.path.basename(cf))[0]
                    + f"_{snr}dB.wav"
                )
                write_wav(os.path.join(out_dir, name), noisy, fs)
                log.write(f"{cf}\t{nf}\t{snr}\t{name}\n")
    return log_path


def pack_corpus(
    mode: str,
    out_path: str,
    seconds: float = 3.0,
    fs: int = 16000,
    root: str = ".",
) -> str:
    """Pack a synthesized wav tree into the ``[N, 2, T]`` float32 ``.npy``
    the dataloader consumes (rows: noisy, clean).

    The reference documents this array (README.md:37-41) but ships no
    packing script — users build it by hand from the generator's output.
    This reads the TSV log ``generate_corpus`` wrote (clean path, noise
    path, SNR, noisy name), front-crops each pair to ``seconds * fs``
    samples and zero-pads shorter files, so the result feeds
    ``train_interface.py --train-data`` / ``WaveDataset`` directly.
    """
    T = int(round(seconds * fs))
    log_path = os.path.join(root, mode, "log.tsv")
    noisy_dir = os.path.join(root, mode, "noisy")

    def fit(x: np.ndarray) -> np.ndarray:
        x = x[:T]
        return x if len(x) == T else np.pad(x, (0, T - len(x)))

    pairs = []
    with open(log_path) as log:
        for line in log:
            cf, _nf, _snr, name = line.rstrip("\n").split("\t")
            clean, _ = read_wav(cf, target_fs=fs)
            noisy, _ = read_wav(os.path.join(noisy_dir, name), target_fs=fs)
            pairs.append(np.stack([fit(noisy), fit(clean)]))
    if not pairs:
        raise ValueError(f"no entries in {log_path}")
    np.save(out_path, np.stack(pairs).astype(np.float32))
    return out_path


def main(argv=None):
    """CLI: python -m se_tpu.data.synth [mode] [snr_csv] [fs]
    (reference: generate_noisy_data.py:70-81), or
    python -m se_tpu.data.synth pack [mode] [out.npy] [seconds] [fs]
    to pack the generated wav tree into the training ``.npy``."""
    argv = argv if argv is not None else sys.argv[1:]
    if argv and argv[0] == "pack":
        mode = argv[1] if len(argv) > 1 else "train"
        out = argv[2] if len(argv) > 2 else f"{mode}.npy"
        seconds = float(argv[3]) if len(argv) > 3 else 3.0
        fs = int(argv[4]) if len(argv) > 4 else 16000
        path = pack_corpus(mode, out, seconds, fs)
        print(f"wrote packed corpus: {path}")
        return
    mode = argv[0] if argv else "train"
    snrs = [float(s) for s in (argv[1] if len(argv) > 1 else "0,5").split(",")]
    fs = int(argv[2]) if len(argv) > 2 else 16000
    log = generate_corpus(mode, snrs, fs)
    print(f"wrote corpus log: {log}")


if __name__ == "__main__":
    main()
