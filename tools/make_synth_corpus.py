"""Build a real (multi-hundred-utterance) synthetic corpus through the
PRODUCT data pipeline: synthetic clean-speech + noise wav trees ->
``se_tpu.data.synth.generate_corpus`` (the reference's
generate_noisy_data.py workflow) -> ``pack_corpus`` -> the [N, 2, T]
``.npy`` files ``train_interface.py`` consumes.

reference: README.md:33-52 (dataset preparation workflow),
generate_noisy_data.py:70-168 (train: every clean x every SNR with a
random noise file; validation: one random SNR per file).

Run: python tools/make_synth_corpus.py [root] [n_train] [n_valid] [n_test]

Layout written under ``root``:
    train/clean/*.wav   n_train clean utterances (varied f0 speechlike)
    train/noise/*.wav   8 noise files, 10 s each (white / pink / AM /
                        babble-like), shared by every mode
    valid/clean/*.wav   n_valid clean utterances (disjoint f0/seed range)
    test/clean/*.wav    n_test clean utterances (held out from training)
    {mode}/noisy/*.wav + {mode}/log.tsv   from generate_corpus
    train.npy / valid.npy / test.npy      packed [N, 2, 48000] float32
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from se_tpu.data.synth import generate_corpus, pack_corpus, write_wav
from tools.pesq_oracle_battery import speechlike

FS = 16000
SECONDS = 3.0


def make_noise(rng: np.random.Generator, kind: str, n: int) -> np.ndarray:
    if kind == "white":
        x = rng.standard_normal(n)
    elif kind == "pink":
        # 1/f spectral shaping
        spec = np.fft.rfft(rng.standard_normal(n))
        f = np.arange(len(spec), dtype=np.float64)
        f[0] = 1.0
        x = np.fft.irfft(spec / np.sqrt(f), n)
    elif kind == "am":
        t = np.arange(n) / FS
        x = rng.standard_normal(n) * (
            0.6 + 0.4 * np.sin(2 * np.pi * rng.uniform(0.5, 3.0) * t)
        )
    else:  # babble-like: sum of competing speechlike talkers
        x = sum(
            speechlike(rng, n=n, f0=rng.uniform(90, 260)) for _ in range(6)
        )
    return 0.2 * x / np.max(np.abs(x))


def make_clean_tree(root, mode, n, f0_lo, f0_hi, seed):
    rng = np.random.default_rng(seed)
    d = os.path.join(root, mode, "clean")
    os.makedirs(d, exist_ok=True)
    n_samp = int(SECONDS * FS)
    for i in range(n):
        f0 = f0_lo + (f0_hi - f0_lo) * (i / max(n - 1, 1)) + rng.uniform(-2, 2)
        write_wav(
            os.path.join(d, f"{mode}_{i:04d}.wav"),
            speechlike(rng, n=n_samp, f0=f0),
            FS,
        )


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "runs/corpus"
    n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    n_valid = int(sys.argv[3]) if len(sys.argv) > 3 else 48
    n_test = int(sys.argv[4]) if len(sys.argv) > 4 else 24
    os.makedirs(root, exist_ok=True)

    # noise tree (generate_corpus reads {root}/train/noise for every mode)
    rng = np.random.default_rng(1234)
    nd = os.path.join(root, "train", "noise")
    os.makedirs(nd, exist_ok=True)
    kinds = ["white", "pink", "am", "babble"] * 2
    for i, kind in enumerate(kinds):
        write_wav(
            os.path.join(nd, f"noise_{i}_{kind}.wav"),
            make_noise(rng, kind, 10 * FS),
            FS,
        )

    # clean trees: disjoint f0 bands + seeds keep valid/test held out
    make_clean_tree(root, "train", n_train, 80, 200, seed=10)
    make_clean_tree(root, "valid", n_valid, 95, 215, seed=20)
    make_clean_tree(root, "test", n_test, 105, 225, seed=30)

    # the product synthesis CLI path: mix + pack
    generate_corpus("train", [0.0, 5.0], FS, root=root, seed=40)
    generate_corpus("valid", [0.0, 5.0, 10.0], FS, root=root, seed=41)
    generate_corpus("test", [0.0, 5.0, 10.0], FS, root=root, seed=42)
    for mode in ("train", "valid", "test"):
        out = os.path.join(root, f"{mode}.npy")
        pack_corpus(mode, out, SECONDS, FS, root=root)
        arr = np.load(out, mmap_mode="r")
        print(f"{out}: {arr.shape} {arr.dtype}")


if __name__ == "__main__":
    main()
