"""Zero-preparation end-to-end tutorial: CRN + E-mask + MSE on synthetic
data, CPU-runnable — the SE_tutorials.ipynb equivalent (reference:
SE_tutorials.ipynb, README.md:55-57).

Run: python examples/tutorial.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from se_tpu.config import Config, TrainConfig, DccrnConfig, CrnConfig
    from se_tpu.train.loop import Trainer

    # Tutorial-scale CRN (narrow channels so CPU epochs are quick)
    cfg = Config(
        model="CRN",
        loss="MSE",
        lstm="real",
        masking_mode="E",
        dccrn=DccrnConfig(kernel_num=(8, 16, 16, 32, 32, 32)),
        crn=CrnConfig(rnn_input_size=(32 // 2) * 4, rnn_units=32),
        train=TrainConfig(
            max_epochs=2, batch=10, job_dir="./models/", logs_dir="./logs/"
        ),
    )

    # Synthetic corpus in the reference's [N, 2, T] layout: the notebook
    # uses np.ones; noisy-speech-shaped noise trains more meaningfully.
    rng = np.random.default_rng(0)
    t = np.arange(16000) / 16000.0
    clean = 0.2 * np.sin(2 * np.pi * 440 * t) * np.clip(
        np.sin(2 * np.pi * 3 * t), 0, None
    )

    def make(n, seed):
        r = np.random.default_rng(seed)
        out = np.empty((n, 2, 16000), np.float32)
        for i in range(n):
            noise = 0.05 * r.standard_normal(16000)
            out[i, 0] = clean + noise  # noisy
            out[i, 1] = clean  # clean
        return out

    train_data, valid_data = make(300, 1), make(50, 2)

    trainer = Trainer(cfg, train_data, valid_data)
    trainer.setup()
    mse = trainer.run()
    print("validation losses per epoch:", mse[: cfg.train.max_epochs])


if __name__ == "__main__":
    main()
