"""PMSQE perceptual loss properties: zero at identity, monotone in
degradation, differentiable."""

import numpy as np
import jax
import jax.numpy as jnp

from se_tpu.losses.pmsqe import pmsqe_loss
from tools.pesq_oracle_battery import speechlike


def test_zero_for_identical():
    x = speechlike(np.random.default_rng(0), n=16000)
    assert float(pmsqe_loss(x[None], x[None].copy())) < 1e-6


def test_monotonic_in_noise():
    rng = np.random.default_rng(1)
    x = speechlike(rng, n=16000)
    losses = []
    for snr in (30, 15, 5):
        n = rng.standard_normal(len(x))
        n *= np.sqrt(np.mean(x**2) / np.mean(n**2) * 10 ** (-snr / 10))
        losses.append(float(pmsqe_loss(x[None], (x + n)[None])))
    assert losses[0] < losses[1] < losses[2], losses


def test_gradients_flow():
    rng = np.random.default_rng(2)
    x = jnp.asarray(speechlike(rng, n=16000), jnp.float32)[None]
    y = x + 0.01 * jnp.asarray(rng.standard_normal(x.shape), jnp.float32)

    g = jax.grad(lambda deg: pmsqe_loss(x, deg))(y)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


def test_perceptual_train_step_with_pmsqe():
    """End-to-end: DCCRN + PMSQE perceptual trainer variant runs."""
    from se_tpu.train import create_train_state, make_train_step
    from tests.test_models import small_cfg
    from tests.test_train_step import _batch

    cfg = small_cfg(model="DCCRN", loss="SDR", perceptual="PMSQE")
    model, state = create_train_state(cfg)
    step = make_train_step(cfg, model)
    noisy, clean = _batch(cfg)
    state, metrics = step(state, noisy, clean, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert "perceptual_loss" in metrics


def test_loudness_matches_p862_intensity_warping():
    """PMSQE's Zwicker loudness is the SAME math as the P.862 model's
    intensity warping, which is validated to +-0.0001 MOS against the ITU
    oracle binary (tools/pesq_oracle_battery.py); pin the shared
    implementation numerically."""
    from se_tpu.eval import pesq_np as P
    from se_tpu.losses import pmsqe as M

    rng = np.random.default_rng(3)
    bark = np.abs(rng.standard_normal((4, M.NB))) * 1e6  # [T, NB] rows
    ours = np.asarray(M._loudness(jnp.asarray(bark)[None]))[0]
    spec = P._intensity_warping(bark)
    np.testing.assert_allclose(ours, spec, rtol=1e-5, atol=1e-8)


def test_bark_grouping_matches_p862_freq_warping():
    """The bark matrix reproduces P.862 freq_warping (band grouping +
    power-density correction + Sp) exactly on power-spectrum rows."""
    from se_tpu.eval import pesq_np as P
    from se_tpu.losses import pmsqe as M

    rng = np.random.default_rng(4)
    hz = np.abs(rng.standard_normal((3, M.NFFT // 2 + 1))) * 1e4
    ours = np.asarray(jnp.asarray(hz) @ M._bark_matrix())
    # P.862 partitions bins 0..255; the Nyquist row of the matrix is zero
    spec = P._freq_warping(hz[:, : M.NFFT // 2])
    np.testing.assert_allclose(ours, spec, rtol=1e-5)


def test_golden_parity_vs_asteroid_restatement():
    """Numerical pin of the full loss against the loop-style restatement
    of the reference's asteroid path (tests/oracles/asteroid_pmsqe.py):
    chunking, magnitude front-end, SLL, bark/gain equalization, loudness,
    distortion aggregation, frame weighting — and, because the oracle
    evaluates the FULL PIT permutation search over chunks while the
    framework uses the identity permutation, it also proves identity is
    the PIT minimiser for time-ordered chunks."""
    from tests.oracles.asteroid_pmsqe import pmsqe_ref

    rng = np.random.default_rng(6)
    with jax.enable_x64(True):
        for snr, n_sec in ((20, 2), (5, 2), (0, 1), (10, 3)):
            clean = np.stack(
                [speechlike(np.random.default_rng(7 + i), n=16000 * n_sec)
                 for i in range(2)]
            )
            noise = rng.standard_normal(clean.shape)
            noise *= np.sqrt(
                np.mean(clean**2) / np.mean(noise**2) * 10 ** (-snr / 10)
            )
            deg = clean + noise
            mine = float(
                pmsqe_loss(jnp.asarray(clean, jnp.float64),
                           jnp.asarray(deg, jnp.float64))
            )
            ref = pmsqe_ref(deg, clean)
            np.testing.assert_allclose(mine, ref, rtol=1e-6), (snr, n_sec)


def test_anticorrelates_with_true_pesq():
    """Fitness-for-purpose: over degradations PESQ can discriminate, the
    loss must rise strictly as the +-0.0001-validated P.862 MOS falls —
    evidence no package pin could give (the ITU scorer is the ground
    truth PMSQE approximates)."""
    from scipy.signal import butter, sosfilt
    from se_tpu.eval.pesq_np import pesq_np

    rng = np.random.default_rng(8)
    clean = speechlike(np.random.default_rng(9), n=16000)
    sos = butter(4, [300, 3400], "bandpass", fs=16000, output="sos")
    losses, moses = [], []
    for snr in (45, 35, 25):
        noise = sosfilt(sos, rng.standard_normal(len(clean)))
        noise *= np.sqrt(
            np.mean(clean**2) / np.mean(noise**2) * 10 ** (-snr / 10)
        )
        deg = clean + noise
        losses.append(float(pmsqe_loss(clean[None], deg[None])))
        moses.append(pesq_np(clean, deg, 16000))
    assert losses[0] < losses[1] < losses[2], losses
    assert moses[0] > moses[1] > moses[2], moses


def test_non_whole_second_trims_to_prefix():
    """Lengths that are not whole seconds are trimmed before chunking, so
    per-segment statistics are guaranteed (advisor round-2 item: the old
    code silently fell back to per-utterance statistics)."""
    rng = np.random.default_rng(10)
    x = speechlike(rng, n=40000)  # 2.5 s
    y = x + 0.05 * rng.standard_normal(len(x))
    full = float(pmsqe_loss(x[None], y[None]))
    prefix = float(pmsqe_loss(x[None, :32000], y[None, :32000]))
    np.testing.assert_allclose(full, prefix, rtol=1e-6)


def test_one_second_chunking_matches_reference_reshape():
    """Chunked scoring equals scoring the reference's view(N, -1, fs)
    segments as a batch (tools_for_loss.py:264-265)."""
    rng = np.random.default_rng(5)
    x = speechlike(rng, n=48000)  # 3 s
    y = x + 0.05 * rng.standard_normal(len(x))
    whole = float(pmsqe_loss(x[None], y[None]))
    chunks_x = x.reshape(3, 16000)
    chunks_y = y.reshape(3, 16000)
    batched = float(pmsqe_loss(chunks_x, chunks_y))
    np.testing.assert_allclose(whole, batched, rtol=1e-6)
