"""Loss dispatch mirroring the per-model ``loss()`` dispatchers.

reference: models.py:303-323 (DCCRN), :551-565 (CRN), :674-682 (FullSubNet).
"""

from __future__ import annotations

import jax.numpy as jnp

from .core import sdr, si_snr, si_sdr, mse
from .lms import lms_loss


def main_loss(loss_name: str, estimated: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    if loss_name == "MSE":
        return mse(estimated, target)
    if loss_name == "SDR":
        return -sdr(target, estimated)
    if loss_name == "SI-SNR":
        return -si_snr(estimated, target)
    if loss_name == "SI-SDR":
        return -si_sdr(target, estimated)
    raise ValueError(f"unknown loss {loss_name!r}")


def perceptual_loss(
    perceptual_name: str,
    target_wav: jnp.ndarray,
    estimated_wav: jnp.ndarray,
    clean_mags: jnp.ndarray | None = None,
    est_mags: jnp.ndarray | None = None,
) -> jnp.ndarray:
    if perceptual_name == "LMS":
        assert clean_mags is not None and est_mags is not None
        return lms_loss(clean_mags, est_mags)
    if perceptual_name == "PMSQE":
        from .pmsqe import pmsqe_loss

        return pmsqe_loss(target_wav, estimated_wav)
    raise ValueError(f"unknown perceptual loss {perceptual_name!r}")
