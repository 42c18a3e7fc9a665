"""Compressed complex ideal ratio mask (cIRM) toolkit.

reference: tools_for_model.py:687-723 — the FullSubNet training target and
inference decode.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

EPSILON = float(np.finfo(np.float32).eps)


def build_complex_ideal_ratio_mask(
    noisy: jnp.ndarray, clean: jnp.ndarray
) -> jnp.ndarray:
    """[B, F, T] complex noisy/clean -> [B, F, T, 2] compressed cIRM."""
    nr, ni = jnp.real(noisy), jnp.imag(noisy)
    cr, ci = jnp.real(clean), jnp.imag(clean)
    denominator = jnp.square(nr) + jnp.square(ni) + EPSILON
    mask_real = (nr * cr + ni * ci) / denominator
    mask_imag = (nr * ci - ni * cr) / denominator
    mask = jnp.stack((mask_real, mask_imag), axis=-1)
    return compress_cIRM(mask, K=10, C=0.1)


def compress_cIRM(mask: jnp.ndarray, K: float = 10, C: float = 0.1) -> jnp.ndarray:
    """Compress (-inf, inf) -> (-K, K) with the tanh-style map."""
    mask = jnp.where(mask <= -100, -100.0, mask)
    return K * (1 - jnp.exp(-C * mask)) / (1 + jnp.exp(-C * mask))


def decompress_cIRM(mask: jnp.ndarray, K: float = 10, limit: float = 9.9) -> jnp.ndarray:
    mask = jnp.clip(mask, -limit, limit)
    return -K * jnp.log((K - mask) / (K + mask))
