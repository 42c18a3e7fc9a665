"""Time-domain training objectives.

Faithful ports of the four selectable losses (reference:
tools_for_loss.py:11-94), including the reference's *non-standard* ``sdr``
form, whose "norms" are dot products and which squares both numerator and
denominator (reference: tools_for_loss.py:17-33).  Models negate these to
minimise (reference: models.py:316-323).
"""

from __future__ import annotations

import jax.numpy as jnp


def remove_dc(data: jnp.ndarray) -> jnp.ndarray:
    return data - jnp.mean(data, axis=-1, keepdims=True)


def l2_norm(s1: jnp.ndarray, s2: jnp.ndarray) -> jnp.ndarray:
    """Dot product along the last axis, kept-dim (reference quirk: this is
    a <s1, s2> inner product, not a norm)."""
    return jnp.sum(s1 * s2, axis=-1, keepdims=True)


def sdr_linear(s1: jnp.ndarray, s2: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    sn = l2_norm(s1, s1)
    sn_m_shn = l2_norm(s1 - s2, s1 - s2)
    return jnp.mean(sn**2 / (sn_m_shn**2 + eps))


def sdr(s1: jnp.ndarray, s2: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Reference 'SDR': 10 log10(<s1,s1>^2 / <s1-s2, s1-s2>^2)."""
    sn = l2_norm(s1, s1)
    sn_m_shn = l2_norm(s1 - s2, s1 - s2)
    return jnp.mean(10 * jnp.log10(sn**2 / (sn_m_shn**2 + eps)))


def si_snr(s1: jnp.ndarray, s2: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Projection-based SI-SNR (reference: tools_for_loss.py:36-44).

    Note the argument order convention: s2 is the reference signal the
    projection is taken on (models call ``si_snr(estimated, target)``).
    """
    s1_s2_norm = l2_norm(s1, s2)
    s2_s2_norm = l2_norm(s2, s2)
    s_target = s1_s2_norm / (s2_s2_norm + eps) * s2
    e_noise = s1 - s_target
    target_norm = l2_norm(s_target, s_target)
    noise_norm = l2_norm(e_noise, e_noise)
    snr = 10 * jnp.log10(target_norm / (noise_norm + eps) + eps)
    return jnp.mean(snr)


def si_sdr(reference: jnp.ndarray, estimation: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Optimal-scaling SI-SDR (reference: tools_for_loss.py:47-94).

    Golden values from the reference docstring are pinned in
    tests/test_losses.py.
    """
    reference_energy = jnp.sum(reference**2, axis=-1, keepdims=True)
    optimal_scaling = (
        jnp.sum(reference * estimation, axis=-1, keepdims=True)
        / reference_energy
        + eps
    )
    projection = optimal_scaling * reference
    noise = estimation - projection
    ratio = (
        jnp.sum(projection**2, axis=-1) / jnp.sum(noise**2, axis=-1) + eps
    )
    ratio = jnp.mean(ratio)
    return 10 * jnp.log10(ratio + eps)


def mse(estimated: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((estimated - target) ** 2)
