"""NaN-safe complex magnitude.

``sqrt(r**2 + i**2)`` has a 0/0 gradient at the origin: whenever a bin's
real and imaginary parts are both exactly zero, the backward pass emits
NaN and poisons every weight.  The reference has exactly this hazard
(models.py:259 mask magnitudes, tools_for_model.py:63-68 ConvSTFT 'real'
mode) — in f32 exact zeros are rare enough to go unnoticed, but the bf16
activation path rounds small products to exact zero readily, which is how
long bf16 training runs diverged.

``complex_mag`` keeps the forward bit-identical to the naive expression
(so weight-identical golden parity with the torch oracle holds) and
defines the gradient at the origin as 0 — the standard subgradient
choice; the reference's NaN there is a defect, not a semantic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_jvp
def complex_mag(real: jnp.ndarray, imag: jnp.ndarray) -> jnp.ndarray:
    return (real**2 + imag**2) ** 0.5


@complex_mag.defjvp
def _complex_mag_jvp(primals, tangents):
    real, imag = primals
    dr, di = tangents
    m = complex_mag(real, imag)
    denom = jnp.where(m > 0, m, 1.0)
    return m, (real * dr + imag * di) / denom


@jax.custom_jvp
def safe_arctan2(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """arctan2 with a finite (zero) gradient at the origin.

    The true gradient is (x*dy - y*dx) / (x^2 + y^2), which is 0/0 when
    both arguments are exactly zero — the second half of the all-zero-bin
    hazard (the DCCRN E-mask takes arctan2 of the normalised mask parts,
    reference models.py:262-265).  Forward is bit-identical to
    ``jnp.arctan2``."""
    return jnp.arctan2(y, x)


@safe_arctan2.defjvp
def _safe_arctan2_jvp(primals, tangents):
    y, x = primals
    dy, dx = tangents
    denom = x * x + y * y
    safe = jnp.where(denom > 0, denom, 1.0)
    return jnp.arctan2(y, x), (x * dy - y * dx) / safe
