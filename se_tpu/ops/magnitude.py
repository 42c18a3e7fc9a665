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
