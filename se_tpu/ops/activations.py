"""Activations with torch-parity parameterisation."""

from __future__ import annotations

import jax.numpy as jnp


def prelu(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """torch nn.PReLU: max(0, x) + alpha * min(0, x).

    ``alpha`` is a scalar array (torch default num_parameters=1, init 0.25,
    as used by the reference at models.py:78).  Cast to x.dtype so a bf16
    activation path is not silently promoted back to f32.
    """
    return jnp.maximum(x, 0) + alpha.astype(x.dtype) * jnp.minimum(x, 0)
