"""Normalisation family: torch-parity BatchNorm, complex whitening BN, and
the FullSubNet online/offline magnitude norms.

reference: tools_for_model.py:430-607 (ComplexBatchNorm) and :880-1104
(the six FullSubNet normalisations).  The python-loop EMAs
(``forgetting_norm``/``sband_forgetting_norm``) become ``lax.scan``;
the cumulative norms are vectorised cumsums.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

EPSILON = float(np.finfo(np.float32).eps)


# ---------------------------------------------------------------------------
# BatchNorm2d, torch semantics (train: biased batch stats normalise,
# unbiased stats update the running buffers with momentum lerp)
# ---------------------------------------------------------------------------

def batch_norm_2d(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    running_mean: jnp.ndarray,
    running_var: jnp.ndarray,
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
):
    """[B, C, H, W] batch norm. Returns (y, new_running_mean, new_running_var).

    Mixed precision: statistics accumulate in f32 regardless of x.dtype
    (``jnp.mean(..., dtype=f32)`` fuses the upconvert into the reduce), the
    elementwise normalisation runs in x.dtype so bf16 activations never
    materialise f32 copies, and the running buffers stay f32.
    """
    if train:
        mean = jnp.mean(x, axis=(0, 2, 3), dtype=jnp.float32)
        xc = x - mean.astype(x.dtype)[None, :, None, None]
        var = jnp.mean(jnp.square(xc), axis=(0, 2, 3), dtype=jnp.float32)
        n = x.shape[0] * x.shape[2] * x.shape[3]
        unbiased = var * n / max(n - 1, 1)
        new_mean = (1 - momentum) * running_mean + momentum * mean
        new_var = (1 - momentum) * running_var + momentum * unbiased
    else:
        mean, var = running_mean, running_var
        new_mean, new_var = running_mean, running_var
    inv = lax.rsqrt(var + eps)
    y = (x - mean.astype(x.dtype)[None, :, None, None]) * (
        (scale * inv).astype(x.dtype)
    )[None, :, None, None]
    y = y + bias.astype(x.dtype)[None, :, None, None]
    return y, new_mean, new_var


# ---------------------------------------------------------------------------
# Complex (whitening) BatchNorm — reference: tools_for_model.py:430-607
# ---------------------------------------------------------------------------

class ComplexBnState(NamedTuple):
    RMr: jnp.ndarray
    RMi: jnp.ndarray
    RVrr: jnp.ndarray
    RVri: jnp.ndarray
    RVii: jnp.ndarray


def complex_batch_norm(
    x: jnp.ndarray,  # [B, 2C, H, W], real block over imag block on channels
    Wrr: jnp.ndarray,
    Wri: jnp.ndarray,
    Wii: jnp.ndarray,
    Br: jnp.ndarray,
    Bi: jnp.ndarray,
    state: ComplexBnState,
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, ComplexBnState]:
    """2x2 covariance whitening complex BN.  Channel axis split in halves."""
    C2 = x.shape[1]
    xr, xi = x[:, : C2 // 2], x[:, C2 // 2 :]
    vdim = (1, C2 // 2, 1, 1)
    redux = (0, 2, 3)

    if train:
        Mr = jnp.mean(xr, axis=redux, keepdims=True)
        Mi = jnp.mean(xi, axis=redux, keepdims=True)
        new_RMr = (1 - momentum) * state.RMr + momentum * Mr.reshape(-1)
        new_RMi = (1 - momentum) * state.RMi + momentum * Mi.reshape(-1)
    else:
        Mr, Mi = state.RMr.reshape(vdim), state.RMi.reshape(vdim)
        new_RMr, new_RMi = state.RMr, state.RMi
    xr, xi = xr - Mr, xi - Mi

    if train:
        Vrr = jnp.mean(xr * xr, axis=redux, keepdims=True)
        Vri = jnp.mean(xr * xi, axis=redux, keepdims=True)
        Vii = jnp.mean(xi * xi, axis=redux, keepdims=True)
        new_RVrr = (1 - momentum) * state.RVrr + momentum * Vrr.reshape(-1)
        new_RVri = (1 - momentum) * state.RVri + momentum * Vri.reshape(-1)
        new_RVii = (1 - momentum) * state.RVii + momentum * Vii.reshape(-1)
    else:
        Vrr, Vri, Vii = (
            state.RVrr.reshape(vdim),
            state.RVri.reshape(vdim),
            state.RVii.reshape(vdim),
        )
        new_RVrr, new_RVri, new_RVii = state.RVrr, state.RVri, state.RVii
    Vrr = Vrr + eps
    Vii = Vii + eps

    # inverse matrix square root of [[Vrr, Vri], [Vri, Vii]]
    tau = Vrr + Vii
    delta = Vrr * Vii - Vri * Vri
    s = jnp.sqrt(delta)
    t = jnp.sqrt(tau + 2 * s)
    rst = 1.0 / (s * t)
    Urr = (s + Vii) * rst
    Uii = (s + Vrr) * rst
    Uri = -Vri * rst

    Wrr_, Wri_, Wii_ = (
        Wrr.reshape(vdim),
        Wri.reshape(vdim),
        Wii.reshape(vdim),
    )
    Zrr = Wrr_ * Urr + Wri_ * Uri
    Zri = Wrr_ * Uri + Wri_ * Uii
    Zir = Wri_ * Urr + Wii_ * Uri
    Zii = Wri_ * Uri + Wii_ * Uii

    yr = Zrr * xr + Zri * xi + Br.reshape(vdim)
    yi = Zir * xr + Zii * xi + Bi.reshape(vdim)
    out = jnp.concatenate([yr, yi], axis=1)
    return out, ComplexBnState(new_RMr, new_RMi, new_RVrr, new_RVri, new_RVii)


# ---------------------------------------------------------------------------
# FullSubNet normalisations — reference: tools_for_model.py:880-1104
# ---------------------------------------------------------------------------

def offline_laplace_norm(x: jnp.ndarray, valid_frames=None) -> jnp.ndarray:
    """Utterance-level mean norm, [B, C, F, T] (the config default).

    Statistics accumulate in f32 regardless of x.dtype (bf16 compute
    path); the elementwise division runs in x.dtype.

    ``valid_frames`` (traced, optional): statistics over the first
    ``valid_frames`` time frames only, with that count as the denominator
    — the pad-aware form that makes length-bucketed jit compiles exact on
    the valid prefix (enhance.py; frames at/after ``valid_frames`` are
    excluded from the sum AND the count, so trailing pad cannot rescale
    the utterance — reference semantics: tools_for_model.py:997-1011
    normalise the exact-length utterance).  Scalar (one count for the
    whole batch) or per-sample [B] / [B, 1, 1, 1] (enhance.py --batch
    groups different true lengths into one device batch)."""
    if valid_frames is None:
        mu = jnp.mean(x, axis=(1, 2, 3), keepdims=True, dtype=jnp.float32)
    else:
        vf = jnp.reshape(jnp.asarray(valid_frames), (-1, 1, 1, 1))
        tmask = (jnp.arange(x.shape[3]) < vf).astype(jnp.float32)
        n = x.shape[1] * x.shape[2] * vf.astype(jnp.float32)
        mu = (
            jnp.sum(
                x.astype(jnp.float32) * tmask, axis=(1, 2, 3), keepdims=True
            )
            / n
        )
    return x / (mu + 1e-5).astype(x.dtype)


def cumulative_laplace_norm(x: jnp.ndarray, valid_frames=None) -> jnp.ndarray:
    """Streaming mean norm via cumsum, [B, C, F, T] (f32 statistics).

    ``valid_frames`` is accepted for signature uniformity with the
    offline norms and ignored: the statistic is a causal prefix mean, so
    trailing pad frames cannot influence the valid prefix."""
    B, C, F, T = x.shape
    xr = x.reshape(B * C, F, T)
    step_sum = jnp.sum(xr, axis=1, dtype=jnp.float32)  # [BC, T]
    cum_sum = jnp.cumsum(step_sum, axis=-1)
    entry_count = jnp.arange(F, F * T + 1, F, dtype=jnp.float32)[None, :]
    cum_mean = (cum_sum / entry_count)[:, None, :]  # [BC, 1, T]
    return (xr / (cum_mean + EPSILON).astype(x.dtype)).reshape(B, C, F, T)


def offline_gaussian_norm(x: jnp.ndarray, valid_frames=None) -> jnp.ndarray:
    """Utterance zero-norm; std is unbiased like torch.std (f32 stats).

    ``valid_frames``: pad-aware masked statistics, like
    ``offline_laplace_norm`` (scalar or per-sample; the output at masked
    frames is garbage by contract — callers crop it)."""
    xf = x.astype(jnp.float32)
    if valid_frames is None:
        mu = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
        n = x.shape[1] * x.shape[2] * x.shape[3]
        var = jnp.var(xf, axis=(1, 2, 3), keepdims=True) * n / max(n - 1, 1)
    else:
        vf = jnp.reshape(jnp.asarray(valid_frames), (-1, 1, 1, 1))
        tmask = (jnp.arange(x.shape[3]) < vf).astype(jnp.float32)
        n = x.shape[1] * x.shape[2] * vf.astype(jnp.float32)
        mu = jnp.sum(xf * tmask, axis=(1, 2, 3), keepdims=True) / n
        var = (
            jnp.sum(jnp.square(xf - mu) * tmask, axis=(1, 2, 3),
                    keepdims=True)
            / jnp.maximum(n - 1, 1.0)
        )
    return ((x - mu.astype(x.dtype))
            / (jnp.sqrt(var) + 1e-5).astype(x.dtype))


def cumulative_layer_norm(x: jnp.ndarray, valid_frames=None) -> jnp.ndarray:
    """Online zero-norm via cumsums of x and x^2, [B, C, F, T]
    (f32 statistics).  ``valid_frames`` accepted-and-ignored (causal
    prefix statistic, like cumulative_laplace_norm)."""
    B, C, F, T = x.shape
    xr = x.reshape(B * C, F, T)
    step_sum = jnp.sum(xr, axis=1, dtype=jnp.float32)
    step_pow = jnp.sum(jnp.square(xr.astype(jnp.float32)), axis=1)
    cum_sum = jnp.cumsum(step_sum, axis=-1)
    cum_pow = jnp.cumsum(step_pow, axis=-1)
    entry_count = jnp.arange(F, F * T + 1, F, dtype=jnp.float32)[None, :]
    cum_mean = cum_sum / entry_count
    cum_var = (cum_pow - 2 * cum_mean * cum_sum) / entry_count + cum_mean**2
    cum_std = jnp.sqrt(cum_var + EPSILON)
    out = (xr - cum_mean[:, None, :].astype(x.dtype)) \
        / cum_std[:, None, :].astype(x.dtype)
    return out.reshape(B, C, F, T)


def _ema_mu(frame_stat: jnp.ndarray, alp: jnp.ndarray) -> jnp.ndarray:
    """mu_t = alp_t * mu_{t-1} + (1 - alp_t) * stat_t as a scan. [B, T] -> [B, T]."""
    def step(mu, inp):
        a, s = inp
        mu = a * mu + (1 - a) * s
        return mu, mu

    B, T = frame_stat.shape
    _, mus = lax.scan(step, jnp.zeros((B,), frame_stat.dtype),
                      (alp, frame_stat.T))
    return mus.T  # [B, T]


def forgetting_norm(x: jnp.ndarray, sample_length: int) -> jnp.ndarray:
    """EMA mean norm with the reference's warm-up quirk.

    reference: tools_for_model.py:916-948 — during warm-up,
    alp_t = min((t - 1) / (t + 1), alpha) (negative at t = 0); after
    ``sample_length`` frames it is constant alpha. Frame statistic is the
    frequency mean throughout.
    """
    B, F, T = x.shape
    alpha = (sample_length - 1) / (sample_length + 1)
    t_idx = jnp.arange(T, dtype=x.dtype)
    alp = jnp.where(
        t_idx < sample_length,
        jnp.minimum((t_idx - 1) / (t_idx + 1), alpha),
        alpha,
    )
    frame_mean = jnp.mean(x, axis=1)  # [B, T]
    mu = _ema_mu(frame_mean, alp)
    return x / (mu[:, None, :] + 1e-10)


def sband_forgetting_norm(x: jnp.ndarray, train_sample_length: int) -> jnp.ndarray:
    """Like forgetting_norm, but after warm-up the statistic is the value of
    the centre frequency bin (reference: tools_for_model.py:881-913)."""
    B, F, T = x.shape
    alpha = (train_sample_length - 1) / (train_sample_length + 1)
    t_idx = jnp.arange(T, dtype=x.dtype)
    warm = t_idx < train_sample_length
    alp = jnp.where(warm, jnp.minimum((t_idx - 1) / (t_idx + 1), alpha), alpha)
    frame_mean = jnp.mean(x, axis=1)  # [B, T]
    center = x[:, F // 2 - 1, :]  # [B, T]
    stat = jnp.where(warm[None, :], frame_mean, center)
    mu = _ema_mu(stat, alp)
    return x / (mu[:, None, :] + 1e-10)


def hybrid_norm(x: jnp.ndarray, sample_length: int = 192) -> jnp.ndarray:
    """EMA warm-up then cumulative mean (reference: tools_for_model.py:951-994)."""
    B, F, T = x.shape
    alpha = (sample_length - 1) / (sample_length + 1)
    t_idx = jnp.arange(T, dtype=x.dtype)
    alp = jnp.where(
        t_idx < sample_length,
        jnp.minimum((t_idx - 1) / (t_idx + 1), alpha),
        alpha,
    )
    frame_mean = jnp.mean(x, axis=1)
    mu_warm = _ema_mu(frame_mean, alp)  # [B, T]
    step_sum = jnp.sum(x, axis=1)
    cum_sum = jnp.cumsum(step_sum, axis=-1)
    entry_count = jnp.arange(F, F * T + 1, F, dtype=x.dtype)[None, :]
    cum_mean = cum_sum / entry_count
    mu = jnp.where(t_idx[None, :] < sample_length, mu_warm, cum_mean)
    return x / (mu[:, None, :] + 1e-10)


# -- carried (chunk-streaming) variants of the cumulative norms ------------
#
# The cumulative norms are causal prefix statistics, so a stream can process
# whole chunks at a time carrying only (running sums, entry count); the
# result is bit-equivalent to the batch cumsum over the concatenated chunks.

def init_cumulative_carry(n_rows: int, with_pow: bool):
    """Fresh carry for ``B*C`` rows: (sum, [pow_sum,] entry_count)."""
    zeros = jnp.zeros((n_rows,), jnp.float32)
    if with_pow:
        return (zeros, zeros, jnp.zeros((), jnp.float32))
    return (zeros, jnp.zeros((), jnp.float32))


def cumulative_laplace_norm_carry(x: jnp.ndarray, carry):
    """Chunk of [B, C, F, T] + carry -> (normed, new_carry).

    Statistics accumulate in f32 regardless of x.dtype (like the batch
    ``cumulative_laplace_norm``): bf16 sums drift, and even the bf16
    entry count rounds (257 -> 256), so x.dtype statistics would break
    the chunk-vs-batch bit-equivalence this module promises."""
    B, C, F, T = x.shape
    xr = x.reshape(B * C, F, T)
    step_sum = jnp.sum(xr.astype(jnp.float32), axis=1)  # [BC, T]
    prev_sum, prev_count = carry
    cum_sum = prev_sum[:, None] + jnp.cumsum(step_sum, axis=-1)
    entry_count = prev_count + jnp.arange(
        F, F * T + 1, F, dtype=jnp.float32
    )[None, :]
    cum_mean = (cum_sum / entry_count)[:, None, :].astype(x.dtype)
    y = (xr / (cum_mean + EPSILON)).reshape(B, C, F, T)
    return y, (cum_sum[:, -1], prev_count + F * T)


def cumulative_layer_norm_carry(x: jnp.ndarray, carry):
    """Chunk of [B, C, F, T] + carry -> (normed, new_carry).

    f32 statistics regardless of x.dtype (see
    ``cumulative_laplace_norm_carry``)."""
    B, C, F, T = x.shape
    xr = x.reshape(B * C, F, T)
    xf = xr.astype(jnp.float32)
    step_sum = jnp.sum(xf, axis=1)
    step_pow = jnp.sum(jnp.square(xf), axis=1)
    prev_sum, prev_pow, prev_count = carry
    cum_sum = prev_sum[:, None] + jnp.cumsum(step_sum, axis=-1)
    cum_pow = prev_pow[:, None] + jnp.cumsum(step_pow, axis=-1)
    entry_count = prev_count + jnp.arange(
        F, F * T + 1, F, dtype=jnp.float32
    )[None, :]
    cum_mean = cum_sum / entry_count
    cum_var = (cum_pow - 2 * cum_mean * cum_sum) / entry_count + cum_mean**2
    cum_std = jnp.sqrt(cum_var + EPSILON)
    y = (xr - cum_mean[:, None, :].astype(x.dtype)) / cum_std[
        :, None, :
    ].astype(x.dtype)
    return (
        y.reshape(B, C, F, T),
        (cum_sum[:, -1], cum_pow[:, -1], prev_count + F * T),
    )


def stream_norm_wrapper(norm_type: str):
    """(norm_fn(x, carry) -> (y, carry), init_fn(n_rows) -> carry) for the
    streaming-capable norms; raises for the offline (utterance-level) ones,
    which have no causal form (reference: tools_for_model.py:997-1061)."""
    if norm_type == "cumulative_laplace_norm":
        return cumulative_laplace_norm_carry, lambda n: init_cumulative_carry(n, False)
    if norm_type == "cumulative_layer_norm":
        return cumulative_layer_norm_carry, lambda n: init_cumulative_carry(n, True)
    raise NotImplementedError(
        f"streaming requires a cumulative norm, got {norm_type!r}"
    )


def norm_wrapper(norm_type: str):
    """Select a norm by name (reference: tools_for_model.py:1106-1118)."""
    table = {
        "offline_laplace_norm": offline_laplace_norm,
        "cumulative_laplace_norm": cumulative_laplace_norm,
        "offline_gaussian_norm": offline_gaussian_norm,
        "cumulative_layer_norm": cumulative_layer_norm,
    }
    if norm_type not in table:
        raise NotImplementedError(
            "You must set up a type of Norm, e.g. offline_laplace_norm, "
            f"cumulative_laplace_norm, ...; got {norm_type!r}"
        )
    return table[norm_type]
