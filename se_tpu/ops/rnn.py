"""Scan-based LSTM / GRU cells with PyTorch weight semantics.

TPU-first design: the input projection for *all* timesteps is hoisted out
of the recurrence into one large MXU GEMM, so the ``lax.scan`` body carries
only the [B,H] x [H,4H] hidden matmul.  ``lstm_stack`` additionally runs N
independent same-shape LSTMs in a single scan (leading "stack" axis),
which is how the complex LSTM's four real applications
(reference: tools_for_model.py:141-177) collapse into one recurrence.

Weight layout matches torch (w_ih [4H, In], w_hh [4H, H], gate order
i,f,g,o for LSTM; r,z,n for GRU) so parity tests can load torch weights
verbatim.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

# Precision of the hoisted input-projection GEMMs.  DEFAULT (bf16-input
# MXU passes with f32 accumulation) measures ~15% faster than HIGHEST on
# the whole complex-LSTM block on v5e with no training-quality impact;
# the recurrent matmul inside the scan always runs at default precision.
# CPU parity tests are unaffected (lax precision is a TPU-only hint).
INPUT_PROJ_PRECISION = lax.Precision.DEFAULT


class LstmParams(NamedTuple):
    w_ih: jnp.ndarray  # [4H, In]
    w_hh: jnp.ndarray  # [4H, H]
    b_ih: jnp.ndarray  # [4H]
    b_hh: jnp.ndarray  # [4H]


def init_lstm_params(key, input_size: int, hidden_size: int) -> LstmParams:
    """torch nn.LSTM default init: U(-1/sqrt(H), 1/sqrt(H)) on every tensor."""
    k = 1.0 / jnp.sqrt(hidden_size)
    ks = jax.random.split(key, 4)
    u = lambda kk, shape: jax.random.uniform(kk, shape, jnp.float32, -k, k)
    return LstmParams(
        w_ih=u(ks[0], (4 * hidden_size, input_size)),
        w_hh=u(ks[1], (4 * hidden_size, hidden_size)),
        b_ih=u(ks[2], (4 * hidden_size,)),
        b_hh=u(ks[3], (4 * hidden_size,)),
    )


def init_gru_params(key, input_size: int, hidden_size: int) -> LstmParams:
    """torch nn.GRU default init (3H gate rows)."""
    k = 1.0 / jnp.sqrt(hidden_size)
    ks = jax.random.split(key, 4)
    u = lambda kk, shape: jax.random.uniform(kk, shape, jnp.float32, -k, k)
    return LstmParams(
        w_ih=u(ks[0], (3 * hidden_size, input_size)),
        w_hh=u(ks[1], (3 * hidden_size, hidden_size)),
        b_ih=u(ks[2], (3 * hidden_size,)),
        b_hh=u(ks[3], (3 * hidden_size,)),
    )


def _lstm_scan(x_proj: jnp.ndarray, w_hh: jnp.ndarray, hidden_size: int,
               h0=None, c0=None, unroll: int = 4,
               carry_dtype=None, out_dtype=None):
    """x_proj: [T, ..., 4H] precomputed input projection (+ biases).

    ``carry_dtype``/``out_dtype`` enable the mixed-precision recurrence:
    a bf16 x_proj stream and bf16 emitted outputs (halving the HBM
    traffic of the sequential phase and its backward stash) around an
    f32 (h, c) carry and f32 gate arithmetic — bf16 CARRIES compound
    roundoff over the ~481-step recurrence and NaN by step ~150
    (docs/PERF.md), but bf16 streams around an f32 core do not.
    """
    H = hidden_size
    cdt = carry_dtype or x_proj.dtype
    odt = out_dtype or x_proj.dtype
    batch_shape = x_proj.shape[1:-1]
    h = (jnp.zeros((*batch_shape, H), cdt) if h0 is None
         else h0.astype(cdt))
    c = (jnp.zeros((*batch_shape, H), cdt) if c0 is None
         else c0.astype(cdt))
    w_hh_t = w_hh.swapaxes(-1, -2).astype(cdt)  # [..., H, 4H]

    def step(carry, xp):
        h, c = carry
        gates = xp.astype(cdt) + h @ w_hh_t
        i = jax.nn.sigmoid(gates[..., 0 * H : 1 * H])
        f = jax.nn.sigmoid(gates[..., 1 * H : 2 * H])
        g = jnp.tanh(gates[..., 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[..., 3 * H : 4 * H])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h.astype(odt)

    # unroll amortises per-step dispatch overhead on TPU; numerics unchanged
    (h, c), ys = lax.scan(step, (h, c), x_proj, unroll=unroll)
    return ys, (h, c)


def lstm(
    params: LstmParams,
    x: jnp.ndarray,
    h0: Optional[jnp.ndarray] = None,
    c0: Optional[jnp.ndarray] = None,
    unroll: int = 4,
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Single-layer unidirectional LSTM. x: [T, B, In] -> [T, B, H].

    ``use_pallas`` (f32 path) runs the fused in-projection kernel
    (se_tpu/ops/pallas_lstm.py): the input GEMM happens per step in VMEM
    and only (ys, cs) is stashed for the backward — O(T*B*H) residual
    memory instead of the hoisted x_proj's O(T*B*4H), which is what OOMs
    FullSubNet's B*257-row sub-band batch (docs/PERF.md round-3).

    bf16 inputs always use MIXED semantics — bf16 streams around an f32
    (h, c) carry and f32 gates (a fully-bf16 recurrence compounds
    roundoff; docs/PERF.md) — identically in the Pallas and scan paths.
    """
    H = params.w_hh.shape[1]
    ctx = current_shard_context()
    if resolve_pallas(use_pallas) and (
        ctx is None or _mesh_fits(ctx, x.shape[1])
    ):
        from . import pallas_lstm

        T, B, In = x.shape
        h0_ = jnp.zeros((1, B, H), jnp.float32) if h0 is None \
            else h0[None].astype(jnp.float32)
        c0_ = jnp.zeros((1, B, H), jnp.float32) if c0 is None \
            else c0[None].astype(jnp.float32)
        # pin the stream in a materialised default layout: without the
        # barrier XLA remats the producer slices against the kernel's
        # layout constraints and pads size-1 axes 128x (gigabytes of
        # temp on FullSubNet's B*257-row batches)
        x = jax.lax.optimization_barrier(x)
        call = (pallas_lstm.fused_lstm_scan_inproj if ctx is None
                else _sharded_lstm_inproj(ctx))
        ys, (hT, cT) = call(
            x[:, None],
            params.w_ih.T[None].astype(jnp.float32),
            (params.b_ih + params.b_hh)[None].astype(jnp.float32),
            params.w_hh.swapaxes(-1, -2)[None].astype(jnp.float32),
            h0_, c0_,
        )
        return ys[:, 0], (hT[0], cT[0])

    if x.dtype == jnp.bfloat16:
        x_proj = (
            jnp.einsum("tbi,gi->tbg", x, params.w_ih.astype(x.dtype))
            + (params.b_ih + params.b_hh).astype(x.dtype)
        )
        return _lstm_scan(
            x_proj, params.w_hh.astype(jnp.float32), H, h0, c0, unroll,
            carry_dtype=jnp.float32, out_dtype=jnp.bfloat16,
        )

    params = LstmParams(*[p.astype(x.dtype) for p in params])
    x_proj = (
        jnp.einsum("tbi,gi->tbg", x, params.w_ih,
                   precision=INPUT_PROJ_PRECISION)
        + params.b_ih + params.b_hh
    )
    return _lstm_scan(x_proj, params.w_hh, H, h0, c0, unroll)


def resolve_pallas(flag) -> bool:
    """Resolve a use_pallas_lstm setting: True/"on" and False/"off" are
    forced; "auto" enables the fused cell for single-chip TPU execution
    and, when a shard context is active (se_tpu/parallel/dp.py traces its
    step bodies under ``shard_context``), for SPMD meshes too — the
    kernel calls are then wrapped in jax.shard_map over the data axis
    (see Config.use_pallas_lstm)."""
    if flag in (True, "on"):
        return True
    if flag in (False, "off", None):
        return False
    if jax.default_backend() != "tpu":
        return False
    return jax.device_count() == 1 or current_shard_context() is not None


# ---------------------------------------------------------------------------
# SPMD mesh support for the fused Pallas cells.
#
# pallas_call does not auto-partition under jit-with-shardings; the batch
# axis is the data-parallel axis and every fused kernel is batch-tiled,
# so wrapping each kernel call in jax.shard_map over the mesh's data axis
# makes it run per-shard on the local batch — numerically identical to
# the unsharded kernel (independent sequences).  The mesh is communicated
# via a trace-time context entered by se_tpu/parallel/dp.py; everything
# outside the kernels stays global-view jit (BN statistics and the psum
# gradient reduction keep their single-device semantics).
# ---------------------------------------------------------------------------

_SHARD_CTX: contextvars.ContextVar = contextvars.ContextVar(
    "se_tpu_rnn_shard_ctx", default=None
)


@contextlib.contextmanager
def shard_context(mesh, axis: str = "data"):
    """Declare (at trace time) that batch tensors are sharded over
    ``mesh`` along ``axis``; fused Pallas recurrences inside the context
    are wrapped in jax.shard_map over that axis."""
    token = _SHARD_CTX.set((mesh, axis))
    try:
        yield
    finally:
        _SHARD_CTX.reset(token)


def current_shard_context():
    return _SHARD_CTX.get()


def _mesh_fits(ctx, *batch_sizes) -> bool:
    """Every batch axis must divide the mesh's data axis for the
    per-shard kernels; otherwise the caller falls back to the scan cell
    (correct for remainder batches, e.g. a short final eval batch)."""
    mesh, axis = ctx
    n = mesh.shape[axis]
    return all(b % n == 0 for b in batch_sizes)


def _smap(ctx, fn, in_specs, out_specs):
    mesh, _ = ctx
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,  # pallas interpret mode carries no vma info
    )


def _sharded_lstm_inproj(ctx):
    from . import pallas_lstm

    ax = ctx[1]
    stream = P(None, None, ax, None)  # [T, L, B, *]
    state = P(None, ax, None)  # [L, B, H]
    return _smap(
        ctx,
        pallas_lstm.fused_lstm_scan_inproj,
        in_specs=(stream, P(), P(), P(), state, state),
        out_specs=(stream, (state, state)),
    )


def _sharded_lstm_scan(ctx):
    from . import pallas_lstm

    ax = ctx[1]
    stream = P(None, None, ax, None)
    state = P(None, ax, None)
    return _smap(
        ctx,
        pallas_lstm.fused_lstm_scan,
        in_specs=(stream, P(), state, state),
        out_specs=(stream, (state, state)),
    )


def _sharded_gru_inproj(ctx):
    from . import pallas_lstm

    ax = ctx[1]
    stream = P(None, None, ax, None)
    state = P(None, ax, None)
    return _smap(
        ctx,
        pallas_lstm.fused_gru_scan_inproj,
        in_specs=(stream, P(), P(), P(), P(), state),
        out_specs=(stream, state),
    )


def _scan_or_pallas(x_proj, w_hh, H, h0, c0, unroll, use_pallas,
                    carry_dtype=None, out_dtype=None):
    """Dispatch the recurrence: the Pallas fused cell (f32 carry resident
    in VMEM, one kernel for the whole scan — se_tpu/ops/pallas_lstm.py)
    when requested and applicable, else the lax.scan cell."""
    ctx = current_shard_context()
    if resolve_pallas(use_pallas) and x_proj.ndim == 4 and (
        (carry_dtype or x_proj.dtype) == jnp.float32
    ) and (ctx is None or _mesh_fits(ctx, x_proj.shape[2])):
        from . import pallas_lstm

        L = x_proj.shape[1]
        Bb = x_proj.shape[2]
        h0_ = jnp.zeros((L, Bb, H), jnp.float32) if h0 is None \
            else h0.astype(jnp.float32)
        c0_ = jnp.zeros((L, Bb, H), jnp.float32) if c0 is None \
            else c0.astype(jnp.float32)
        w_hh_t = w_hh.swapaxes(-1, -2).astype(jnp.float32)
        odt = out_dtype or x_proj.dtype
        call = (pallas_lstm.fused_lstm_scan if ctx is None
                else _sharded_lstm_scan(ctx))
        ys, final = call(x_proj.astype(odt), w_hh_t, h0_, c0_)
        return ys, final
    return _lstm_scan(x_proj, w_hh, H, h0, c0, unroll,
                      carry_dtype=carry_dtype, out_dtype=out_dtype)


def lstm_stack(
    params: LstmParams,  # leading stack axis L on every field
    x: jnp.ndarray,  # [L, T, B, In] or [T, B, In] broadcast to all stacks
    state=None,  # optional ((h, c)) with h, c of shape [L, B, H]
    return_state: bool = False,
    unroll: int = 4,
    mixed_precision: bool = False,
    use_pallas: bool = False,
):
    """L independent LSTMs in ONE scan. Returns [L, T, B, H]
    (and the final (h, c) when ``return_state``).

    ``mixed_precision=True`` streams x_proj and the emitted hidden
    sequence in bf16 while keeping the (h, c) carry, the recurrent
    matmul accumulation, and the gate arithmetic in f32 (see _lstm_scan).
    Output dtype is then bf16.  ``use_pallas`` runs the recurrence as the
    fused VMEM-resident Pallas kernel (f32-carry paths only).

    bf16 INPUTS always get the mixed semantics, like ``lstm``/``gru``:
    a fully-bf16 (h, c) carry is the documented NaN-by-step-150 failure
    mode (docs/PERF.md), so there is no entry point that silently runs
    it.
    """
    if x.dtype == jnp.bfloat16:
        mixed_precision = True
    if mixed_precision:
        x16 = x.astype(jnp.bfloat16)
        w_ih16 = params.w_ih.astype(jnp.bfloat16)
        if x.ndim == 3:
            x_proj = jnp.einsum("tbi,lgi->tlbg", x16, w_ih16)
        else:
            x_proj = jnp.einsum("ltbi,lgi->tlbg", x16, w_ih16)
        bias = (params.b_ih + params.b_hh).astype(jnp.bfloat16)
        x_proj = x_proj + bias[None, :, None, :]
        h0 = c0 = None
        if state is not None:
            h0, c0 = state
        H = params.w_hh.shape[1] // 4
        ys, final = _scan_or_pallas(
            x_proj, params.w_hh.astype(jnp.float32), H, h0, c0, unroll,
            use_pallas,
            carry_dtype=jnp.float32, out_dtype=jnp.bfloat16,
        )
        ys = ys.swapaxes(0, 1)  # [L, T, B, H]
        if return_state:
            return ys, final
        return ys

    params = LstmParams(*[p.astype(x.dtype) for p in params])
    L, fourH, In = params.w_ih.shape
    H = fourH // 4
    if x.ndim == 3:
        x_proj = jnp.einsum("tbi,lgi->tlbg", x, params.w_ih,
                            precision=INPUT_PROJ_PRECISION)
    else:
        x_proj = jnp.einsum("ltbi,lgi->tlbg", x, params.w_ih,
                            precision=INPUT_PROJ_PRECISION)
    x_proj = x_proj + (params.b_ih + params.b_hh)[None, :, None, :]
    # scan over T with [L, B, *] carries; w_hh [L, 4H, H]
    h0 = c0 = None
    if state is not None:
        h0, c0 = state
    ys, final = _scan_or_pallas(x_proj, params.w_hh, H, h0, c0, unroll,
                                use_pallas)
    ys = ys.swapaxes(0, 1)  # [L, T, B, H]
    if return_state:
        return ys, final
    return ys


def gru(
    params: LstmParams,
    x: jnp.ndarray,
    h0: Optional[jnp.ndarray] = None,
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-layer unidirectional GRU with torch gate semantics.

    n_t = tanh(W_in x + b_in + r_t * (W_hn h + b_hn));
    h_t = (1 - z_t) n_t + z_t h_{t-1}.
    x: [T, B, In] -> [T, B, H].

    ``use_pallas`` runs the fused in-projection kernel
    (pallas_lstm.fused_gru_scan_inproj): input GEMM per step in VMEM,
    only ys stashed for the backward — the same O(T*B*H)-residual fix
    that lets FullSubNet's B*257-row sub-band batch train (the hoisted
    x_proj below is O(T*B*3H) in HBM).

    bf16 inputs get the same MIXED semantics as ``lstm``: bf16 x_proj
    stream and bf16 emitted outputs around an f32 h carry and f32 gate
    arithmetic — a fully-bf16 recurrent carry compounds roundoff over
    hundreds of steps (the NaN-by-step-150 failure measured for the
    LSTM, docs/PERF.md), and the GRU's multiplicative z_t gating has
    the same failure mode.
    """
    H = params.w_hh.shape[1]
    ctx = current_shard_context()
    if resolve_pallas(use_pallas) and (
        ctx is None or _mesh_fits(ctx, x.shape[1])
    ):
        from . import pallas_lstm

        T, B, In = x.shape
        h0_ = jnp.zeros((1, B, H), jnp.float32) if h0 is None \
            else h0[None].astype(jnp.float32)
        # same layout barrier as lstm(): keep the stream materialised so
        # XLA does not remat producer slices against the kernel layout
        x = jax.lax.optimization_barrier(x)
        call = (pallas_lstm.fused_gru_scan_inproj if ctx is None
                else _sharded_gru_inproj(ctx))
        ys, hT = call(
            x[:, None],
            params.w_ih.T[None].astype(jnp.float32),
            params.b_ih[None].astype(jnp.float32),
            params.w_hh.T[None].astype(jnp.float32),
            params.b_hh[None].astype(jnp.float32),
            h0_,
        )
        return ys[:, 0], hT[0]
    if x.dtype == jnp.bfloat16:
        x_proj = (
            jnp.einsum("tbi,gi->tbg", x, params.w_ih.astype(x.dtype))
            + params.b_ih.astype(x.dtype)
        )
        cdt, odt = jnp.float32, jnp.bfloat16
        w_hh_t = params.w_hh.T.astype(cdt)  # [H, 3H]
        b_hh = params.b_hh.astype(cdt)
    else:
        params = LstmParams(*[p.astype(x.dtype) for p in params])
        x_proj = (
            jnp.einsum("tbi,gi->tbg", x, params.w_ih,
                       precision=INPUT_PROJ_PRECISION)
            + params.b_ih
        )
        cdt = odt = x.dtype
        w_hh_t = params.w_hh.T
        b_hh = params.b_hh
    h = (jnp.zeros((x.shape[1], H), cdt) if h0 is None
         else h0.astype(cdt))

    def step(h, xp):
        hp = h @ w_hh_t + b_hh
        xp = xp.astype(cdt)
        r = jax.nn.sigmoid(xp[..., :H] + hp[..., :H])
        z = jax.nn.sigmoid(xp[..., H : 2 * H] + hp[..., H : 2 * H])
        n = jnp.tanh(xp[..., 2 * H :] + r * hp[..., 2 * H :])
        h = (1.0 - z) * n + z * h
        return h, h.astype(odt)

    h, ys = lax.scan(step, h, x_proj, unroll=4)
    return ys, h
