"""Microbenchmark of DCCRN encoder-conv formulations on the current device.

Times each encoder stage shape (B=40, T=481) under several layouts/dtypes
to pick the MXU-friendliest realisation of the complex conv
(reference hot loop: models.py:193-198).  Usage:

    python tools/perf_probe.py [conv|step|lstm]

Timing uses a scalar float() fetch (block_until_ready is unreliable on the
tunnelled axon platform).
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 40
T = 481
# (ci_part, co_part, F_in): per-part real channels per encoder stage
STAGES = [
    (1, 16, 256),
    (16, 32, 128),
    (32, 64, 64),
    (64, 128, 32),
    (128, 128, 16),
    (128, 128, 8),
]
KH, KW = 5, 2  # (freq, time), stride (2, 1), pad (2, causal-1)


def timeit(fn, *args, iters=20):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))


def flops_stage(ci, co, f_in):
    # complex conv = 4 real convs: 2 * (2B * co*... ) MACs*2
    f_out = f_in // 2
    return 4 * B * f_out * T * co * ci * KH * KW * 2


# -- formulations ------------------------------------------------------------

def doubled_batch(z, w, dtype):
    """Current: [2B, ci, F, T+1] conv [2co, ci, 5, 2]."""
    z = z.astype(dtype)
    w = w.astype(dtype)
    dn = lax.conv_dimension_numbers(z.shape, w.shape, ("NCHW", "OIHW", "NCHW"))
    return lax.conv_general_dilated(
        z, w, (2, 1), [(2, 2), (0, 0)], dimension_numbers=dn
    )


def block_matrix(x, wb, dtype):
    """[B, 2ci, F, T+1] conv [2co, 2ci, 5, 2] with the complex block kernel."""
    x = x.astype(dtype)
    wb = wb.astype(dtype)
    dn = lax.conv_dimension_numbers(x.shape, wb.shape, ("NCHW", "OIHW", "NCHW"))
    return lax.conv_general_dilated(
        x, wb, (2, 1), [(2, 2), (0, 0)], dimension_numbers=dn
    )


def block_matrix_nhwc(x, wb, dtype):
    """Channels-last: [B, F, T+1, 2ci] conv [5, 2, 2ci, 2co]."""
    x = x.astype(dtype)
    wb = wb.astype(dtype)
    dn = lax.conv_dimension_numbers(x.shape, wb.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x, wb, (2, 1), [(2, 2), (0, 0)], dimension_numbers=dn
    )


def im2col_dot(x, wmat, ci2, dtype):
    """Explicit patches + one dot: [B,F,T+1,2ci] -> [B,F/2,T,K] @ [K,2co]."""
    x = x.astype(dtype)
    wmat = wmat.astype(dtype)
    xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0), (0, 0)))
    taps = []
    f_out = x.shape[1] // 2
    for kf in range(KH):
        for kt in range(KW):
            taps.append(
                lax.slice(
                    xp,
                    (0, kf, kt, 0),
                    (B, kf + 2 * f_out, kt + x.shape[2] - 1, ci2),
                    (1, 2, 1, 1),
                )
            )
    patches = jnp.concatenate(taps, axis=-1)  # [B, F/2, T, 10*2ci]
    return jnp.dot(patches, wmat, preferred_element_type=jnp.float32)


def s2d_block(x, wb, r, dtype):
    """Polyphase space-to-depth freq conv (se_tpu.ops.conv.conv2d_freq_s2d):
    folds r output freqs into channels so K = 2ci*2r*3*kw, N = 2co*r."""
    from se_tpu.ops.conv import conv2d_freq_s2d

    return conv2d_freq_s2d(
        x.astype(dtype), wb.astype(dtype), None, r=r,
        stride=(2, 1), padding=(2, 0),
    )


def run_conv_bench():
    rng = np.random.default_rng(0)
    total = {}  # name -> [fwd, fwd+bwd] seconds, filled via setdefault
    print(f"B={B} T={T} kernel=({KH},{KW}) stride=(2,1)")
    for si, (ci, co, f_in) in enumerate(STAGES):
        gf = flops_stage(ci, co, f_in) / 1e9
        z = jnp.asarray(rng.standard_normal((2 * B, ci, f_in, T + 1)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((2 * co, ci, KH, KW)), jnp.float32)
        x = jnp.asarray(rng.standard_normal((B, 2 * ci, f_in, T + 1)), jnp.float32)
        wb = jnp.asarray(rng.standard_normal((2 * co, 2 * ci, KH, KW)), jnp.float32)
        xn = jnp.asarray(
            rng.standard_normal((B, f_in, T + 1, 2 * ci)), jnp.float32
        )
        wn = jnp.asarray(rng.standard_normal((KH, KW, 2 * ci, 2 * co)), jnp.float32)
        wm = jnp.asarray(
            rng.standard_normal((KH * KW * 2 * ci, 2 * co)), jnp.float32
        )

        cases = {
            "dbatch_f32": (doubled_batch, (z, w, jnp.float32)),
            "dbatch_bf16": (doubled_batch, (z, w, jnp.bfloat16)),
            "block_f32": (block_matrix, (x, wb, jnp.float32)),
            "block_bf16": (block_matrix, (x, wb, jnp.bfloat16)),
            "nhwc_f32": (block_matrix_nhwc, (xn, wn, jnp.float32)),
            "nhwc_bf16": (block_matrix_nhwc, (xn, wn, jnp.bfloat16)),
            "im2col_bf16": (im2col_dot, (xn, wm, 2 * ci, jnp.bfloat16)),
        }
        # s2d r-sweep for the small-channel stages (K = 2ci*2r*3*kw)
        r_cands = [rr for rr in (2, 4, 8, 16)
                   if 2 * ci * 2 * rr * 6 <= 2048 and (f_in // 2) % rr == 0
                   and 2 * ci <= 64]
        for rr in r_cands:
            cases[f"s2d_r{rr}_f32"] = (s2d_block, (x, wb, rr, jnp.float32))
            cases[f"s2d_r{rr}_bf16"] = (s2d_block, (x, wb, rr, jnp.bfloat16))
        print(f"stage {si}: ci={ci} co={co} F={f_in} ({gf:.1f} GFLOP)")
        for name, (fn, args) in cases.items():
            static = args[2:]
            jfn = jax.jit(lambda a, b, fn=fn, static=static: fn(a, b, *static))
            grad = jax.jit(
                lambda a, b, fn=fn, static=static: jax.grad(
                    lambda a_, b_: jnp.sum(
                        fn(a_, b_, *static).astype(jnp.float32) ** 2
                    ),
                    argnums=(0, 1),
                )(a, b)
            )
            try:
                t_f = timeit(jfn, *args[:2])
                t_b = timeit(grad, *args[:2])
            except Exception as e:
                print(f"  {name:12s} FAILED: {type(e).__name__}")
                continue
            tot = total.setdefault(name, [0.0, 0.0])
            tot[0] += t_f
            tot[1] += t_b
            print(
                f"  {name:12s} fwd {t_f*1e3:7.2f} ms ({gf/t_f/1e3:6.2f} TF/s)"
                f"   fwd+bwd {t_b*1e3:7.2f} ms ({3*gf/t_b/1e3:6.2f} TF/s)"
            )
    gsum = sum(flops_stage(*s) for s in STAGES) / 1e9
    print(f"\ntotals over all stages ({gsum:.1f} GFLOP fwd):")
    for name, (tf, tb) in total.items():
        if tf:
            print(
                f"  {name:12s} fwd {tf*1e3:7.2f} ms ({gsum/tf/1e3:6.2f} TF/s)"
                f"   fwd+bwd {tb*1e3:7.2f} ms ({3*gsum/tb/1e3:6.2f} TF/s)"
            )


def run_step_bench(batches=(40,), train=True, **cfg_kw):
    """Time the real DCCRN train/eval step end-to-end at given batch sizes."""
    from se_tpu.config import Config
    from se_tpu.train import create_train_state, make_train_step
    from se_tpu.train.steps import make_eval_step

    ga = cfg_kw.pop("grad_accum", 1)
    cfg = Config(**cfg_kw)
    if ga > 1:
        import dataclasses

        cfg = cfg.replace(train=dataclasses.replace(cfg.train, grad_accum=ga))
        cfg_kw["grad_accum"] = ga  # keep it visible in the printout
    model, state = create_train_state(cfg)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    L = cfg.stft.fs * 3
    for B in batches:
        noisy = jnp.asarray(
            (rng.standard_normal((B, L)) * 0.1).astype(np.float32)
        )
        clean = jnp.asarray(
            (rng.standard_normal((B, L)) * 0.1).astype(np.float32)
        )
        try:
            if train:
                step = make_train_step(cfg, model)
                st, m = step(state, noisy, clean, key)
                float(m["loss"])
                t0 = time.perf_counter()
                for _ in range(10):
                    st, m = step(st, noisy, clean, key)
                float(m["loss"])
                dt = (time.perf_counter() - t0) / 10
            else:
                estep = make_eval_step(cfg, model)
                m, out = estep(state, noisy, clean)
                float(m["loss"])
                t0 = time.perf_counter()
                for _ in range(10):
                    m, out = estep(state, noisy, clean)
                float(m["loss"])
                dt = (time.perf_counter() - t0) / 10
        except Exception as e:
            print(f"B={B}: FAILED {type(e).__name__}: {e}")
            continue
        print(
            f"B={B}: {dt*1e3:7.1f} ms/step  {B/dt:7.1f} utt/s  cfg={cfg_kw}"
        )


def run_section_bench(B=112, **cfg_kw):
    """In-context section timing of the real DCCRN forward: each timed
    call is a whole jitted subgraph (STFT+encoder / +LSTM / full forward /
    train step), so the tunnel's per-dispatch floor (~3-4 ms, which
    poisons per-op microbenchmarks here) amortises away.  Differences
    between sections give honest in-step shares."""
    import flax.linen as nn
    from se_tpu.config import Config
    from se_tpu.train import create_train_state, make_train_step

    cfg = Config(**cfg_kw)
    model, state = create_train_state(cfg)
    rng = np.random.default_rng(0)
    L = cfg.stft.fs * 3
    noisy = jnp.asarray((rng.standard_normal((B, L)) * 0.1).astype(np.float32))
    clean = jnp.asarray((rng.standard_normal((B, L)) * 0.1).astype(np.float32))
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def _sections(mdl, x):
        from se_tpu.dsp import conv_stft

        c = mdl.cfg
        specs = conv_stft(x, mdl.stft_kernels)
        dim = mdl.fft_len // 2 + 1
        real, imag = specs[:, :dim], specs[:, dim:]
        cspecs = jnp.stack([real, imag], axis=1)[:, :, 1:]  # [B, 2, F, T]
        compute_dtype = (
            jnp.bfloat16 if c.compute_dtype == "bfloat16" else jnp.float32
        )
        out = cspecs.astype(compute_dtype)
        for i in range(len(mdl.encoder)):
            out = mdl.encoder_act[i](
                mdl.encoder_bn[i](mdl.encoder[i](out), train=False)
            )
        enc = out
        Bs, C, D, T = out.shape
        out = jnp.transpose(out, (3, 0, 1, 2))
        if c.lstm != "complex" or c.compute_dtype != "bfloat16":
            out = out.astype(jnp.float32)
        if c.lstm == "complex":
            r_in = out[:, :, : C // 2].reshape(T, Bs, C // 2 * D)
            i_in = out[:, :, C // 2 :].reshape(T, Bs, C // 2 * D)
            for rnn_mod in mdl.enhance:
                r_in, i_in = rnn_mod([r_in, i_in])
            lstm_out = jnp.concatenate([r_in, i_in], axis=-1)
        else:
            z = out.reshape(T, Bs, C * D)
            z = mdl.enhance_lstm(z, train=False)
            lstm_out = mdl.tranform(z)
        return enc, lstm_out

    enc_fn = jax.jit(lambda v, x: model.apply(
        v, x, method=lambda m, xx: _sections(m, xx)[0]))
    lstm_fn = jax.jit(lambda v, x: model.apply(
        v, x, method=lambda m, xx: _sections(m, xx)[1]))
    fwd_fn = jax.jit(lambda v, x: model.apply(v, x, train=False)[-1])
    step = make_train_step(cfg, model)
    key = jax.random.PRNGKey(0)

    def _grad_of(apply_fn):
        def loss(v, x):
            out = apply_fn(v, x)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        return jax.jit(jax.grad(loss))

    enc_g = _grad_of(lambda v, x: model.apply(
        v, x, method=lambda m, xx: _sections(m, xx)[0]))
    lstm_g = _grad_of(lambda v, x: model.apply(
        v, x, method=lambda m, xx: _sections(m, xx)[1]))
    fwd_g = _grad_of(lambda v, x: model.apply(v, x, train=False)[-1])

    names = []
    for name, fn, args in (
        ("stft+encoder fwd", enc_fn, (variables, noisy)),
        ("+complex LSTM fwd", lstm_fn, (variables, noisy)),
        ("full forward", fwd_fn, (variables, noisy)),
        ("enc fwd+bwd", enc_g, (variables, noisy)),
        ("enc+lstm fwd+bwd", lstm_g, (variables, noisy)),
        ("full fwd+bwd", fwd_g, (variables, noisy)),
    ):
        t = timeit(fn, *args, iters=10)
        names.append((name, t))
        print(f"{name:20s} {t*1e3:8.2f} ms")
    st, m = step(state, noisy, clean, key)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(10):
        st, m = step(st, noisy, clean, key)
    float(m["loss"])
    t = (time.perf_counter() - t0) / 10
    print(f"{'train step':20s} {t*1e3:8.2f} ms")
    enc_t = names[0][1]
    lstm_t = names[1][1] - names[0][1]
    dec_t = names[2][1] - names[1][1]
    print(f"shares of fwd: encoder {enc_t*1e3:.1f} ms, "
          f"lstm {lstm_t*1e3:.1f} ms, decoder+mask+istft {dec_t*1e3:.1f} ms")


def run_lstm_bench(B=112):
    """Complex-LSTM bottleneck cost (fwd and fwd+bwd) with in-jit loops."""
    from se_tpu.ops import rnn as rnn_ops

    T, in_dim, units = 481, 512, 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, 2 * B, in_dim)), jnp.float32)

    def make_params(key, in_d):
        ks = jax.random.split(key, 2)
        return rnn_ops.LstmParams(
            *[
                jnp.stack([a, b])
                for a, b in zip(
                    rnn_ops.init_lstm_params(ks[0], in_d, units),
                    rnn_ops.init_lstm_params(ks[1], in_d, units),
                )
            ]
        )

    p0 = make_params(jax.random.PRNGKey(0), in_dim)
    p1 = make_params(jax.random.PRNGKey(1), units)

    for mode in ("f32", "mixed", "bf16_all", "pallas_f32", "pallas_mixed"):
        unrolls = (4,) if mode.startswith("pallas") else (4, 8, 16, 32)
        for unroll in unrolls:
            def fwd(x, p0=p0, p1=p1, unroll=unroll, mode=mode):
                mixed = "mixed" in mode
                pallas = mode.startswith("pallas")
                if mode == "bf16_all":
                    x = x.astype(jnp.bfloat16)
                ys = rnn_ops.lstm_stack(
                    p0, x, unroll=unroll, mixed_precision=mixed,
                    use_pallas=pallas,
                )
                # complex recombine between layers (r2r - i2i etc.)
                Bh = x.shape[1] // 2
                r = ys[0, :, :Bh] - ys[1, :, Bh:]
                i = ys[0, :, Bh:] + ys[1, :, :Bh]
                z = jnp.concatenate([r, i], axis=1)
                ys2 = rnn_ops.lstm_stack(
                    p1, z, unroll=unroll, mixed_precision=mixed,
                    use_pallas=pallas,
                )
                return jnp.sum(ys2.astype(jnp.float32) ** 2)

            jf = jax.jit(fwd)
            jg = jax.jit(jax.grad(fwd))
            tf = timeit(jf, x, iters=10)
            tb = timeit(jg, x, iters=10)
            print(f"{mode:8s} unroll={unroll:2d}: fwd {tf*1e3:7.2f} ms"
                  f"   fwd+bwd {tb*1e3:7.2f} ms")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "conv"
    print("devices:", jax.devices())
    if mode == "conv":
        run_conv_bench()
    elif mode == "lstm":
        run_lstm_bench()
    elif mode == "sections":
        kw = {}
        for a in sys.argv[2:]:
            k, v = a.split("=")
            kw[k] = (
                v == "True" if v in ("True", "False") else
                int(v) if v.isdigit() else v
            )
        run_section_bench(kw.pop("B", 112), **kw)
    elif mode == "step":
        kw = {}
        for a in sys.argv[2:]:
            k, v = a.split("=")
            kw[k] = (
                v == "True" if v in ("True", "False") else
                int(v) if v.isdigit() else v
            )
        batches = kw.pop("B", 40)
        batches = (batches,) if isinstance(batches, int) else batches
        train = kw.pop("train", True)
        run_step_bench(batches, train, **kw)
