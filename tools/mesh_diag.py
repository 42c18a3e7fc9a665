"""Mesh-dispatch diagnostics: the controls behind docs/PERF.md's
"mesh overhead" pitfall (a carried TrainState placed with a bare
``jax.device_put`` commits SingleDeviceSharding, so the first carried
call pays a full recompile that masquerades as a mesh slowdown).

Modes (all run ON TPU:
``PYTHONPATH="/root/repo:$PYTHONPATH" python tools/mesh_diag.py MODE``):

  variants  DCCRN bf16 train step: plain jit vs mesh jit, carried vs
            uncarried vs no-donation vs in-shardings-only.  The original
            symptom reproducer (mesh_probe.py measures the FIXED paths).
  dispatch  per-call dispatch timing, plain vs mesh carried: shows the
            one-off ~18.5 s first-carried-call recompile (the mesh state
            here is DELIBERATELY placed with bare device_put).
  leaves    carried mesh-jit dispatch vs state leaf count (8/64/512):
            control showing dispatch does NOT scale with leaves.
  bytes     carried mesh-jit dispatch vs state size (1/32/128 MB):
            control showing dispatch does NOT scale with bytes.
"""

import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa


def _mesh():
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("data",))


def _dccrn_setup(B=64):
    from se_tpu.config import Config
    from se_tpu.train import create_train_state

    cfg = Config(compute_dtype="bfloat16")
    rng = np.random.default_rng(0)
    model, _ = create_train_state(cfg)
    L = cfg.stft.fs * 3
    noisy = jnp.asarray((rng.standard_normal((B, L)) * 0.1).astype(np.float32))
    clean = jnp.asarray((rng.standard_normal((B, L)) * 0.1).astype(np.float32))
    return cfg, model, noisy, clean, jax.random.PRNGKey(0), B


def variants():
    from se_tpu.config import Config  # noqa: F401 (setup import path)
    from se_tpu.train import create_train_state, make_train_step
    from se_tpu.train.steps import train_step_body
    from se_tpu.parallel.dp import make_parallel_train_step
    from se_tpu.ops import rnn as rnn_ops

    cfg, model, noisy, clean, key, B = _dccrn_setup()
    from se_tpu.train import create_train_state as mk_state

    mesh = _mesh()
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("data"))

    def bench(step, state, carry=True, n=10):
        out = step(state, noisy, clean, key)
        float(out[1]["loss"])
        s = out[0] if carry else state
        t0 = time.perf_counter()
        for _ in range(n):
            out = step(s, noisy, clean, key)
            if carry:
                s = out[0]
        float(out[1]["loss"])
        return B / ((time.perf_counter() - t0) / n)

    r = {}
    r["a_jit_carried"] = bench(make_train_step(cfg, model), mk_state(cfg)[1])
    r["b_mesh_carried"] = bench(
        make_parallel_train_step(cfg, model, mesh),
        jax.device_put(mk_state(cfg)[1]),
    )
    # c: mesh, uncarried (cannot donate the reused state: fresh jit
    # without donation)
    body = train_step_body(cfg, model)

    def mk(donate, in_sh, out_sh):
        def step(state, i, t, k):
            with rnn_ops.shard_context(mesh, "data"):
                return body(state, i, t, k)
        return jax.jit(
            step,
            in_shardings=in_sh, out_shardings=out_sh,
            donate_argnums=(0,) if donate else (),
        )

    in_sh = (repl, bsh, bsh, repl)
    out_sh = (repl, repl)
    r["c_mesh_uncarried"] = bench(
        mk(False, in_sh, out_sh), jax.device_put(mk_state(cfg)[1]),
        carry=False,
    )
    r["d_mesh_nodonate"] = bench(
        mk(False, in_sh, out_sh), jax.device_put(mk_state(cfg)[1])
    )
    r["e_mesh_inonly"] = bench(
        mk(True, in_sh, None), jax.device_put(mk_state(cfg)[1])
    )

    for k, v in r.items():
        print(f"{k:18s}: {v:8.1f} utt/s", flush=True)


def dispatch():
    from se_tpu.train import create_train_state, make_train_step
    from se_tpu.parallel.dp import make_parallel_train_step

    cfg, model, noisy, clean, key, B = _dccrn_setup()
    mesh = _mesh()

    def profile(name, step, state, n=8):
        state, m = step(state, noisy, clean, key)
        float(m["loss"])
        disp = []
        t_all = time.perf_counter()
        for _ in range(n):
            t0 = time.perf_counter()
            state, m = step(state, noisy, clean, key)
            disp.append(time.perf_counter() - t0)
        float(m["loss"])
        total = time.perf_counter() - t_all
        print(f"{name:10s}: dispatch ms per step "
              f"{[f'{d * 1e3:.0f}' for d in disp]}  total {total / n * 1e3:.0f}"
              f" ms/step", flush=True)

    profile("plain", make_train_step(cfg, model),
            create_train_state(cfg)[1])
    # bare device_put on purpose: reproduces the SingleDeviceSharding →
    # second-signature recompile on the first CARRIED call
    profile("mesh", make_parallel_train_step(cfg, model, mesh),
            jax.device_put(create_train_state(cfg)[1]))


def _carried_micro(make_xs, f, fetch, label_fmt, sizes, n):
    mesh = _mesh()
    repl = NamedSharding(mesh, P())
    for size in sizes:
        xs0 = make_xs(size)
        for name, jf, xs in [
            ("plain", jax.jit(f), xs0),
            ("mesh", jax.jit(f, in_shardings=repl, out_shardings=repl),
             jax.device_put(xs0, repl)),
        ]:
            xs_ = jf(xs)
            fetch(xs_)
            t0 = time.perf_counter()
            for _ in range(n):
                xs_ = jf(xs_)
            fetch(xs_)
            ms = (time.perf_counter() - t0) / n * 1e3
            print(label_fmt.format(size=size, name=name, ms=ms), flush=True)


def bytes_scaling():
    _carried_micro(
        make_xs=lambda mb: jnp.zeros((mb * 1024 * 1024 // 4,), jnp.float32),
        f=lambda x: x * 1.0001 + 1.0,
        fetch=lambda x: float(x[0]),
        label_fmt="{size:4d} MB {name:5s} carried: {ms:8.2f} ms/step",
        sizes=(1, 32, 128),
        n=20,
    )


def leaves_scaling():
    _carried_micro(
        make_xs=lambda n: [jnp.full((128, 128), float(i)) for i in range(n)],
        f=lambda xs: [x * 1.0001 + 1.0 for x in xs],
        fetch=lambda xs: float(xs[0][0, 0]),
        label_fmt="{size:4d} leaves {name:5s} carried: {ms:8.2f} ms/step",
        sizes=(8, 64, 512),
        n=10,
    )


MODES = {
    "variants": variants,
    "dispatch": dispatch,
    "leaves": leaves_scaling,
    "bytes": bytes_scaling,
}


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "variants"
    MODES[mode]()
