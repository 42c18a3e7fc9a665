"""REAL 2-process ``jax.distributed`` execution of the multi-host
pipeline (tools/multihost_demo.py) — the genuinely multi-process
behaviours that tests/test_multihost.py can only simulate in-process:
``jax.distributed.initialize`` against a coordinator, a mesh spanning
two OS processes, ``make_array_from_process_local_data`` with
only-addressable shards, cross-process shuffle agreement, and gradient
psum over the gloo CPU collectives.

The lock-step losses must match a single-process run of the same global
math step for step (up to cross-process reduction-order float noise).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")
DEMO = os.path.join(ROOT, "tools", "multihost_demo.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run(args, timeout=900):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)  # the demo sets its own device count
    return subprocess.Popen(
        [sys.executable, DEMO, *args],
        cwd=ROOT, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
    )


def _parse(out: str):
    losses, shuffle = {}, None
    for line in out.splitlines():
        if line.startswith("STEP "):
            _, k, _, v = line.split()
            losses[int(k)] = float(v)
        elif line.startswith("SHUFFLE_HEAD "):
            shuffle = line.split(" ", 1)[1]
    assert "DONE" in out, out[-3000:]
    return losses, shuffle


@pytest.mark.slow
def test_two_process_distributed_matches_single_process():
    port = _free_port()
    steps = ["--steps", "3"]

    procs = [
        _run(["--coordinator", f"localhost:{port}", "--num-processes", "2",
              "--process-id", str(i), *steps])
        for i in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]

    single = _run(["--single", "--local-devices", "8", *steps])
    out_s, _ = single.communicate(timeout=900)
    assert single.returncode == 0, out_s[-3000:]

    l0, s0 = _parse(outs[0])
    l1, s1 = _parse(outs[1])
    ls, ss = _parse(out_s)

    # both processes observe the identical global loss (the psum result)
    assert l0 == l1
    # and the shared-seed shuffle agrees across processes
    assert s0 == s1 == ss
    # lock-step parity with the single-process run of the same global
    # math; reduction order across process boundaries differs, so exact
    # for step 0 is not guaranteed beyond float tolerance
    assert sorted(l0) == sorted(ls) == list(range(3))
    for k in range(3):
        np.testing.assert_allclose(l0[k], ls[k], rtol=5e-6)
