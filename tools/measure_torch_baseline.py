"""Measure the PyTorch reference-architecture DCCRN throughput on this
host's CPU — the constructed baseline for BASELINE.md (the upstream repo
publishes no numbers, SURVEY.md section 6).

Run: python tools/measure_torch_baseline.py
"""

import time

import torch

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tests.oracles.torch_dccrn import OracleDCCRN  # noqa: E402


def torch_sdr(s1, s2, eps=1e-8):
    sn = torch.sum(s1 * s1, -1, keepdim=True)
    sd = torch.sum((s1 - s2) ** 2, -1, keepdim=True)
    return torch.mean(10 * torch.log10(sn**2 / (sd**2 + eps)))


def main():
    torch.manual_seed(0)
    model = OracleDCCRN()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    B, L = 10, 48000
    x = torch.randn(B, L) * 0.1
    y = torch.randn(B, L) * 0.1

    def step():
        _, _, wav = model(x)
        loss = -torch_sdr(y, wav)
        opt.zero_grad()
        loss.backward()
        opt.step()

    import os

    torch.set_num_threads(os.cpu_count() or 1)
    print(f"torch threads: {torch.get_num_threads()} (host has "
          f"{os.cpu_count()} cpu)")

    step()  # warmup
    n = 3
    t0 = time.time()
    for _ in range(n):
        step()
    dt = (time.time() - t0) / n
    print(f"train step (eager): {dt:.3f}s -> {B / dt:.3f} utt/s")

    with torch.no_grad():
        model(x)
        t0 = time.time()
        for _ in range(n):
            model(x)
        dt = (time.time() - t0) / n
    print(f"enhance (eager): {dt:.3f}s -> {B / dt:.3f} utt/s")

    # stronger baseline: torch.compile (inductor), if it works in-image
    try:
        cmodel = torch.compile(model)

        def cstep():
            _, _, wav = cmodel(x)
            loss = -torch_sdr(y, wav)
            opt.zero_grad()
            loss.backward()
            opt.step()

        cstep()  # compile + warmup
        t0 = time.time()
        for _ in range(n):
            cstep()
        dt = (time.time() - t0) / n
        print(f"train step (torch.compile): {dt:.3f}s -> {B / dt:.3f} utt/s")

        with torch.no_grad():
            cmodel(x)
            t0 = time.time()
            for _ in range(n):
                cmodel(x)
            dt = (time.time() - t0) / n
        print(f"enhance (torch.compile): {dt:.3f}s -> {B / dt:.3f} utt/s")
    except Exception as e:  # pragma: no cover
        print(f"torch.compile unavailable/failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
