"""Measure the PyTorch reference-architecture throughput on this host's
CPU — the constructed baseline for BASELINE.md (the upstream repo
publishes no numbers, SURVEY.md section 6).

Run: python tools/measure_torch_baseline.py [dccrn|crn|fullsubnet]
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


def _time_steps(train_step, infer, B, n=3):
    train_step()
    t0 = time.time()
    for _ in range(n):
        train_step()
    dt = (time.time() - t0) / n
    print(f"train step (eager): {dt:.3f}s -> {B / dt:.3f} utt/s")
    with torch.no_grad():
        infer()
        t0 = time.time()
        for _ in range(n):
            infer()
        dt = (time.time() - t0) / n
    print(f"enhance (eager): {dt:.3f}s -> {B / dt:.3f} utt/s")


def main_crn():
    """Reference CRN (magnitude masking, MSE on waveform — the tutorial
    config) on this host's CPU."""
    from tests.oracles.torch_crn import OracleCRN

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)
    model = OracleCRN()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    B, L = 10, 48000
    x = torch.randn(B, L) * 0.1
    y = torch.randn(B, L) * 0.1

    def step():
        out = model(x)
        wav = out[-1]
        loss = torch.nn.functional.mse_loss(wav, y)
        opt.zero_grad()
        loss.backward()
        opt.step()

    _time_steps(step, lambda: model(x), B)


def main_fullsubnet(sequence_model: str = "LSTM"):
    """Reference FullSubNet (cIRM target, MSE — trainer.py:85-118) on
    this host's CPU.  B=2: the sub-band stage batches B*257 sequences,
    far heavier per utterance than DCCRN/CRN on one CPU core."""
    from tests.oracles.torch_fullsubnet import OracleFullSubNet

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)
    model = OracleFullSubNet(sequence_model=sequence_model)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    B, L = 2, 48000
    x = torch.randn(B, L) * 0.1
    y = torch.randn(B, L) * 0.1

    def step():
        win = torch.hann_window(400)
        nc = torch.stft(x, 512, 300, 400, win, return_complex=True)
        cc = torch.stft(y, 512, 300, 400, win, return_complex=True)
        mag = nc.abs()
        denom = nc.real**2 + nc.imag**2 + 1e-8
        cr = (nc.real * cc.real + nc.imag * cc.imag) / denom
        ci = (nc.real * cc.imag - nc.imag * cc.real) / denom
        cirm = torch.stack([cr, ci], dim=-1)
        cirm = 10.0 * (1 - torch.exp(-0.1 * cirm)) / (1 + torch.exp(-0.1 * cirm))
        crm = model(mag)
        loss = torch.nn.functional.mse_loss(cirm, crm)
        opt.zero_grad()
        loss.backward()
        opt.step()

    def infer():
        win = torch.hann_window(400)
        nc = torch.stft(x, 512, 300, 400, win, return_complex=True)
        model(nc.abs())

    _time_steps(step, infer, B)


def main_dccrn_perceptual(perceptual: str = "LMS"):
    """Reference DCCRN perceptual trainer (trainer.py:45-82): SDR main
    loss + LMS/PMSQE perceptual term, combined (r1*m + r2*p)/(r1+r2).
    The loss restatements live in tools/torch_perceptual.py (LMS keeps
    the reference's per-utterance loop + per-call filterbank rebuild)."""
    from tools.torch_perceptual import lms_loss_torch, pmsqe_loss_torch

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)
    model = OracleDCCRN()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    B, L = 10, 48000
    x = torch.randn(B, L) * 0.1
    y = torch.randn(B, L) * 0.1

    def step():
        out_real, out_imag, wav = model(x)
        m_loss = -torch_sdr(y, wav)
        if perceptual == "LMS":
            # clean mags via the model's own conv-STFT path
            # (reference: models.py:305-312)
            yt = torch.nn.functional.pad(
                y.unsqueeze(1), [model.win_len - model.win_inc] * 2)
            tspecs = torch.nn.functional.conv1d(
                yt, model.fwd_kernel, stride=model.win_inc)
            dim = model.fft_len // 2 + 1
            clean_mags = torch.sqrt(
                tspecs[:, :dim] ** 2 + tspecs[:, dim:] ** 2 + 1e-7)
            est_mags = torch.sqrt(out_real**2 + out_imag**2 + 1e-7)
            p_loss = lms_loss_torch(clean_mags, est_mags)
        else:
            p_loss = pmsqe_loss_torch(y, wav)
        loss = (m_loss + p_loss) / 2
        opt.zero_grad()
        loss.backward()
        opt.step()

    _time_steps(step, lambda: model(x), B)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "dccrn"
    if which == "crn":
        main_crn()
    elif which == "fullsubnet":
        main_fullsubnet()
    elif which == "fullsubnet-gru":
        main_fullsubnet("GRU")
    elif which == "dccrn-lms":
        main_dccrn_perceptual("LMS")
    elif which == "dccrn-pmsqe":
        main_dccrn_perceptual("PMSQE")
    else:
        main()
