"""North-star receipt: direct cross-framework enhancement parity.

BASELINE.json's gate is "PESQ/STOI parity +/-0.01 vs the PyTorch
reference on identical data".  The chain has long been proven by
composition (forward parity, checkpoint import, metric parity); this
harness measures it DIRECTLY, end to end, the way a migrating user
experiences it:

  1. a torch model with reference semantics (tests/oracles/torch_*.py)
     is briefly trained with torch Adam (so weights and BN running
     statistics are post-training, not init),
  2. saved as a reference-format ``chkpt_N.pt``
     (``{"model": state_dict, "optimizer": ..., "epoch": N}`` with the
     reference's key grammar — reference train_interface.py:166-171),
  3. imported with ``se_tpu.utils.torch_import.load_reference_checkpoint``,
  4. BOTH frameworks enhance the same held-out utterances
     (torch: the oracle eval forward / the reference validation decode
     trainer.py:188-239, 341-345; se_tpu: the batch enhance path),
  5. both outputs are scored against clean with the validated metric
     stack (native P.862 PESQ + STOI), and per-file deltas are gated.

Run: python tools/north_star.py [n_utts] [train_steps] [model ...]
Writes the per-model tables to stdout (markdown) and exits non-zero if
any |dPESQ| > 0.01 or |dSTOI| > 0.01.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GATE = 0.01
LENGTHS = (24000, 32000, 40000)  # varied utterance lengths (1.5/2/2.5 s)
FS = 16000


# -- data -------------------------------------------------------------------

def make_utterances(n, seed, lengths=LENGTHS):
    """n varied (noisy, clean) pairs: speechlike clean at varied f0,
    white/pink/AM noise at varied SNR, mixed lengths."""
    from tools.make_synth_corpus import make_noise
    from tools.pesq_oracle_battery import speechlike

    rng = np.random.default_rng(seed)
    out = []
    kinds = ["white", "pink", "am"]
    for i in range(n):
        L = lengths[i % len(lengths)]
        clean = speechlike(rng, n=L, f0=85 + 9 * i + rng.uniform(-3, 3))
        noise = make_noise(rng, kinds[i % len(kinds)], L)
        snr = (0.0, 5.0, 10.0)[i % 3]
        p_s = np.mean(clean**2)
        p_n = np.mean(noise**2) + 1e-20
        alpha = np.sqrt(10.0 ** (-snr / 10.0) * p_s / p_n)
        noisy = clean + alpha * noise
        out.append((noisy.astype(np.float32), clean.astype(np.float32)))
    return out


# -- torch side -------------------------------------------------------------

def _torch_neg_sdr(target, est, eps=1e-8):
    """reference tools_for_loss.py:17-33 (non-standard sdr), negated."""
    import torch

    s1_s2_norm = torch.sum(target * est, -1, keepdim=True)
    s2_s2_norm = torch.sum(est * est, -1, keepdim=True)
    s_target = s1_s2_norm / (s2_s2_norm + eps) * est
    e_noise = target - s_target
    t_norm = torch.sum(s_target * s_target, -1, keepdim=True)
    n_norm = torch.sum(e_noise * e_noise, -1, keepdim=True)
    snr = 10 * torch.log10(t_norm / (n_norm + eps) + eps)
    return -torch.mean(snr)


def _fsn_stft(w, s):
    import torch

    return torch.stft(
        w, n_fft=s.fft_len, hop_length=s.torch_hop, win_length=s.win_len,
        window=torch.hann_window(s.win_len), center=True,
        return_complex=True,
    )


def _fsn_cirm_loss(oracle, noisy, clean, s):
    """reference trainer.py:96-110 + tools_for_model.py:687-723."""
    import torch

    nc, cc = _fsn_stft(noisy, s), _fsn_stft(clean, s)
    eps = float(np.finfo(np.float32).eps)
    den = nc.real**2 + nc.imag**2 + eps
    mr = (nc.real * cc.real + nc.imag * cc.imag) / den
    mi = (nc.real * cc.imag - nc.imag * cc.real) / den
    mask = torch.stack((mr, mi), dim=-1)
    mask = torch.where(mask <= -100, torch.full_like(mask, -100.0), mask)
    cirm = 10 * (1 - torch.exp(-0.1 * mask)) / (1 + torch.exp(-0.1 * mask))
    crm = oracle(nc.abs())
    return torch.mean((cirm - crm) ** 2)


def train_oracle(model_name, oracle, utts, steps, batch, s, seed=0):
    """A short reference-semantics training run (torch Adam, lr 1e-3 —
    reference train_interface.py:59) so the exported weights carry
    trained values and real BN running statistics."""
    import torch

    opt = torch.optim.Adam(oracle.parameters(), lr=1e-3)
    rng = np.random.default_rng(seed)
    oracle.train()
    # same-length batches (torch stacking needs it)
    by_len = {}
    for nz, cl in utts:
        by_len.setdefault(len(nz), []).append((nz, cl))
    pools = list(by_len.values())
    for step in range(steps):
        pool = pools[step % len(pools)]
        idx = rng.integers(0, len(pool), size=min(batch, len(pool)))
        noisy = torch.from_numpy(np.stack([pool[i][0] for i in idx]))
        clean = torch.from_numpy(np.stack([pool[i][1] for i in idx]))
        if model_name == "FullSubNet":
            loss = _fsn_cirm_loss(oracle, noisy, clean, s)
        elif model_name == "CRN":
            _, wav = oracle(noisy)
            loss = _torch_neg_sdr(clean[:, : wav.shape[-1]], wav)
        else:
            _, _, wav = oracle(noisy)
            loss = _torch_neg_sdr(clean[:, : wav.shape[-1]], wav)
        opt.zero_grad()
        loss.backward()
        opt.step()
    oracle.eval()
    return oracle


def torch_enhance(model_name, oracle, noisy_np, s):
    """The reference's validation-loop enhancement (trainer.py:188-239;
    FullSubNet decode: trainer.py:341-345)."""
    import torch

    x = torch.from_numpy(noisy_np)
    with torch.no_grad():
        if model_name == "FullSubNet":
            nc = _fsn_stft(x, s)
            crm = oracle(nc.abs())  # [B, F, T, 2], matching nc's [B, F, T]
            # decompress_cIRM (tools_for_model.py:720-723)
            limit, K = 9.9, 10
            crm = (
                limit * (crm >= limit).float()
                - limit * (crm <= -limit).float()
                + crm * (torch.abs(crm) < limit).float()
            )
            crm = -K * torch.log((K - crm) / (K + crm))
            er = crm[..., 0] * nc.real - crm[..., 1] * nc.imag
            ei = crm[..., 1] * nc.real + crm[..., 0] * nc.imag
            wav = torch.istft(
                torch.complex(er, ei), n_fft=s.fft_len,
                hop_length=s.torch_hop, win_length=s.win_len,
                window=torch.hann_window(s.win_len),
                length=noisy_np.shape[-1],
            )
        elif model_name == "CRN":
            _, wav = oracle(x)
        else:
            _, _, wav = oracle(x)
    return wav.numpy()


# -- se_tpu side ------------------------------------------------------------

def reference_checkpoint_bytes(model_name, oracle, path, epoch=1):
    """Save the oracle as a reference-format chkpt_N.pt (the key grammar
    the importer consumes; FullSubNet's oracle already uses reference
    attribute names)."""
    import torch

    from tests.test_torch_import import (
        _reference_named_crn_sd, _reference_named_dccrn_sd,
    )

    if model_name == "DCCRN":
        sd = _reference_named_dccrn_sd(oracle)
    elif model_name == "CRN":
        sd = _reference_named_crn_sd(oracle)
    else:
        sd = oracle.state_dict()
    torch.save({"model": sd, "optimizer": {}, "epoch": epoch}, path)
    return path


def jax_enhance(cfg, variables, noisy_np):
    """The framework's batch enhance core (same math enhance.py drives),
    at exact length, f32."""
    import jax
    import jax.numpy as jnp

    from se_tpu.models import build_model

    model = build_model(cfg)
    if cfg.model == "FullSubNet":
        from se_tpu.dsp import frame_stft
        from se_tpu.train.steps import fullsubnet_enhance

        @jax.jit
        def run(wavs):
            s = cfg.stft
            nc = frame_stft(wavs, s.fft_len, s.torch_hop, s.win_len)
            crm = model.apply(variables, jnp.abs(nc), train=False)
            return fullsubnet_enhance(cfg, crm, nc, wavs.shape[-1])
    else:

        @jax.jit
        def run(wavs):
            return model.apply(variables, wavs, train=False)[-1]

    return np.asarray(run(jnp.asarray(noisy_np)))


# -- harness ----------------------------------------------------------------

def build_oracle(model_name, cfg, torch_seed=0):
    import torch

    from tests.oracles.torch_crn import OracleCRN
    from tests.oracles.torch_dccrn import OracleDCCRN
    from tests.oracles.torch_fullsubnet import OracleFullSubNet

    torch.manual_seed(torch_seed)
    if model_name == "DCCRN":
        d = cfg.dccrn
        return OracleDCCRN(kernel_num=d.kernel_num, rnn_units=d.rnn_units,
                           rnn_layers=d.rnn_layers)
    if model_name == "CRN":
        c = cfg.crn
        return OracleCRN(rnn_input_size=c.rnn_input_size,
                         rnn_units=c.rnn_units)
    f = cfg.fullsubnet
    return OracleFullSubNet(
        num_freqs=cfg.stft.num_freqs, look_ahead=f.look_ahead,
        sb_num_neighbors=f.sb_num_neighbors,
        fb_num_neighbors=f.fb_num_neighbors,
        fb_hidden=f.fb_model_hidden_size, sb_hidden=f.sb_model_hidden_size,
        sequence_model=cfg.sequence_model, dropout=f.dropout,
    )


def run_model(model_name, cfg, n_utts=21, train_steps=6, train_batch=2,
              seed=0, workdir="/tmp/north_star"):
    """Full receipt for one model; returns per-file rows
    (pesq_torch, pesq_jax, stoi_torch, stoi_jax)."""
    from se_tpu.eval.metrics import cal_pesq, cal_stoi
    from se_tpu.utils.torch_import import load_reference_checkpoint

    os.makedirs(workdir, exist_ok=True)
    s = cfg.stft

    train_utts = make_utterances(max(4 * train_batch, 8), seed=seed + 100)
    eval_utts = make_utterances(n_utts, seed=seed + 200)

    oracle = build_oracle(model_name, cfg, torch_seed=seed)
    train_oracle(model_name, oracle, train_utts, train_steps, train_batch,
                 s, seed=seed)

    pt = os.path.join(workdir, f"chkpt_ns_{model_name}.pt")
    reference_checkpoint_bytes(model_name, oracle, pt)
    variables, _ = load_reference_checkpoint(pt, cfg)
    variables = {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
    }

    rows = []
    by_len = {}
    for i, (nz, cl) in enumerate(eval_utts):
        by_len.setdefault(len(nz), []).append((i, nz, cl))
    for L, entries in sorted(by_len.items()):
        noisy = np.stack([e[1] for e in entries])
        clean = np.stack([e[2] for e in entries])
        wav_t = torch_enhance(model_name, oracle, noisy, s)
        wav_j = jax_enhance(cfg, variables, noisy)
        # both frameworks emit full-length wavs for these models
        assert wav_t.shape == wav_j.shape == noisy.shape, (
            wav_t.shape, wav_j.shape, noisy.shape,
        )
        pesq_t = cal_pesq(wav_t, clean, s.fs)
        pesq_j = cal_pesq(wav_j, clean, s.fs)
        stoi_t = cal_stoi(wav_t, clean, s.fs)
        stoi_j = cal_stoi(wav_j, clean, s.fs)
        for k, (i, _, _) in enumerate(entries):
            rows.append({
                "utt": i, "len": L,
                "pesq_torch": float(pesq_t[k]), "pesq_jax": float(pesq_j[k]),
                "stoi_torch": float(stoi_t[k]), "stoi_jax": float(stoi_j[k]),
            })
    return sorted(rows, key=lambda r: r["utt"])


def table(model_name, rows):
    lines = [
        f"### {model_name}",
        "",
        "| utt | len | PESQ torch | PESQ jax | dPESQ | STOI torch | "
        "STOI jax | dSTOI |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        dp = r["pesq_jax"] - r["pesq_torch"]
        ds = r["stoi_jax"] - r["stoi_torch"]
        lines.append(
            f"| {r['utt']} | {r['len']} | {r['pesq_torch']:.4f} | "
            f"{r['pesq_jax']:.4f} | {dp:+.4f} | {r['stoi_torch']:.4f} | "
            f"{r['stoi_jax']:.4f} | {ds:+.4f} |"
        )
    dp_max = max(abs(r["pesq_jax"] - r["pesq_torch"]) for r in rows)
    ds_max = max(abs(r["stoi_jax"] - r["stoi_torch"]) for r in rows)
    verdict = "MET" if dp_max <= GATE and ds_max <= GATE else "FAILED"
    lines += [
        "",
        f"max |dPESQ| = {dp_max:.4f}, max |dSTOI| = {ds_max:.4f} "
        f"(gate {GATE}) -> **{verdict}**",
        "",
    ]
    return "\n".join(lines), dp_max, ds_max


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    n_utts = int(argv[0]) if len(argv) > 0 else 21
    steps = int(argv[1]) if len(argv) > 1 else 6
    models = argv[2:] or ["DCCRN", "CRN", "FullSubNet"]

    import jax

    jax.config.update("jax_platforms", "cpu")
    from se_tpu.config import Config

    ok = True
    out = [
        "# North-star receipt: cross-framework enhancement parity",
        "",
        f"{n_utts} held-out utterances per model (lengths {LENGTHS}, "
        f"SNR 0/5/10 dB, white/pink/AM noise), torch oracle trained "
        f"{steps} Adam steps, weights moved via reference-format "
        "chkpt .pt -> torch_import, both frameworks scored with the "
        "native P.862 + STOI stack.",
        "",
    ]
    for m in models:
        cfg = (
            Config(model="CRN", lstm="real", loss="MSE") if m == "CRN"
            else Config(model=m, loss="MSE" if m == "FullSubNet" else "SDR")
        )
        rows = run_model(m, cfg, n_utts=n_utts, train_steps=steps)
        t, dp, ds = table(m, rows)
        print(t)
        out.append(t)
        ok = ok and dp <= GATE and ds <= GATE
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "NORTH_STAR.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {os.path.normpath(path)}; north star "
          + ("MET" if ok else "FAILED"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
