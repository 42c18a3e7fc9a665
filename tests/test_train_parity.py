"""Training-dynamics parity vs torch: gradients, optimizer and trajectories.

Forward golden parity (test_dccrn_parity.py etc.) cannot see backward or
optimizer semantics.  These tests pin them against torch oracles
(reference hot loop: trainer.py:30-37; optimiser: train_interface.py:59;
output clamp whose gradient matters: models.py:248,:282) in four tiers,
because f32 + Adam makes a single tight multi-step pin impossible —
Adam normalises near-zero gradients to full ±lr steps, so the sign of
f32 roundoff flips whole updates and trajectories diverge chaotically
(~0.4% relative by step 10, measured).  Instead:

1. GRADIENT parity, per trainer variant: torch autograd vs jax.grad of
   the identical loss on identical weights/batch, train-mode BN —
   elementwise, per-leaf relative.  Pins backward semantics through the
   clamp, transposed convs, PReLU, BN-train and the recurrences.
2. SGD trajectory: 10 weight-identical steps with plain SGD (updates
   proportional to gradients — no sign amplification), losses pinned to
   2e-4 relative, final params and BN running stats tight.  Pins
   ACCUMULATED backward + BN-running-stat semantics over real steps.
3. Adam-on-identical-gradients: optax.adam vs torch.optim.Adam driven
   by the same synthetic gradient sequence — pins bias correction, eps
   placement and lr handling to 1e-6 without any model noise.
4. Adam trajectory (the reference's actual optimiser) as an
   integration pin at the measured-chaos tolerance (1%).

f32, CPU.  FullSubNet's inter-layer RNN dropout is zeroed on both sides
(the only stochastic trainer element; RNG streams cannot match across
frameworks).
"""

import numpy as np
import optax
import pytest
import torch
import jax
import jax.numpy as jnp

from se_tpu.config import FullSubNetConfig
from se_tpu.models import build_model
from se_tpu.train import make_train_step
from se_tpu.train.state import TrainState, make_optimizer
from se_tpu.train.steps import _loss_and_outputs
from tests.test_models import small_cfg

N_STEPS = 10
BATCH = 2
SAMPLES = 16000  # 1 s
_TINY_KN = (8, 16, 16, 32, 32, 32)

# tier-2/4 trajectory tolerances (measured drift recorded in comments)
SGD_LOSS_RTOL = 2e-4
ADAM_LOSS_RTOL = 1e-2  # measured chaos: 0.4% by step 10 (see docstring)


def _speech_batches(steps: int, batch: int, samples: int, seed: int):
    """Deterministic speech-like (noisy, clean) batches, one per step."""
    rng = np.random.default_rng(seed)
    t = np.arange(samples) / 16000.0
    clean = []
    for i in range(steps * batch):
        sig = sum(
            np.sin(2 * np.pi * f * t + 0.7 * i) / (k + 1)
            for k, f in enumerate((220, 440, 880, 1320))
        )
        env = 0.5 + 0.5 * np.sin(2 * np.pi * 3 * t + i)
        clean.append(0.3 * env * sig / np.max(np.abs(sig)))
    clean = np.asarray(clean, np.float32).reshape(steps, batch, samples)
    noisy = clean + 0.1 * rng.standard_normal(
        (steps, batch, samples)
    ).astype(np.float32)
    return noisy, clean


# --- torch loss restatements (reference: tools_for_loss.py:11-33) --------


def _t_l2(a, b):
    return torch.sum(a * b, dim=-1, keepdim=True)


def torch_neg_sdr(target, est, eps=1e-8):
    sn = _t_l2(target, target)
    d = _t_l2(target - est, target - est)
    return -torch.mean(10 * torch.log10(sn**2 / (d**2 + eps)))


def torch_mse(a, b):
    return torch.mean((a - b) ** 2)


def torch_lms(clean_mags, est_mags, fft_size=512, fs=16000):
    """LMS restated in torch with the framework's documented time-major
    frame orientation (se_tpu/losses/lms.py module docstring; the
    reference's raw ``view(-1, F)`` on [F, T] arrays scrambles rows —
    that quirk's forward parity is covered by test_perceptual_lms.py via
    ``compat_scrambled``).  Matches lms_loss to ~1e-7 relative, so its
    autograd is a valid gradient oracle for the perceptual step."""
    from se_tpu.losses.lms import mel_filterbank

    F = fft_size // 2 + 1
    banks = [
        torch.from_numpy(np.ascontiguousarray(mel_filterbank(s, fft_size, fs).T))
        for s in (16, 32, 64)
    ]

    def transform(m):
        spec = m.transpose(-1, -2).reshape(-1, F) / fft_size
        return [torch.log(torch.clamp(spec @ fb, min=0.0) + 1e-7) for fb in banks]

    pv_t, pv_p = transform(clean_mags), transform(est_mags)
    d = [
        torch.mean(torch.sqrt(torch.mean((p - t) ** 2, -1) + 1e-7))
        for t, p in zip(pv_t, pv_p)
    ]
    return torch.mean(torch.stack(d))


# --- the five trainer variants as (oracle factory, losses, cfg) ----------


def _dccrn_mask_case():
    from tests.oracles.torch_dccrn import OracleDCCRN, export_params_to_jax

    torch.manual_seed(0)
    oracle = OracleDCCRN(kernel_num=_TINY_KN, rnn_units=32)
    cfg = small_cfg(model="DCCRN", masking_mode="E", lstm="complex",
                    loss="SDR")
    return (
        oracle, cfg, export_params_to_jax,
        lambda m, x, y: torch_neg_sdr(y, m(x)[2]),
        1,
    )


def _dccrn_direct_case():
    from tests.oracles.torch_dccrn import OracleDCCRN, export_params_to_jax

    torch.manual_seed(1)
    oracle = OracleDCCRN(
        kernel_num=_TINY_KN, rnn_units=32, masking_mode="Direct(None make)"
    )
    cfg = small_cfg(
        model="DCCRN", masking_mode="Direct(None make)", lstm="complex",
        loss="MSE",
    )

    def loss_fn(m, x, y):
        out_r, tgt_r, out_i, tgt_i, _ = m(x, y)
        return (torch_mse(out_r, tgt_r) + torch_mse(out_i, tgt_i)) / 2

    return oracle, cfg, export_params_to_jax, loss_fn, 2


def _crn_case():
    from tests.oracles.torch_crn import OracleCRN, export_params_to_jax

    torch.manual_seed(2)
    oracle = OracleCRN(kernel_num=_TINY_KN, rnn_input_size=64, rnn_units=32)
    cfg = small_cfg(model="CRN", lstm="real", masking_mode="E", loss="MSE")
    return (
        oracle, cfg, export_params_to_jax,
        lambda m, x, y: torch_mse(m(x)[1], y),
        3,
    )


def _fullsubnet_case(seq):
    from tests.oracles.torch_fullsubnet import (
        OracleFullSubNet, export_params_to_jax,
    )

    torch.manual_seed(3)
    oracle = OracleFullSubNet(
        sb_num_neighbors=3, fb_hidden=32, sb_hidden=24,
        sequence_model=seq, dropout=0.0,
    )
    cfg = small_cfg(model="FullSubNet", loss="MSE", sequence_model=seq)
    cfg = cfg.replace(
        fullsubnet=FullSubNetConfig(
            fb_model_hidden_size=32, sb_model_hidden_size=24,
            sb_num_neighbors=3, dropout=0.0,
        )
    )
    s = cfg.stft
    window = torch.hann_window(s.win_len)

    def loss_fn(m, x, y):
        # feature path restated from reference trainer.py:96-110 +
        # tools_for_model.py:687-723 (cIRM build + compression)
        def t_stft(w):
            return torch.stft(
                w, n_fft=s.fft_len, hop_length=s.torch_hop,
                win_length=s.win_len, window=window, center=True,
                return_complex=True,
            )

        nc, cc = t_stft(x), t_stft(y)
        eps = float(np.finfo(np.float32).eps)
        den = nc.real**2 + nc.imag**2 + eps
        mr = (nc.real * cc.real + nc.imag * cc.imag) / den
        mi = (nc.real * cc.imag - nc.imag * cc.real) / den
        mask = torch.stack((mr, mi), dim=-1)
        mask = torch.where(mask <= -100, torch.full_like(mask, -100.0), mask)
        cirm = 10 * (1 - torch.exp(-0.1 * mask)) / (1 + torch.exp(-0.1 * mask))
        crm = m(nc.abs())
        return torch_mse(cirm, crm)

    return oracle, cfg, export_params_to_jax, loss_fn, 4


def _dccrn_perceptual_case(perceptual):
    """The perceptual trainer variant (reference trainer.py:45-82):
    SDR main loss + LMS/PMSQE perceptual term at r1 = r2 = 1.  Pins the
    backward through the mel/bark machinery on top of the full model
    stack.  The torch perceptual restatements match the framework
    forwards to ~1e-7 relative (torch_lms above; pmsqe_loss_torch in
    tools/torch_perceptual.py mirrors se_tpu/losses/pmsqe.py)."""
    from tests.oracles.torch_dccrn import OracleDCCRN, export_params_to_jax

    torch.manual_seed(5)
    oracle = OracleDCCRN(kernel_num=_TINY_KN, rnn_units=32)
    cfg = small_cfg(
        model="DCCRN", masking_mode="E", lstm="complex", loss="SDR",
        perceptual=perceptual,
    )

    def loss_fn(m, x, y):
        import torch.nn.functional as tF

        out_real, out_imag, wav = m(x, y)
        m_loss = torch_neg_sdr(y, wav)
        if perceptual == "LMS":
            # clean mags from the model's own conv-STFT path
            # (reference models.py:305-312; steps.py perceptual branch)
            dim = m.fft_len // 2 + 1
            tt = tF.pad(y.unsqueeze(1), [m.win_len - m.win_inc] * 2)
            tspecs = tF.conv1d(tt, m.fwd_kernel, stride=m.win_inc)
            clean_mags = torch.sqrt(
                tspecs[:, :dim] ** 2 + tspecs[:, dim:] ** 2 + 1e-7
            )
            est_mags = torch.sqrt(out_real**2 + out_imag**2 + 1e-7)
            p_loss = torch_lms(clean_mags, est_mags)
        else:
            from tools.torch_perceptual import pmsqe_loss_torch

            p_loss = pmsqe_loss_torch(y, wav)
        return (m_loss + p_loss) / 2  # r1 = r2 = 1 (trainer.py:66-69)

    return oracle, cfg, export_params_to_jax, loss_fn, 5


CASES = {
    "dccrn_mask_sdr": _dccrn_mask_case,
    "dccrn_direct_mse": _dccrn_direct_case,
    "crn_mask_mse": _crn_case,
    "fullsubnet_lstm": lambda: _fullsubnet_case("LSTM"),
    "fullsubnet_gru": lambda: _fullsubnet_case("GRU"),
    "dccrn_lms": lambda: _dccrn_perceptual_case("LMS"),
    "dccrn_pmsqe": lambda: _dccrn_perceptual_case("PMSQE"),
}


# --- runners --------------------------------------------------------------


def run_torch(oracle, loss_fn, noisy, clean, opt):
    oracle.train()
    losses = []
    for s in range(noisy.shape[0]):
        x = torch.from_numpy(noisy[s])
        y = torch.from_numpy(clean[s])
        loss = loss_fn(oracle, x, y)
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return losses


def run_jax(cfg, variables, noisy, clean, tx=None):
    model = build_model(cfg)
    tx = tx if tx is not None else make_optimizer(cfg)
    params = variables["params"]
    state = TrainState(
        step=0,
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        tx=tx,
    )
    step = make_train_step(cfg, model)
    losses = []
    for s in range(noisy.shape[0]):
        state, m = step(
            state,
            jnp.asarray(noisy[s]),
            jnp.asarray(clean[s]),
            jax.random.PRNGKey(s),
        )
        losses.append(float(m["loss"]))
    return losses, state


def torch_grad_tree(oracle, export_fn):
    """Map torch .grad onto the jax parameter-tree layout by temporarily
    swapping each parameter's data for its gradient and re-exporting."""
    saved = [(p, p.data) for p in oracle.parameters()]
    try:
        for p, _ in saved:
            p.data = (
                p.grad.detach().clone() if p.grad is not None
                else torch.zeros_like(p.data)
            )
        return export_fn(oracle)["params"]
    finally:
        for p, data in saved:
            p.data = data


def assert_tree_close(want, got, where, rtol, atol=0.0, leaf_rel=None,
                      global_rel=None):
    """Per-leaf comparison; with leaf_rel, atol floors at
    leaf_rel * max|want_leaf| (gradients span many orders of magnitude
    across leaves — per-leaf scaling keeps the pin meaningful).  With
    global_rel, it additionally floors at global_rel * max|want| over the
    WHOLE tree: leaves whose true value is catastrophically cancelled
    (e.g. a BN bias gradient summing +-1e-3 terms to 1e-8) are f32 noise
    on both sides and carry no per-leaf signal."""
    flat_w, tdef_w = jax.tree_util.tree_flatten(want)
    flat_g, tdef_g = jax.tree_util.tree_flatten(got)
    assert tdef_w == tdef_g, (where, tdef_w, tdef_g)
    gmax = max(
        (float(np.max(np.abs(np.asarray(a)))) for a in flat_w if np.asarray(a).size),
        default=0.0,
    )
    for i, (a, b) in enumerate(zip(flat_w, flat_g)):
        a, b = np.asarray(a), np.asarray(b)
        tol = atol
        if leaf_rel is not None and a.size:
            tol = max(tol, leaf_rel * float(np.max(np.abs(a))))
        if global_rel is not None:
            tol = max(tol, global_rel * gmax)
        np.testing.assert_allclose(
            b, a, rtol=rtol, atol=tol, err_msg=f"{where} leaf {i}"
        )


# --- tier 1: gradient parity ----------------------------------------------


@pytest.mark.parametrize("case", list(CASES))
def test_gradient_parity(case):
    """torch autograd vs jax.grad on identical weights/batch, train-mode
    BN — the direct backward-semantics pin for every trainer variant."""
    oracle, cfg, export_fn, t_loss, seed = CASES[case]()
    variables = export_fn(oracle)
    noisy, clean = _speech_batches(1, BATCH, SAMPLES, seed=seed)

    oracle.train()
    loss = t_loss(
        oracle, torch.from_numpy(noisy[0]), torch.from_numpy(clean[0])
    )
    loss.backward()
    want = torch_grad_tree(oracle, export_fn)

    model = build_model(cfg)

    def loss_fn(params):
        l, _ = _loss_and_outputs(
            cfg, model, params, variables.get("batch_stats", {}),
            jnp.asarray(noisy[0]), jnp.asarray(clean[0]),
            train=True, dropout_rng=jax.random.PRNGKey(0),
        )
        return l

    jloss, got = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(float(jloss), float(loss.detach()), rtol=2e-5)
    # 1e-3 of each leaf's own gradient scale (f32 conv/rnn backward
    # reassociation) with a 1e-5-of-global-scale floor for cancelled
    # leaves; semantic errors show up orders of magnitude larger — this
    # test caught the block-kernel complex-conv bias mis-wiring (real
    # bias must enter BOTH real and imag outputs, models/layers.py)
    assert_tree_close(want, got, f"grads[{case}]", rtol=5e-3,
                      leaf_rel=1e-3, global_rel=1e-5)


# --- tier 2: SGD trajectories (tight multi-step accumulation pin) ---------


@pytest.mark.parametrize("case", ["dccrn_mask_sdr", "fullsubnet_lstm"])
def test_sgd_trajectory_tight(case):
    """10 weight-identical plain-SGD steps: updates are proportional to
    gradients (no Adam sign amplification), so losses stay locked at
    2e-4 relative and final params/BN stats pin tightly.  Catches
    accumulated backward + running-stat drift that single-step parity
    cannot."""
    oracle, cfg, export_fn, t_loss, seed = CASES[case]()
    variables = export_fn(oracle)
    noisy, clean = _speech_batches(N_STEPS, BATCH, SAMPLES, seed=seed + 10)

    # small lr: DCCRN's SDR landscape is unstable at lr >= 1e-2, where
    # the trajectory turns chaotic and pins nothing
    lr = 1e-4
    t_losses = run_torch(
        oracle, t_loss, noisy, clean,
        torch.optim.SGD(oracle.parameters(), lr=lr),
    )
    j_losses, state = run_jax(cfg, variables, noisy, clean, tx=optax.sgd(lr))

    np.testing.assert_allclose(
        j_losses, t_losses, rtol=SGD_LOSS_RTOL,
        err_msg=f"SGD loss trajectory [{case}]",
    )
    final = export_fn(oracle)
    assert_tree_close(
        final["params"], state.params, f"SGD params[{case}]",
        rtol=1e-3, leaf_rel=1e-4, global_rel=1e-6,
    )
    if final.get("batch_stats"):
        assert_tree_close(
            final["batch_stats"], state.batch_stats,
            f"SGD batch_stats[{case}]", rtol=1e-3, leaf_rel=1e-4,
            global_rel=1e-6,
        )


# --- tier 3: Adam semantics on identical gradients -------------------------


def test_adam_identical_gradients():
    """optax.adam (se_tpu/train/state.py) vs torch.optim.Adam driven by
    the same synthetic gradient sequence: pins bias correction, eps
    placement (eps OUTSIDE the bias-corrected sqrt, torch semantics) and
    lr handling with no model noise.  Gradients span 1e-8..1e2 to
    exercise the eps regime where wrong placement shows."""
    rng = np.random.default_rng(0)
    shapes = [(7, 5), (64,), (3, 3, 2, 4)]
    scales = [1e-6, 1.0, 30.0]
    p0 = [rng.standard_normal(s).astype(np.float32) for s in shapes]
    grads = [
        [
            (sc * rng.standard_normal(s)).astype(np.float32)
            for s, sc in zip(shapes, scales)
        ]
        for _ in range(20)
    ]

    lr = 1e-3
    tp = [torch.tensor(p, requires_grad=True) for p in p0]
    topt = torch.optim.Adam(tp, lr=lr, betas=(0.9, 0.999), eps=1e-8)
    for g in grads:
        topt.zero_grad()
        for p, gi in zip(tp, g):
            p.grad = torch.from_numpy(gi)
        topt.step()

    tx = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    jp = [jnp.asarray(p) for p in p0]
    opt_state = tx.init(jp)
    for g in grads:
        updates, opt_state = tx.update(
            [jnp.asarray(gi) for gi in g], opt_state, jp
        )
        jp = optax.apply_updates(jp, updates)

    for a, b in zip(tp, jp):
        np.testing.assert_allclose(
            np.asarray(b), a.detach().numpy(), rtol=1e-5, atol=1e-7
        )


def test_adam_bf16_mu_matches_f32_direction():
    """adam_mu_dtype=bfloat16 (TrainConfig perf knob) must not change
    update semantics beyond bf16 quantisation of the first moment."""
    rng = np.random.default_rng(1)
    p0 = rng.standard_normal((32, 16)).astype(np.float32)
    g = rng.standard_normal((32, 16)).astype(np.float32)

    out = []
    for mu_dtype in (None, jnp.bfloat16):
        tx = optax.adam(1e-3, b1=0.9, b2=0.999, eps=1e-8, mu_dtype=mu_dtype)
        p = jnp.asarray(p0)
        st = tx.init(p)
        for _ in range(10):
            up, st = tx.update(jnp.asarray(g), st, p)
            p = optax.apply_updates(p, up)
        out.append(np.asarray(p))
    # measured 8.5e-5 over 10 steps: bf16 quantisation of mu only
    np.testing.assert_allclose(out[0], out[1], atol=3e-4)


# --- tier 4: Adam trajectories (integration, measured-chaos tolerance) ----


@pytest.mark.parametrize(
    "case", ["dccrn_mask_sdr", "dccrn_direct_mse", "crn_mask_mse",
             "fullsubnet_lstm", "fullsubnet_gru", "dccrn_lms"],
)
def test_adam_trajectory_integration(case):
    """10 weight-identical torch.optim.Adam steps vs the real
    make_train_step: the end-to-end reference training loop.  Tolerance
    is the measured f32+Adam chaos floor (0.4% by step 10 — see module
    docstring), NOT a semantic budget; tiers 1-3 carry the tight pins."""
    oracle, cfg, export_fn, t_loss, seed = CASES[case]()
    variables = export_fn(oracle)
    noisy, clean = _speech_batches(N_STEPS, BATCH, SAMPLES, seed=seed)

    t_losses = run_torch(
        oracle, t_loss, noisy, clean,
        torch.optim.Adam(
            oracle.parameters(), lr=cfg.train.learning_rate,
            betas=(0.9, 0.999), eps=1e-8,
        ),
    )
    j_losses, state = run_jax(cfg, variables, noisy, clean)

    np.testing.assert_allclose(
        j_losses, t_losses, rtol=ADAM_LOSS_RTOL,
        err_msg=f"Adam loss trajectory [{case}]",
    )
    # loss must actually train on both sides
    assert t_losses[-1] < t_losses[0]
    assert j_losses[-1] < j_losses[0]
    # no batch_stats pin here: under Adam the running means absorb the
    # param chaos (~0.01 absolute by step 10 for DCCRN/SDR, measured) —
    # BN momentum semantics are pinned tightly by the SGD tier above
