"""Jitted train / eval steps — the five trainer variants of the reference,
selected statically by config.

reference: trainer.py:15-181 (train) / :188-483 (validate), dispatch table
at train_interface.py:62-77.  Each reference variant is one python loop
body around the autograd step; here each becomes a pure jitted function
(state, batch) -> (state, metrics) suitable for pjit over a device mesh.

Deviation, documented: the reference's perceptual loop calls
``model(inputs)`` without targets (trainer.py:61), which only works for
DCCRN and crashes for CRN (CRN.forward always STFTs targets,
models.py:505).  We pass targets to the model in the perceptual step so
both models work; the DCCRN math is unchanged.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..config import Config
from ..dsp import frame_stft, frame_istft, mag_phase
from ..losses import main_loss, perceptual_loss
from ..ops.cirm import build_complex_ideal_ratio_mask, decompress_cIRM


def trainer_variant(cfg: Config) -> str:
    """Static 5-way dispatch (reference: train_interface.py:62-77)."""
    if cfg.perceptual is not False:
        return "perceptual"
    if cfg.model == "FullSubNet":
        return "fullsubnet"
    if cfg.masking_mode == "Direct(None make)" and cfg.model == "DCCRN":
        return "dccrn_direct"
    if cfg.masking_mode == "Direct(None make)" and cfg.model == "CRN":
        return "crn_direct"
    return "masking"


def _fullsubnet_features(cfg: Config, inputs, targets):
    s = cfg.stft
    noisy_complex = frame_stft(inputs, s.fft_len, s.torch_hop, s.win_len)
    clean_complex = frame_stft(targets, s.fft_len, s.torch_hop, s.win_len)
    noisy_mag, _ = mag_phase(noisy_complex)
    cIRM = build_complex_ideal_ratio_mask(noisy_complex, clean_complex)
    return noisy_complex, noisy_mag, cIRM


def fullsubnet_enhance(cfg: Config, cRM, noisy_complex, length: int):
    """cRM decode -> complex multiply -> iSTFT
    (reference: trainer.py:341-345)."""
    s = cfg.stft
    cRM = decompress_cIRM(cRM)
    nr, ni = jnp.real(noisy_complex), jnp.imag(noisy_complex)
    enhanced_real = cRM[..., 0] * nr - cRM[..., 1] * ni
    enhanced_imag = cRM[..., 1] * nr + cRM[..., 0] * ni
    enhanced = jnp.stack((enhanced_real, enhanced_imag), axis=-1)
    return frame_istft(
        enhanced, s.fft_len, s.torch_hop, s.win_len, length=length
    )


def _loss_and_outputs(cfg: Config, model, params, batch_stats, inputs, targets,
                      train: bool, dropout_rng):
    """Forward + loss for the configured variant. Returns
    (loss, (aux_metrics, outputs_wav, new_batch_stats))."""
    variant = trainer_variant(cfg)
    variables = {"params": params, "batch_stats": batch_stats}
    rngs = {"dropout": dropout_rng} if dropout_rng is not None else {}

    def apply(*args, **kwargs):
        if train:
            out, mut = model.apply(
                variables, *args, train=True, rngs=rngs,
                mutable=["batch_stats"], **kwargs,
            )
            return out, mut.get("batch_stats", batch_stats)
        out = model.apply(variables, *args, train=False, rngs=rngs, **kwargs)
        return out, batch_stats

    aux = {}
    if variant == "masking":
        (_, _, outputs), new_bs = apply(inputs, targets)
        loss = main_loss(cfg.loss, outputs, targets)
    elif variant == "perceptual":
        out, new_bs = apply(inputs, targets)
        if cfg.model == "DCCRN":
            real_spec, img_spec, outputs = out
            m_loss = main_loss(cfg.loss, outputs, targets)
            if cfg.perceptual == "LMS":
                # clean mags from the model's own STFT path
                # (reference: models.py:305-312)
                from ..dsp import conv_stft, make_conv_stft_kernels

                k = make_conv_stft_kernels(
                    cfg.stft.win_len, cfg.stft.win_inc,
                    cfg.stft.fft_len, cfg.stft.window,
                )
                specs = conv_stft(targets, k)
                dim = cfg.stft.fft_len // 2 + 1
                clean_mags = jnp.sqrt(
                    specs[:, :dim] ** 2 + specs[:, dim:] ** 2 + 1e-7
                )
                est_mags = jnp.sqrt(real_spec**2 + img_spec**2 + 1e-7)
                p_loss = perceptual_loss(
                    "LMS", targets, outputs, clean_mags, est_mags
                )
            else:
                p_loss = perceptual_loss(cfg.perceptual, targets, outputs)
        else:  # CRN
            est_mags, target_mags, outputs = out
            m_loss = main_loss(cfg.loss, outputs, targets)
            if cfg.perceptual == "LMS":
                p_loss = perceptual_loss(
                    "LMS", targets, outputs, target_mags, est_mags
                )
            else:
                p_loss = perceptual_loss(cfg.perceptual, targets, outputs)
        r1, r2 = 1.0, 1.0  # constraint ratio (reference: trainer.py:66-69)
        loss = (r1 * m_loss + r2 * p_loss) / (r1 + r2)
        aux = {"main_loss": r1 * m_loss, "perceptual_loss": r2 * p_loss}
    elif variant == "fullsubnet":
        noisy_complex, noisy_mag, cIRM = _fullsubnet_features(
            cfg, inputs, targets
        )
        cRM, new_bs = apply(noisy_mag)
        # argument order preserved from reference trainer.py:107
        loss = main_loss(cfg.loss, cIRM, cRM)
        outputs = (cRM, noisy_complex)
    elif variant == "dccrn_direct":
        (out_r, tgt_r, out_i, tgt_i, outputs), new_bs = apply(inputs, targets)
        loss = (
            main_loss(cfg.loss, out_r, tgt_r)
            + main_loss(cfg.loss, out_i, tgt_i)
        ) / 2
    elif variant == "crn_direct":
        (out_mag, tgt_mag, outputs), new_bs = apply(inputs, targets)
        loss = main_loss(cfg.loss, out_mag, tgt_mag)
    else:
        raise ValueError(variant)
    return loss, (aux, outputs, new_bs)


def make_train_step(cfg: Config, model) -> Callable:
    """One optimisation step: grads through the full stack incl. STFT GEMMs
    (reference hot loop: trainer.py:23-40).

    With ``cfg.train.grad_accum = A > 1`` the batch is processed as A
    sequential micro-batches inside ONE jitted step (lax.scan): gradients
    are averaged, batch statistics thread through the chunks (each
    micro-forward updates the running stats, like feeding the chunks as
    separate batches), and a single optimiser update is applied.  Only
    one micro-batch's activations are live at a time, so the EFFECTIVE
    batch can exceed the single-chip activation ceiling (docs/PERF.md).
    """
    return jax.jit(train_step_body(cfg, model), donate_argnums=(0,))


def train_step_body(cfg: Config, model) -> Callable:
    """The un-jitted train step (shared by the single-device jit and the
    mesh pjit in se_tpu/parallel/dp.py — both paths get grad_accum)."""
    accum = cfg.train.grad_accum
    variant = trainer_variant(cfg)

    def train_step(state, inputs, targets, dropout_rng):
        if accum == 1:
            def loss_fn(params):
                return _loss_and_outputs(
                    cfg, model, params, state.batch_stats, inputs, targets,
                    train=True, dropout_rng=dropout_rng,
                )

            (loss, (aux, _, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            state = state.apply_gradients(grads, new_batch_stats=new_bs)
            metrics = {"loss": loss, **aux}
            return state, metrics

        B = inputs.shape[0]
        assert B % accum == 0, (B, accum)
        mb = B // accum
        xs = (
            inputs.reshape(accum, mb, *inputs.shape[1:]),
            targets.reshape(accum, mb, *targets.shape[1:]),
            jax.random.split(dropout_rng, accum),
        )
        aux0 = (
            {"main_loss": 0.0, "perceptual_loss": 0.0}
            if variant == "perceptual" else {}
        )
        grads0 = jax.tree_util.tree_map(jnp.zeros_like, state.params)

        def body(carry, chunk):
            grads_acc, bs, loss_acc, aux_acc = carry
            x, y, key = chunk

            def loss_fn(params):
                return _loss_and_outputs(
                    cfg, model, params, bs, x, y,
                    train=True, dropout_rng=key,
                )

            (loss, (aux, _, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            grads_acc = jax.tree_util.tree_map(
                lambda a, g: a + g, grads_acc, grads
            )
            aux_acc = {k: aux_acc[k] + aux[k] for k in aux_acc}
            return (grads_acc, new_bs, loss_acc + loss, aux_acc), None

        (grads, new_bs, loss, aux), _ = jax.lax.scan(
            body, (grads0, state.batch_stats, 0.0, aux0), xs
        )
        grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
        state = state.apply_gradients(grads, new_batch_stats=new_bs)
        metrics = {"loss": loss / accum,
                   **{k: v / accum for k, v in aux.items()}}
        return state, metrics

    return train_step


def make_eval_step(cfg: Config, model) -> Callable:
    """Validation forward: loss + enhanced waveforms for host-side scoring
    (reference: trainer.py:188-483)."""
    return jax.jit(eval_step_body(cfg, model))


def eval_step_body(cfg: Config, model) -> Callable:
    """The un-jitted eval step (shared by the single-device jit and the
    mesh pjit in se_tpu/parallel/dp.py, like train_step_body)."""
    variant = trainer_variant(cfg)

    def eval_step(state, inputs, targets):
        loss, (aux, outputs, _) = _loss_and_outputs(
            cfg, model, state.params, state.batch_stats, inputs, targets,
            train=False, dropout_rng=jax.random.PRNGKey(0),
        )
        if variant == "fullsubnet":
            cRM, noisy_complex = outputs
            outputs = fullsubnet_enhance(
                cfg, cRM, noisy_complex, length=inputs.shape[-1]
            )
        metrics = {"loss": loss, **aux}
        return metrics, outputs

    return eval_step
