"""Frozen, validated configuration for the TPU-native speech-enhancement framework.

Mirrors every knob of the reference's global-module config (reference:
config.py:22-81) as an immutable dataclass tree, replacing the
frozen-at-import singleton (reference: config.py:35-50) with an explicit
value that is passed around and hashed into jitted train steps.

Validity rules reproduce reference config.py:86-89.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

# ---------------------------------------------------------------------------
# Capability lists (reference: config.py:22-27)
# ---------------------------------------------------------------------------
MODEL_LIST = ("DCCRN", "CRN", "FullSubNet")
LOSS_LIST = ("MSE", "SDR", "SI-SNR", "SI-SDR")
PERCEPTUAL_LIST = (False, "LMS", "PMSQE")
LSTM_TYPES = ("real", "complex")
MAIN_NETS = ("LSTM", "GRU")
MASK_TYPES = ("Direct(None make)", "E", "C", "R")
NORM_TYPES = (
    "offline_laplace_norm",
    "cumulative_laplace_norm",
    "offline_gaussian_norm",
    "cumulative_layer_norm",
)


@dataclass(frozen=True)
class StftConfig:
    """STFT geometry (reference: config.py:54-61).

    Two STFT paths exist in the reference and both are preserved:
      * the conv-STFT path with hop ``win_inc`` used by DCCRN/CRN
        (reference: tools_for_model.py:16-112), and
      * the framework-STFT path with hop ``int(win_len * ola_ratio)`` used
        only by the FullSubNet pipeline (reference: tools_for_model.py:628-651).
    The hop disagreement (100 vs 300) is a documented reference quirk kept
    behind these two explicit accessors.
    """

    fs: int = 16000
    win_len: int = 400
    win_inc: int = 100
    ola_ratio: float = 0.75
    fft_len: int = 512
    window: str = "hanning"

    @property
    def num_freqs(self) -> int:
        return self.fft_len // 2 + 1

    @property
    def conv_hop(self) -> int:
        """Hop used by the ConvSTFT path (DCCRN/CRN)."""
        return self.win_inc

    @property
    def torch_hop(self) -> int:
        """Hop used by the framework-STFT path (FullSubNet).

        reference: tools_for_model.py:628 ``hop_length=int(cfg.win_len*cfg.ola_ratio)``.
        """
        return int(self.win_len * self.ola_ratio)


@dataclass(frozen=True)
class DccrnConfig:
    """DCCRN hyperparameters (reference: config.py:50, :63-65; models.py:17-52)."""

    rnn_layers: int = 2
    rnn_units: int = 256
    kernel_num: Tuple[int, ...] = (32, 64, 128, 256, 256, 256)
    kernel_size: int = 5
    use_cbn: bool = False  # complex batch norm (reference: models.py:26,76)


@dataclass(frozen=True)
class CrnConfig:
    """CRN hyperparameters (reference: config.py:67-68; models.py:330-365)."""

    rnn_layers: int = 2
    rnn_input_size: int = 512
    rnn_units: int = 256
    kernel_size: int = 5


@dataclass(frozen=True)
class FullSubNetConfig:
    """FullSubNet block (reference: config.py:70-81)."""

    sb_num_neighbors: int = 15
    fb_num_neighbors: int = 0
    look_ahead: int = 2
    fb_output_activate_function: Optional[str] = "ReLU"
    sb_output_activate_function: Optional[str] = None
    fb_model_hidden_size: int = 512
    sb_model_hidden_size: int = 384
    weight_init: bool = False
    norm_type: str = "offline_laplace_norm"
    num_groups_in_drop_band: int = 2
    # Inter-layer RNN dropout in both SequenceModels (reference:
    # tools_for_model.py:726-795 hardcodes 0.8).  Exposed so training-
    # trajectory parity tests (and deterministic ablations) can zero it.
    dropout: float = 0.8


@dataclass(frozen=True)
class TrainConfig:
    """Training-loop hyperparameters (reference: config.py:44-47)."""

    max_epochs: int = 100
    learning_rate: float = 1e-3
    batch: int = 10
    seed: int = 0

    # TPU memory levers (beyond reference; docs/PERF.md).  grad_accum
    # splits each batch into N sequential micro-batches inside the jitted
    # step (activations live one micro-batch at a time, so the EFFECTIVE
    # batch can exceed the single-chip activation ceiling); adam_mu_dtype
    # stores Adam's first moment in a narrower dtype (e.g. "bfloat16").
    grad_accum: int = 1
    adam_mu_dtype: Optional[str] = None

    # Paths (reference: config.py:11-16)
    job_dir: str = "./models/"
    logs_dir: str = "./logs/"
    chkpt_model: Optional[str] = None
    chkpt: str = "EPOCH"
    expr_num: str = "EXPERIMENT_NUMBER"

    # Data: a monolithic [N, 2, T] array per split (reference: dataloader.py:34-71)
    train_data_path: Optional[str] = None
    valid_data_path: Optional[str] = None
    test_data_path: Optional[str] = None


@dataclass(frozen=True)
class ParallelConfig:
    """TPU scaling knobs — new in this framework (the reference is strictly
    single-device; SURVEY.md section 2 'Parallelism').

    Batch data parallelism over a 1-D ICI mesh is the faithful scaling axis
    for independent 3-second utterances.
    """

    data_axis: str = "data"
    num_devices: int = 0  # 0 = use all available
    prefetch_depth: int = 2  # host->device double buffering
    eval_workers: int = 0  # 0 = cpu_count; host-side PESQ/STOI fan-out


@dataclass(frozen=True)
class ObsConfig:
    """Observability knobs.

    The reference hard-codes a 10-epoch audio-logging cadence
    (trainer.py:232-233) and never wires its spectrogram/mask image
    channels (write_on_tensorboard.py:338-386); here both ride the same
    configurable cadence.
    """

    log_media_every: int = 10  # epochs between audio + image logging


@dataclass(frozen=True)
class Config:
    """Top-level config. Equivalent surface to the reference's config.py."""

    model: str = "DCCRN"
    loss: str = "SDR"
    perceptual: object = False  # False | 'LMS' | 'PMSQE'
    lstm: str = "complex"
    sequence_model: str = "LSTM"
    masking_mode: str = "E"
    skip_type: bool = True

    stft: StftConfig = field(default_factory=StftConfig)
    dccrn: DccrnConfig = field(default_factory=DccrnConfig)
    crn: CrnConfig = field(default_factory=CrnConfig)
    fullsubnet: FullSubNetConfig = field(default_factory=FullSubNetConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    obs: ObsConfig = field(default_factory=ObsConfig)

    # Numerics: params/activations dtype for the network compute path.
    # f32 default matches the reference; bf16 is the TPU-native fast path.
    compute_dtype: str = "float32"

    # Use the Pallas fused im2col-GEMM kernel for the DCCRN/CRN encoder
    # convs (se_tpu/ops/pallas_conv.py). Off by default.
    use_pallas_conv: bool = False

    # Run LSTM and GRU recurrences as the fused VMEM-resident Pallas
    # cells (se_tpu/ops/pallas_lstm.py): the whole scan is one kernel
    # with the carry and recurrent weights resident in VMEM, and only
    # the backward-needed state sequence is stashed — measured 4.6x
    # faster than the lax.scan LSTM cell on v5e, 2.4x for the GRU
    # variant (docs/PERF.md round-3).  Also the memory-lean path that
    # lets FullSubNet's B*257-row sub-band model train at real batch
    # sizes (the hoisted x_proj OOMs otherwise, for both cell types).
    # "auto" (default): on for TPU execution — single-chip, and under
    # any SPMD mesh whose step was built by se_tpu/parallel/dp.py (each
    # kernel call is wrapped in jax.shard_map over the data axis, so
    # scale-out keeps the fused cells; batches that don't divide the
    # mesh fall back to the lax.scan cell).  Off on CPU, where the
    # kernel only runs in slow interpret mode.  "on"/"off" (or
    # True/False) force it.
    use_pallas_lstm: str = "auto"

    # Complex-conv realisation: "block" = one conv with the real 2x2 block
    # kernel [[wr, -wi], [wi, wr]] (full 2ci->2co channel counts, the
    # MXU-friendly shape); "dbatch" = round-1 doubled-batch form.
    conv_variant: str = "block"

    # Small-channel early conv stages as polyphase space-to-depth GEMMs
    # (se_tpu/ops/conv.py conv2d_freq_s2d): "auto" folds frequency blocks
    # into the contraction wherever the direct conv's C*kh*kw depth is
    # MXU-hostile.  Default OFF: measured end-to-end on v5e the fold
    # LOSES (train 364.5 vs 401.1 utt/s, enhance 1252.9 vs 1521.7 at
    # B=112/96 bf16) — the FLOP inflation and the reshape/transpose
    # breaks in XLA's conv+BN+PReLU fusion chains outweigh the GEMM-shape
    # win at these sizes (docs/PERF.md round-3).  Kept as an exact,
    # tested formulation ("auto"/explicit r) for larger-F regimes.
    conv_s2d: str = "off"

    # Rematerialise whole encoder/decoder stages (conv+BN+PReLU) in the
    # backward pass — trades recompute for HBM, unlocking larger
    # per-chip batches.
    remat_convs: bool = False

    def __post_init__(self):
        if self.model not in MODEL_LIST:
            raise ValueError(f"model must be one of {MODEL_LIST}, got {self.model!r}")
        if self.loss not in LOSS_LIST:
            raise ValueError(f"loss must be one of {LOSS_LIST}, got {self.loss!r}")
        if self.perceptual not in PERCEPTUAL_LIST:
            raise ValueError(
                f"perceptual must be one of {PERCEPTUAL_LIST}, got {self.perceptual!r}"
            )
        if self.lstm not in LSTM_TYPES:
            raise ValueError(f"lstm must be one of {LSTM_TYPES}, got {self.lstm!r}")
        if self.sequence_model not in MAIN_NETS:
            raise ValueError(
                f"sequence_model must be one of {MAIN_NETS}, got {self.sequence_model!r}"
            )
        if self.masking_mode not in MASK_TYPES:
            raise ValueError(
                f"masking_mode must be one of {MASK_TYPES}, got {self.masking_mode!r}"
            )
        if self.fullsubnet.norm_type not in NORM_TYPES:
            raise ValueError(
                f"norm_type must be one of {NORM_TYPES}, got {self.fullsubnet.norm_type!r}"
            )
        # Reference validity asserts (config.py:86-89)
        if self.masking_mode == "Direct(None make)" and self.perceptual is not False:
            raise ValueError("This setting is not created (Direct + perceptual)")
        if self.model == "FullSubNet" and self.perceptual is not False:
            raise ValueError("This setting is not created (FullSubNet + perceptual)")

    # -- convenience -------------------------------------------------------
    def replace(self, **kwargs) -> "Config":
        return dataclasses.replace(self, **kwargs)

    def banner(self) -> str:
        """Human-readable config banner (reference: config.py:94-107)."""
        lines = [
            "--------------------  C  O  N  F  I  G  ----------------------",
            "--------------------------------------------------------------",
            f"MODEL INFO : {self.model}",
            f"LOSS INFO : {self.loss}, perceptual : {self.perceptual}",
        ]
        if self.model != "FullSubNet":
            lines += [
                f"LSTM : {self.lstm}",
                f"SKIP : {self.skip_type}",
                f"MASKING INFO : {self.masking_mode}",
            ]
        else:
            lines += [f"Main network : {self.sequence_model}"]
        lines += [
            f"\nBATCH : {self.train.batch}",
            f"LEARNING RATE : {self.train.learning_rate}",
            "--------------------------------------------------------------",
            "--------------------------------------------------------------\n",
        ]
        return "\n".join(lines)


# The tutorial (SE_tutorials.ipynb) config: CRN, E-mask, MSE, CPU-runnable.
def tutorial_config() -> Config:
    return Config(model="CRN", loss="MSE", lstm="real", masking_mode="E")


def default_config() -> Config:
    return Config()
