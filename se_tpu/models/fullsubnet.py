"""FullSubNet: full-band / sub-band fusion model predicting compressed cIRM.

reference: models.py:568-682.  The sub-band stage folds B*F into the batch
axis — on TPU this is one large batched scan (B*257 sequences), exactly the
shape the MXU wants.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ..config import Config
from ..ops.norms import norm_wrapper
from ..ops.unfold import unfold
from .layers import SequenceModel


class FullSubNet(nn.Module):
    cfg: Config

    def setup(self):
        c = self.cfg
        fsn = c.fullsubnet
        num_freqs = c.stft.num_freqs
        assert c.sequence_model in ("GRU", "LSTM"), (
            f"{type(self).__name__} only support GRU and LSTM."
        )
        self.fb_model = SequenceModel(
            input_size=num_freqs,
            output_size=num_freqs,
            hidden_size=fsn.fb_model_hidden_size,
            num_layers=2,
            sequence_model=c.sequence_model,
            output_activate_function=fsn.fb_output_activate_function,
            dropout=fsn.dropout,
            use_pallas=c.use_pallas_lstm,
            name="fb_model",
        )
        self.sb_model = SequenceModel(
            input_size=(fsn.sb_num_neighbors * 2 + 1)
            + (fsn.fb_num_neighbors * 2 + 1),
            output_size=2,
            hidden_size=fsn.sb_model_hidden_size,
            num_layers=2,
            sequence_model=c.sequence_model,
            output_activate_function=fsn.sb_output_activate_function,
            dropout=fsn.dropout,
            use_pallas=c.use_pallas_lstm,
            name="sb_model",
        )
        self.sb_num_neighbors = fsn.sb_num_neighbors
        self.fb_num_neighbors = fsn.fb_num_neighbors
        self.look_ahead = fsn.look_ahead
        self.norm = norm_wrapper(fsn.norm_type)

    def __call__(self, noisy_mag: jnp.ndarray, train: bool = False,
                 valid_frames=None):
        """[B, F, T] (or [B, 1, F, T]) noisy magnitudes -> [B, F, T, 2] cRM.

        reference: models.py:626-672.

        ``valid_frames`` (traced, optional): the input is a
        longer-than-utterance padded buffer whose first ``valid_frames``
        frames are real.  Frames at/after it are zeroed and excluded
        from the offline norms' statistics (count = valid_frames +
        look_ahead, matching the exact-length run where the only trailing
        frames are the look_ahead zeros) — so a causal sequence model
        produces the exact-length run's outputs on the valid prefix.
        Scalar (one count for the whole batch) or per-sample [B]
        (enhance.py --batch groups different true lengths into one
        device batch).  Output frames at/after a sample's count are
        garbage by contract; callers crop them (enhance.py length
        bucketing).
        """
        if noisy_mag.ndim == 3:
            noisy_mag = noisy_mag[:, None]
        if valid_frames is not None:
            valid_frames = jnp.reshape(
                jnp.asarray(valid_frames), (-1, 1, 1, 1)
            )
            noisy_mag = noisy_mag * (
                jnp.arange(noisy_mag.shape[-1]) < valid_frames
            ).astype(noisy_mag.dtype)
        # bf16 compute path: activations in bf16, norm statistics and the
        # RNN carries in f32 (ops/norms.py, ops/rnn.py); output cast back
        compute_dtype = (
            jnp.bfloat16
            if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        )
        noisy_mag = noisy_mag.astype(compute_dtype)
        noisy_mag = jnp.pad(
            noisy_mag, ((0, 0), (0, 0), (0, 0), (0, self.look_ahead))
        )
        B, C, F, T = noisy_mag.shape
        assert C == 1, f"{type(self).__name__} takes the mag feature as inputs."

        # stats over valid + look_ahead frames: the exact-length run's
        # offline norms include its look_ahead zero-pad in the count
        stat_frames = (
            None if valid_frames is None else valid_frames + self.look_ahead
        )

        # Fullband model
        fb_input = self.norm(
            noisy_mag, valid_frames=stat_frames
        ).reshape(B, C * F, T)
        fb_output = self.fb_model(fb_input, train=train).reshape(B, 1, F, T)

        # Unfold fullband output [B, N=F, C, F_f, T]
        fb_unfolded = unfold(fb_output, num_neighbor=self.fb_num_neighbors)
        fb_unfolded = fb_unfolded.reshape(
            B, F, self.fb_num_neighbors * 2 + 1, T
        )

        # Unfold noisy spectrogram [B, N=F, C, F_s, T]
        noisy_unfolded = unfold(noisy_mag, num_neighbor=self.sb_num_neighbors)
        noisy_unfolded = noisy_unfolded.reshape(
            B, F, self.sb_num_neighbors * 2 + 1, T
        )

        sb_input = jnp.concatenate([noisy_unfolded, fb_unfolded], axis=2)
        sb_input = self.norm(sb_input, valid_frames=stat_frames)
        sb_input = sb_input.reshape(
            B * F,
            (self.sb_num_neighbors * 2 + 1) + (self.fb_num_neighbors * 2 + 1),
            T,
        )

        # [B*F, (F_s+F_f), T] -> [B*F, 2, T] -> [B, F, 2, T]
        sb_mask = self.sb_model(sb_input, train=train)
        sb_mask = jnp.transpose(
            sb_mask.reshape(B, F, 2, T), (0, 2, 1, 3)
        )

        output = sb_mask[:, :, :, self.look_ahead :]
        out = jnp.transpose(output, (0, 2, 3, 1))  # [B, F, T, 2]
        return out.astype(jnp.float32)
