from .core import remove_dc, l2_norm, sdr_linear, sdr, si_snr, si_sdr, mse
from .lms import lms_loss, mel_filterbank, MEL_SCALES
from .dispatch import main_loss, perceptual_loss
