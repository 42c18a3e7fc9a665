from .stft import (
    ConvStftKernels,
    conv_stft,
    conv_stft_mag_phase,
    conv_istft,
    make_conv_stft_kernels,
    stft as frame_stft,
    istft as frame_istft,
    mag_phase,
)
from .ola import overlap_add
