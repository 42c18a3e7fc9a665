"""se_tpu — TPU-native speech enhancement in the frequency domain.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
seorim0/DNN-based-Speech-Enhancement-in-the-frequency-domain:
DCCRN / CRN / FullSubNet models, T-F masking and spectral mapping,
MSE/SDR/SI-SNR/SI-SDR + LMS/PMSQE losses, and a PESQ/STOI/CSIG/CBAK/COVL
evaluation stack — designed for TPU (SPMD data parallelism over an ICI
mesh, fused STFT GEMM kernels, scan-based RNNs).
"""

__version__ = "0.1.0"

from .config import Config, default_config, tutorial_config
