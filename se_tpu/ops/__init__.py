from .conv import conv2d, conv_transpose2d
from .rnn import (
    LstmParams,
    init_lstm_params,
    lstm,
    lstm_stack,
    init_gru_params,
    gru,
)
from .norms import (
    batch_norm_2d,
    complex_batch_norm,
    offline_laplace_norm,
    cumulative_laplace_norm,
    offline_gaussian_norm,
    cumulative_layer_norm,
    forgetting_norm,
    sband_forgetting_norm,
    hybrid_norm,
    norm_wrapper,
)
from .unfold import unfold
from .cirm import build_complex_ideal_ratio_mask, compress_cIRM, decompress_cIRM
from .activations import prelu
from .magnitude import complex_mag, safe_arctan2
