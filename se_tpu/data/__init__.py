from .dataset import (
    WaveDataset,
    MixingDataset,
    create_dataloader,
    DataLoader,
    gather_pairs,
)
from .multihost import MultiHostLoader, host_shard, make_global_batch
from .prefetch import prefetch_to_device
from .synth import generate_noisy_wav, scan_directory, mix_at_snr
