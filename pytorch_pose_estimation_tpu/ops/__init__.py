from .targets import (
    sbp_heatmaps,
    spm_heatmaps,
    spm_masks,
    spm_displacements,
    spm_target,
    SBPHeatmapGenerator,
    SPMTargetGenerator,
)
from .decode import (
    decode_sbp_fast,
    decode_sbp,
    decode_sbp_batch,
    DecodeSBP,
    decode_spm,
    decode_spm_batch,
    DecodeSPM,
)

__all__ = [
    "sbp_heatmaps",
    "spm_heatmaps",
    "spm_masks",
    "spm_displacements",
    "spm_target",
    "SBPHeatmapGenerator",
    "SPMTargetGenerator",
    "decode_sbp",
    "decode_sbp_batch",
    "decode_sbp_fast",
    "DecodeSBP",
    "decode_spm",
    "decode_spm_batch",
    "DecodeSPM",
]
