"""fsr_tpu: TPU-native FidelityFX Super Resolution 1.0 (JAX/Pallas).

A from-scratch rebuild of GPUOpen-Effects/FidelityFX-FSR for TPU:
EASU + RCAS as fused Pallas stencil kernels, SRTM/LFGA/TEPD epilogues,
quality presets, and mesh-sharded batch/spatial execution.
"""

from fsr_tpu.api import upscale, sharpen, UpscalePipeline
from fsr_tpu.core.constants import EasuConstants, RcasConstants, FSR_RCAS_LIMIT
from fsr_tpu.core.presets import PRESETS, Preset, render_resolution, recommended_mip_bias

__version__ = "0.1.0"

__all__ = [
    "upscale",
    "sharpen",
    "UpscalePipeline",
    "EasuConstants",
    "RcasConstants",
    "FSR_RCAS_LIMIT",
    "PRESETS",
    "Preset",
    "render_resolution",
    "recommended_mip_bias",
]
