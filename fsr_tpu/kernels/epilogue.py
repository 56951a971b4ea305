"""Fused output epilogue for the stencil kernels.

The reference ships SRTM/LFGA/TEPD as *inline shader helpers* meant to be
called inside the including engine's own passes (ffx_fsr1.h:990-1199 —
e.g. the sample calls FsrTepdC10F at the end of its tonemap shader,
FSR_Tonemapping.hlsl:86-88): they are designed to fuse, not to run as
standalone dispatches.  The TPU equivalent is applying them to the RCAS
result planes while they are still in VMEM, before the single HBM
writeback — each op run as a separate XLA pass instead costs a full
read+write of the 4K image over HBM (~0.25 ms/frame each on v5e).

`Epilogue` is a static (hashable) config; `apply()` is plain jnp math
shared by both stencil kernel families and usable under interpret mode.
Math mirrors fsr_tpu.ops.extras (same approximation choices as the
dtype==float32 branches there).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from fsr_tpu.core import approx

__all__ = ["Epilogue", "DitherTileError", "apply", "encode_unorm8",
           "encode_unorm10", "encode_unorm_codes"]


class DitherTileError(ValueError):
    """The kernel's tile plan cannot host the 128-wide dither page (very
    narrow outputs).  Callers (UpscalePipeline) catch exactly this to fall
    back to the XLA dither after-pass; genuine misconfigurations (bad grain
    shape, wrong page size) stay plain ValueError and propagate."""


def encode_unorm_codes(x, max_code: int):
    """D3D UNORM integer codes floor(sat(x)*max_code + 0.5) as int32
    (matching utils.image.to_uint8/to_uint10 bit-for-bit)."""
    v = jnp.clip(x.astype(jnp.float32), 0.0, 1.0) * jnp.float32(max_code)
    return jnp.floor(v + jnp.float32(0.5)).astype(jnp.int32)


def encode_unorm8(x):
    """uint8 UNORM encode; int32 intermediate (Mosaic has no f32<->u8
    cast); identical on XLA backends."""
    return encode_unorm_codes(x, 255).astype(jnp.uint8)


def encode_unorm10(x):
    """10-bit UNORM codes in uint16 — the RGB10A2 render-target analog
    (the sample's HDR output format, SampleRenderer.cpp:193)."""
    return encode_unorm_codes(x, 1023).astype(jnp.uint16)

# Golden-ratio ordered dither constants (FsrTepdDitF, ffx_fsr1.h:1086-1094).
_DIT_A = np.float32((1.0 + np.sqrt(np.float64(5.0))) / 2.0)
_DIT_B = np.float32(1.0 / 3.69)


@dataclasses.dataclass(frozen=True)
class Epilogue:
    """Output-side post-ops fused into the kernel writeback.

    transform: "none" | "srtm_inv" (HDR out, FsrSrtmInvF ffx_fsr1.h:1044)
      | "gamma2" (gamma-2.0 -> linear squaring, FSR_Pass.hlsl:78-79).
    grain_amount: LFGA film grain strength (FsrLfgaF ffx_fsr1.h:1014);
      nonzero requires a grain operand at call time.
    dither_bits: 8 or 10 enables the TEPD golden-ratio dithered quantize
      (FsrTepdDitF/C8F/C10F ffx_fsr1.h:1086-1121); requires a frame index
      at call time.  Exclusive with transform="srtm_inv" (TEPD expects
      {0..1} input, not HDR).
    """

    transform: str = "none"
    grain_amount: float = 0.0
    dither_bits: Optional[int] = None
    dither_texture: bool = False  # dither positions from a texture operand
    #   (the sample's 128x128 temporal blue noise) instead of the hash

    def __post_init__(self):
        if self.transform not in ("none", "srtm_inv", "gamma2"):
            raise ValueError(f"unknown epilogue transform {self.transform!r}")
        if self.dither_bits not in (None, 8, 10):
            raise ValueError("TEPD supports 8- or 10-bit output")
        if self.dither_bits is not None and self.transform == "srtm_inv":
            raise ValueError("TEPD dithering expects {0..1} input, not HDR out")
        if self.dither_texture and self.dither_bits is None:
            raise ValueError("dither_texture requires dither_bits")

    @property
    def needs_grain(self) -> bool:
        return self.grain_amount != 0.0

    @property
    def needs_frame(self) -> bool:
        return self.dither_bits is not None and not self.dither_texture

    @property
    def needs_dither_tex(self) -> bool:
        return self.dither_texture

    @property
    def is_noop(self) -> bool:
        return (self.transform == "none" and not self.needs_grain
                and self.dither_bits is None)


def apply(res, grow, gcol, frame, grain, epi: Epilogue, *, fast: bool = True,
          dit=None):
    """Apply the epilogue to one result tile.

    res: (3, tj, ti) float32 RCAS/EASU output in [0, 1] ({0..1} tonemapped).
    grow/gcol: int32 global *output* pixel coordinates, broadcastable to
      (1, tj, ti) (the kernels already build these for the RCAS border
      clamps); only used when hash-dithering.
    frame: int32 scalar temporal frame index (hash dither only).
    grain: (3, tj, ti) grain tap in {-0.5..0.5} (grain only).
    dit: (tj, ti) dither positions in [0,1) when epi.dither_texture (the
      kernels slice these from the tiled blue-noise page).
    """
    rcp = approx.rcp_fast if fast else approx.rcp
    if epi.transform == "srtm_inv":
        m = jnp.maximum(jnp.maximum(res[0], res[1]), res[2])
        den = jnp.maximum(jnp.float32(1.0 / 32768.0), jnp.float32(1.0) - m)
        res = res * rcp(den)[None]
    elif epi.transform == "gamma2":
        res = res * res
    if epi.needs_grain:
        a = jnp.float32(epi.grain_amount)
        res = res + (grain * a) * jnp.minimum(jnp.float32(1.0) - res, res)
    if epi.dither_bits is not None:
        if epi.dither_texture:
            dit = dit[None] if dit.ndim == 2 else dit
        else:
            # FsrTepdDitF: fract(phi*(x+frame) + y/3.69), matching
            # ops.extras.tepd_dither's op order exactly.
            x = (gcol + frame).astype(jnp.float32)
            y = grow.astype(jnp.float32)
            v = x * _DIT_A + (y * _DIT_B)
            dit = v - jnp.floor(v)
        steps = jnp.float32(255.0 if epi.dither_bits == 8 else 1023.0)
        inv = jnp.float32(1.0) / steps
        n = jnp.sqrt(res)
        n = jnp.floor(n * steps) * inv
        aa = n * n
        b = n + inv
        b = b * b
        r = (res - b) * approx.prx_med_rcp(aa - b)
        gt = (dit - r > jnp.float32(0.0)).astype(jnp.float32)
        res = approx.sat(n + gt * inv)
    return res
