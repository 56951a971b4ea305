"""Kernel dispatch: decide when the fused Pallas path applies.

The Pallas kernels specialize on the phase structure of the coordinate
mapping (see fsr_tpu.kernels.fused); this module owns the eligibility check
and the call into the right kernel, so api.upscale stays backend-agnostic.
"""

from __future__ import annotations

from typing import Tuple

import jax

from fsr_tpu.core.constants import EasuConstants, RcasConstants


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def supported(image, out_size, con: EasuConstants, compute_dtype,
              out_dtype=None) -> bool:
    from fsr_tpu.kernels import easu_gather, fused

    if not _on_tpu():
        return False
    shape = image.shape
    if shape[-3] == 4:
        # The phase-decomposed kernel takes RGBA natively (supports_alpha);
        # for the gather kernel api splits off alpha (bilinear) and runs
        # the kernel on RGB.
        shape = shape[:-3] + (3,) + shape[-2:]
    return fused.supported(shape, out_size, con, compute_dtype,
                           out_dtype=out_dtype) or (
        easu_gather.supported(shape, out_size, con, compute_dtype,
                              out_dtype=out_dtype)
    )


def supports_alpha(image, out_size, con: EasuConstants, compute_dtype,
                   out_dtype=None) -> bool:
    """True when the kernel path consumes RGBA natively (in-kernel bilinear
    alpha + RCAS passthrough) — one dispatch, no XLA alpha pass."""
    from fsr_tpu.kernels import fused

    return (
        _on_tpu()
        and image.shape[-3] == 4
        and fused.supported(image.shape, out_size, con, compute_dtype,
                            out_dtype=out_dtype)
    )


def upscale_fused(
    image,
    out_size: Tuple[int, int],
    con: EasuConstants,
    rcon: RcasConstants,
    apply_rcas: bool,
    denoise: bool,
    compute_dtype,
    epilogue=None,
    frame=None,
    grain=None,
    grain_planar=None,
    prologue: str = "none",
    out_dtype=None,
    dither_page=None,
):
    """Dispatch to the right fused kernel.

    epilogue / frame / grain: optional fused output post-ops
    (kernels/epilogue.py); `grain` is plain output-space (3, Hout, Wout).
    The phase-decomposed 2x kernel wants grain phase-planar: pass
    `grain_planar` (fused.planarize_grain — cache it, the transpose costs
    a full-frame pass) or it is derived from `grain` inline.
    """
    from fsr_tpu.kernels import easu_gather, fused

    if fused.supported(image.shape, out_size, con, compute_dtype,
                       out_dtype=out_dtype):
        # Integer-ratio phase structure: single fused EASU+RCAS kernel.
        gp = grain_planar
        if gp is None and grain is not None:
            gp = fused.planarize_grain(grain, out_size, con)
        return fused.upscale_fused(
            image, out_size, con, rcon,
            apply_rcas=apply_rcas, denoise=denoise, compute_dtype=compute_dtype,
            epilogue=epilogue, frame=frame, grain_planar=gp,
            prologue=prologue, out_dtype=out_dtype, dither_page=dither_page,
        )
    # Arbitrary ratio: one-hot MXU gather EASU with RCAS fused via the
    # one-tile software pipeline (no intermediate HBM round trip).
    return easu_gather.easu_gather(
        image, out_size, con, rcon=rcon, apply_rcas=apply_rcas,
        denoise=denoise, compute_dtype=compute_dtype,
        epilogue=epilogue, frame=frame, grain=grain, prologue=prologue,
        out_dtype=out_dtype, dither_page=dither_page,
    )
