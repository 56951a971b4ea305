"""Fused EASU(+RCAS) Pallas kernel — placeholder until the kernel lands.

The real implementation (phase-decomposed stencil, see SURVEY.md section 7
step 3-4) replaces this; `supported()` gates dispatch.
"""

from __future__ import annotations


def supported(in_shape, out_size, con, compute_dtype) -> bool:
    return False


def upscale_fused(image, out_size, con, rcon, apply_rcas, denoise, compute_dtype):
    raise NotImplementedError("fused Pallas kernel not yet available")
