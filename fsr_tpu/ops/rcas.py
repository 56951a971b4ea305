"""Pure-XLA RCAS (FsrRcasF semantics, /root/reference/ffx-fsr/ffx_fsr1.h:684-769).

The 5-tap cross is materialized with edge-clamped shifts (concatenate of an
edge row/col with a slice — no gathers needed), then the shared resolve math
runs on the planes.

Border note: the reference *sample* reads out-of-bounds via imageLoad, which
returns zeros on GPU APIs; that darkens the 1-pixel border.  We use
edge-clamp instead (strictly higher quality); `border="zero"` reproduces the
sample's behavior for A/B parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from fsr_tpu.core import easu_math
from fsr_tpu.core.constants import RcasConstants

__all__ = ["rcas", "shift_clamped"]


def shift_clamped(img: jnp.ndarray, dy: int, dx: int, border: str = "clamp") -> jnp.ndarray:
    """result[..., y, x] = img[..., clamp(y+dy), clamp(x+dx)] via pad+slice."""
    h, w = img.shape[-2:]
    mode = "edge" if border == "clamp" else "constant"
    out = img
    if dy:
        pad = [(0, 0)] * (img.ndim - 2) + [(max(0, -dy), max(0, dy)), (0, 0)]
        out = jnp.pad(out, pad, mode=mode)
        out = out[..., max(0, dy) : max(0, dy) + h, :]
    if dx:
        pad = [(0, 0)] * (img.ndim - 2) + [(0, 0), (max(0, -dx), max(0, dx))]
        out = jnp.pad(out, pad, mode=mode)
        out = out[..., :, max(0, dx) : max(0, dx) + w]
    return out


@functools.partial(
    jax.jit, static_argnames=("con", "denoise", "compute_dtype", "border")
)
def rcas(
    img: jnp.ndarray,
    con: RcasConstants,
    denoise: bool = False,
    compute_dtype=None,
    border: str = "clamp",
) -> jnp.ndarray:
    """RCAS sharpen.

    img: (..., C, H, W) with C=3, or C=4 for alpha passthrough
    (FSR_RCAS_PASSTHROUGH_ALPHA, ffx_fsr1.h:688-705).
    """
    dt = jnp.dtype(compute_dtype) if compute_dtype is not None else img.dtype
    nch = img.shape[-3]
    rgb = img[..., :3, :, :].astype(dt)

    def split(p):
        return tuple(p[..., i, :, :] for i in range(3))

    b = split(shift_clamped(rgb, -1, 0, border))
    d = split(shift_clamped(rgb, 0, -1, border))
    e = split(rgb)
    f = split(shift_clamped(rgb, 0, 1, border))
    h = split(shift_clamped(rgb, 1, 0, border))

    sharp = con.sharpness_f16 if dt == jnp.float16 else con.sharpness
    out = easu_math.rcas_resolve(b, d, e, f, h, sharp, denoise=denoise)
    out = jnp.stack(out, axis=-3)
    if nch == 4:
        out = jnp.concatenate([out, img[..., 3:4, :, :].astype(dt)], axis=-3)
    return out
