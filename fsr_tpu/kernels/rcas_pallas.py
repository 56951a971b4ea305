"""Standalone RCAS Pallas kernel (FsrRcasF semantics, any image size).

Used for sharpening without scaling — the reference supports RCAS as an
independent pass (ffx_fsr1.h:602-608).  When RCAS follows EASU it instead
fuses into the upscaling kernels (kernels/fused.py in phase-planar space;
kernels/easu_gather.py via the one-tile software pipeline).

The 5-tap cross is extracted with full-shape rolls on a vreg-aligned input
tile with a 1px halo (see kernels/fused.py for the roll rationale); border
clamping uses global-coordinate masks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fsr_tpu.core import easu_math
from fsr_tpu.core.constants import RcasConstants
from fsr_tpu.kernels import epilogue as epilogue_mod

INTERPRET = False


def _pick_tiles(h: int, w: int):
    tw = 512
    while tw > w and tw > 128:
        tw //= 2
    th = 64
    while th > h and th > 8:
        th //= 2
    return th, tw


@functools.partial(
    jax.jit, static_argnames=("rcon", "denoise", "compute_dtype", "border")
)
def rcas_fused(
    image: jnp.ndarray,
    rcon: RcasConstants,
    denoise: bool = False,
    compute_dtype=None,
    border: str = "clamp",
) -> jnp.ndarray:
    """RCAS sharpen on TPU.  image: (..., 3, H, W) in [0, 1].

    border: "clamp" (edge replication, default) or "zero" — the sample's
    imageLoad reads zeros out of bounds, darkening the 1-pixel border
    (see ops/rcas.py border note); "zero" reproduces that for A/B parity.

    A uint8 image sharpens byte-in/byte-out: decoded v/255 in-kernel
    (byte source + tile DMAs) and re-encoded with the D3D UNORM rule at
    the store (math is f32 either way).  Needs H >= 32 (8-bit block
    granule); api.sharpen falls back to the XLA path below that.
    """
    batch_dims = image.shape[:-3]
    image = image.reshape((-1,) + image.shape[-3:])
    nb = image.shape[0]

    u8 = image.dtype == jnp.uint8
    dt = jnp.dtype(compute_dtype) if compute_dtype is not None else image.dtype
    if dt == jnp.float16:
        dt = jnp.dtype(jnp.float32)  # no Mosaic fp16; match XLA-f16 via f32 math
    h, w = image.shape[-2:]
    th, tw = _pick_tiles(h, w)
    if u8:
        dt = jnp.dtype(jnp.uint8)  # bytes end-to-end; math stays f32
        if th % 32:
            raise ValueError("uint8 RCAS needs H >= 32 (8-bit block granule)")
    ny, nx = pl.cdiv(h, th), pl.cdiv(w, tw)

    ru = lambda v, m: -(-v // m) * m
    tih = ru(th + 2, 8)
    tiw = ru(tw + 2, 128)
    pad_top = pad_left = 1
    pad_bottom = max(0, (ny - 1) * th + tih - (h + pad_top))
    pad_right = max(0, (nx - 1) * tw + tiw - (w + pad_left))
    src = jnp.pad(
        image.astype(dt),
        ((0, 0), (0, 0), (pad_top, pad_bottom), (pad_left, pad_right)),
        mode="edge",
    )
    sharp = float(rcon.sharpness)

    def kernel(src_ref, out_ref, tile, sem):
        bi = pl.program_id(0)
        ty = pl.program_id(1)
        tx = pl.program_id(2)
        dma = pltpu.make_async_copy(
            src_ref.at[bi, :, pl.ds(ty * th, tih), pl.ds(tx * tw, tiw)], tile, sem
        )
        dma.start()
        dma.wait()

        def shift2(arr, dy, dx):
            if jnp.dtype(arr.dtype).itemsize < 4:
                return shift2(arr.astype(jnp.float32), dy, dx).astype(arr.dtype)
            r = arr
            ax = r.ndim
            if dx:
                r = pltpu.roll(r, (r.shape[ax - 1] - dx) % r.shape[ax - 1], axis=ax - 1)
            if dy:
                r = pltpu.roll(r, (r.shape[ax - 2] - dy) % r.shape[ax - 2], axis=ax - 2)
            return r

        t0 = tile[:, :, :]
        if u8:
            t3 = t0.astype(jnp.int32).astype(jnp.float32) * jnp.float32(
                1.0 / 255.0
            )
        else:
            t3 = t0.astype(jnp.float32)
        # index (m, n) = pixel (m, n) of the tile's interior origin (1, 1)
        e = shift2(t3, 1, 1)
        b = shift2(t3, 0, 1)
        hh = shift2(t3, 2, 1)
        d = shift2(t3, 1, 0)
        f = shift2(t3, 1, 2)

        grow = ty * th + jax.lax.broadcasted_iota(jnp.int32, (1,) + t3.shape[1:], 1)
        gcol = tx * tw + jax.lax.broadcasted_iota(jnp.int32, (1,) + t3.shape[1:], 2)
        bv = e if border == "clamp" else jnp.zeros_like(e)
        b = jnp.where(grow == 0, bv, b)
        hh = jnp.where(grow == h - 1, bv, hh)
        d = jnp.where(gcol == 0, bv, d)
        f = jnp.where(gcol == w - 1, bv, f)

        res = easu_math.rcas_resolve(b, d, e, f, hh, sharp, denoise=denoise, fast=True)
        if u8:
            out_ref[0, :, :, :] = epilogue_mod.encode_unorm8(res[:, :th, :tw])
        else:
            out_ref[0, :, :, :] = res[:, :th, :tw].astype(dt)

    out = pl.pallas_call(
        kernel,
        grid=(nb, ny, nx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, 3, th, tw), lambda bi, ty, tx: (bi, 0, ty, tx),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nb, 3, h, w), dt),
        scratch_shapes=[
            pltpu.VMEM((3, tih, tiw), dt),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=INTERPRET,
    )(src)
    return out.reshape(batch_dims + (3, h, w))
