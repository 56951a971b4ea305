"""SRTM / LFGA / TEPD auxiliary passes (pure XLA, dtype-generic).

References: FsrSrtm* (/root/reference/ffx-fsr/ffx_fsr1.h:1043-1055),
FsrLfga* (ffx_fsr1.h:1014-1023), FsrTepdDit/C8/C10 (ffx_fsr1.h:1086-1121).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fsr_tpu.core import approx

__all__ = [
    "srtm",
    "srtm_inv",
    "lfga",
    "tepd_dither",
    "texture_dither",
    "tepd_quantize",
]


def _max3(c):
    return jnp.maximum(jnp.maximum(c[..., 0, :, :], c[..., 1, :, :]), c[..., 2, :, :])


@jax.jit
def srtm(c: jnp.ndarray) -> jnp.ndarray:
    """Reversible tonemap: HDR {0..fp16max} -> {0..1}; c *= rcp(max3(c)+1)."""
    dt = c.dtype
    m = _max3(c)
    return c * approx.rcp(m + jnp.asarray(1.0, dt))[..., None, :, :]


@jax.jit
def srtm_inv(c: jnp.ndarray) -> jnp.ndarray:
    """Inverse tonemap: {0..1} -> {0..32768}; guard at c==1 (ffx_fsr1.h:1044)."""
    dt = c.dtype
    m = _max3(c)
    den = jnp.maximum(jnp.asarray(1.0 / 32768.0, dt), jnp.asarray(1.0, dt) - m)
    return c * approx.rcp(den)[..., None, :, :]


@jax.jit
def lfga(c: jnp.ndarray, grain: jnp.ndarray, amount) -> jnp.ndarray:
    """Film grain limited by distance to signal limits (energy preserving).

    grain: same shape as c (3-channel, {-0.5..0.5}); amount: scalar {0..1}.
    """
    dt = c.dtype
    a = jnp.asarray(amount, dt)
    return c + (grain.astype(dt) * a) * jnp.minimum(jnp.asarray(1.0, dt) - c, c)


@functools.partial(jax.jit, static_argnames=("shape",))
def tepd_dither(shape, frame, origin=(0, 0)) -> jnp.ndarray:
    """Golden-ratio ordered dither positions, {0..<1} (FsrTepdDitF).

    shape: (H, W); frame: temporal frame index (traced or static).
    origin: (row0, col0) global coordinate of the top-left pixel (traced or
    static) — spatially sharded execution passes each shard's offset so the
    hash matches the unsharded positions.
    Float32 only — the reference notes only 32-bit has enough precision
    (ffx_fsr1.h:1084).
    """
    h, w = shape
    r0, c0 = origin
    f32 = jnp.float32
    x = (
        jnp.arange(w, dtype=jnp.uint32)
        + jnp.asarray(c0, jnp.uint32)
        + jnp.uint32(frame)
    ).astype(f32)[None, :]
    y = (jnp.arange(h, dtype=jnp.uint32) + jnp.asarray(r0, jnp.uint32)).astype(
        f32
    )[:, None]
    a = np.float32((1.0 + np.sqrt(np.float64(5.0))) / 2.0)
    b = np.float32(1.0 / 3.69)
    v = x * a + (y * b)
    return v - jnp.floor(v)


@functools.partial(jax.jit, static_argnames=("shape",))
def texture_dither(shape, frame, texture: jnp.ndarray, origin=(0, 0)) -> jnp.ndarray:
    """Dither positions from a user texture (the sample's temporal blue
    noise: FSR_Tonemapping.hlsl:86-88 samples a 128x128x64 stack page-indexed
    by frame; generate one with fsr_tpu.utils.noise.temporal_blue_noise).

    shape: output (H, W); frame: temporal index (traced or static);
    texture: (pages, th, tw) or (th, tw) with values in [0, 1).  The page is
    selected by frame mod pages and tiled over the output.
    origin: (row0, col0) global coordinate of the top-left pixel (traced or
    static) for spatially sharded execution — the periodic tiling shifts so
    shard-local positions match the unsharded ones.
    """
    h, w = shape
    tex = jnp.asarray(texture)
    if tex.ndim == 2:
        tex = tex[None]
    pages, th, tw = tex.shape
    page = jax.lax.dynamic_index_in_dim(
        tex, jnp.asarray(frame, jnp.int32) % pages, axis=0, keepdims=False
    )
    r0, c0 = origin
    static0 = isinstance(r0, int) and isinstance(c0, int)
    if not (static0 and r0 == 0 and c0 == 0):
        page = jnp.roll(
            page,
            (-jnp.asarray(r0, jnp.int32), -jnp.asarray(c0, jnp.int32)),
            axis=(0, 1),
        )
    reps = (-(-h // th), -(-w // tw))
    return jnp.tile(page, reps)[:h, :w]


@functools.partial(jax.jit, static_argnames=("bits",))
def tepd_quantize(c: jnp.ndarray, dit: jnp.ndarray, bits: int = 10) -> jnp.ndarray:
    """Temporal energy-preserving dithered linear -> gamma-2.0 quantize.

    c: (..., 3, H, W) in {0..1}; dit: (H, W) from tepd_dither; bits: 8 or 10.
    Chooses the *linear*-nearest quantization step (not perceptual-nearest) so
    that temporally averaged dither preserves energy (FsrTepdC8F/C10F).
    """
    if bits not in (8, 10):
        raise ValueError("TEPD supports 8- or 10-bit output")
    dt = c.dtype
    steps = jnp.asarray(255.0 if bits == 8 else 1023.0, dt)
    inv = jnp.asarray(1.0, dt) / steps
    n = jnp.sqrt(c)
    n = jnp.floor(n * steps) * inv
    a = n * n
    b = n + inv
    b = b * b
    if dt in (jnp.float32, jnp.float16):
        r = (c - b) * approx.prx_med_rcp(a - b)
    else:
        r = (c - b) * approx.rcp(a - b)
    gt = (dit[..., None, :, :] - r > jnp.asarray(0.0, dt)).astype(dt)
    return approx.sat(n + gt * inv)
