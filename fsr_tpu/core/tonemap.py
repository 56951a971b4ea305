"""Tonemapping operators for the pre-EASU pass.

The sample tonemaps at render resolution before EASU
(sample/src/DX12/FSR_Tonemapping.hlsl:56-70: exposure * one of
{AMD/Lottes, DX11DSK, Reinhard, Uncharted2, ACES-film, passthrough}), then
TEPD-dithers when outputting HDR10.  The operator bodies live in the
Cauldron submodule (not vendored in the reference snapshot), so these are
the standard published forms of the same operators.  `tonemap()` mirrors the
sample's dispatch; `tonemap_pass()` is the full render-resolution pass
(tonemap + optional TEPD dither) matching FSRToneMapping::Draw.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from fsr_tpu.ops import extras

__all__ = [
    "amd_lottes", "dx11dsk", "reinhard", "uncharted2", "aces_film",
    "tonemap", "tonemap_pass", "TONEMAPPERS",
]


def _c(x, v):
    return jnp.asarray(v, x.dtype)


def _max3(c):
    return jnp.maximum(jnp.maximum(c[..., 0, :, :], c[..., 1, :, :]), c[..., 2, :, :])


def amd_lottes(color: jnp.ndarray) -> jnp.ndarray:
    """AMD/Timothy Lottes "max3"-based tonemapper (luma-preserving ratio)."""
    peak = _max3(color)[..., None, :, :]
    peak = jnp.maximum(peak, _c(color, 1.0 / 256.0))
    ratio = color / peak
    # Lottes curve on the peak channel.
    a, d, mid_in, mid_out, hdr_max = 1.6, 0.977, 0.18, 0.267, 16.0
    pow_a = jnp.power(peak, _c(color, a))
    pow_ad = jnp.power(peak, _c(color, a * d))
    hdr_a = hdr_max ** a
    hdr_ad = hdr_max ** (a * d)
    mid_a = mid_in ** a
    mid_ad = mid_in ** (a * d)
    b = (-mid_a + hdr_a * mid_out) / ((hdr_ad - mid_ad) * mid_out)
    c2 = (hdr_ad * mid_a - hdr_a * mid_ad * mid_out) / ((hdr_ad - mid_ad) * mid_out)
    mapped = pow_a / (pow_ad * _c(color, b) + _c(color, c2))
    return jnp.clip(ratio * mapped, 0.0, 1.0)


def dx11dsk(color: jnp.ndarray) -> jnp.ndarray:
    """DirectX 11 SDK sample tonemapper: x / (x + 1) applied per channel."""
    return jnp.clip(color / (color + _c(color, 1.0)), 0.0, 1.0)


def reinhard(color: jnp.ndarray) -> jnp.ndarray:
    """Luma-based Reinhard."""
    lum = (
        color[..., 0, :, :] * _c(color, 0.2126)
        + color[..., 1, :, :] * _c(color, 0.7152)
        + color[..., 2, :, :] * _c(color, 0.0722)
    )[..., None, :, :]
    scale = (lum / (_c(color, 1.0) + lum)) / jnp.maximum(lum, _c(color, 1e-6))
    return jnp.clip(color * scale, 0.0, 1.0)


def _uncharted2_curve(x):
    a, b, c, d, e, f = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
    return ((x * (a * x + c * b) + d * e) / (x * (a * x + b) + d * f)) - e / f


def uncharted2(color: jnp.ndarray) -> jnp.ndarray:
    """Hable's Uncharted 2 filmic operator (W = 11.2)."""
    exposure_bias = _c(color, 2.0)
    cur = _uncharted2_curve(color * exposure_bias)
    white = _uncharted2_curve(jnp.asarray(11.2, color.dtype))
    return jnp.clip(cur / white, 0.0, 1.0)


def aces_film(color: jnp.ndarray) -> jnp.ndarray:
    """Narkowicz's ACES filmic approximation."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip(
        (color * (_c(color, a) * color + _c(color, b)))
        / (color * (_c(color, c) * color + _c(color, d)) + _c(color, e)),
        0.0,
        1.0,
    )


TONEMAPPERS = {
    0: amd_lottes,
    1: dx11dsk,
    2: reinhard,
    3: uncharted2,
    4: aces_film,
    5: lambda c: c,  # passthrough
}

_NAMES = {"amd": 0, "dx11dsk": 1, "reinhard": 2, "uncharted2": 3, "aces": 4, "none": 5}


def tonemap(color: jnp.ndarray, exposure: float = 1.0, tonemapper="amd") -> jnp.ndarray:
    """Exposure + operator dispatch (FSR_Tonemapping.hlsl:56-70).

    color: (..., 3, H, W) linear HDR.  tonemapper: index 0-5 or name.
    """
    idx = _NAMES.get(tonemapper, tonemapper) if isinstance(tonemapper, str) else int(tonemapper)
    if idx not in TONEMAPPERS:
        raise ValueError(f"unknown tonemapper {tonemapper!r}")
    return TONEMAPPERS[idx](color * jnp.asarray(exposure, color.dtype))


def tonemap_pass(
    color: jnp.ndarray,
    exposure: float = 1.0,
    tonemapper="amd",
    hdr10_dither_frame: Optional[int] = None,
) -> jnp.ndarray:
    """Full render-resolution tonemap pass (FSRToneMapping::Draw analog).

    When hdr10_dither_frame is given, applies the TEPD 10-bit temporal
    energy-preserving dither after tonemapping (the sample's HDR output
    path, FSR_Tonemapping.hlsl:86-88, with the golden-ratio dither standing
    in for the blue-noise texture the sample loads from Cauldron media).
    """
    out = tonemap(color, exposure, tonemapper)
    if hdr10_dither_frame is not None:
        dit = extras.tepd_dither(out.shape[-2:], hdr10_dither_frame)
        out = extras.tepd_quantize(out.astype(jnp.float32), dit, bits=10)
    return out
