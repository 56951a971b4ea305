"""Color transfer functions (linear <-> encoded), JAX, dtype-generic.

Rebuild of the ffx_a.h color-conversion block
(/root/reference/ffx-fsr/ffx_a.h:2117-2292): Rec.709, sRGB, PQ, generic
gamma, gamma-2.0 ("two") and gamma-3.0 ("three").  Naming follows the
reference's convention: `to_*` is linear -> encoded, `from_*` is
encoded -> linear.  The piecewise sRGB/709 curves keep the spec constants
(including the documented double-intersection quirk — see the reference's
"KEEPING TO SPEC" note) and are branch-free via select.

Also includes the fast PQ approximations (ffx_a.h:1865-1914) used for cheap
HDR10 output chains.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = [
    "to_709", "from_709",
    "to_srgb", "from_srgb",
    "to_pq", "from_pq",
    "to_gamma", "from_gamma",
    "to_two", "from_two",
    "to_three", "from_three",
    "prx_pq_to_gamma2", "prx_pq_to_linear",
    "prx_lo_gamma2_to_pq", "prx_med_gamma2_to_pq",
    "prx_lo_linear_to_pq", "prx_med_linear_to_pq",
]


def _c(x, v):
    return jnp.asarray(v, x.dtype)


def to_709(c: jnp.ndarray) -> jnp.ndarray:
    """Linear -> Rec.709 (ATo709F* analog; spec piecewise).

    Note: the reference composes this branch-free with a clamp trick that
    introduces a small step near the segment transition (acknowledged in its
    "KEEPING TO SPEC" comment); on TPU a select costs nothing, so we use the
    exact spec piecewise form.
    """
    lin = c * _c(c, 4.5)
    cur = jnp.power(c, _c(c, 0.45)) * _c(c, 1.099) + _c(c, -0.099)
    return jnp.where(c < _c(c, 0.018), lin, cur)


def from_709(c: jnp.ndarray) -> jnp.ndarray:
    """Rec.709 -> linear (AFrom709F* analog; spec threshold 0.081 on the
    encoded value — the reference compares against 0.081/4.5, a latent
    misclassification of the 0.018..0.081 band)."""
    lin = c * _c(c, 1.0 / 4.5)
    cur = jnp.power(c * _c(c, 1.0 / 1.099) + _c(c, 0.099 / 1.099), _c(c, 1.0 / 0.45))
    return jnp.where(c < _c(c, 0.081), lin, cur)


def to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    """Linear -> sRGB (AToSrgbF* analog; spec piecewise, see to_709 note)."""
    lin = c * _c(c, 12.92)
    cur = jnp.power(c, _c(c, 1.0 / 2.4)) * _c(c, 1.055) + _c(c, -0.055)
    return jnp.where(c < _c(c, 0.0031308), lin, cur)


def from_srgb(c: jnp.ndarray) -> jnp.ndarray:
    """sRGB -> linear (spec threshold 0.04045 on the encoded value)."""
    lin = c * _c(c, 1.0 / 12.92)
    cur = jnp.power(c * _c(c, 1.0 / 1.055) + _c(c, 0.055 / 1.055), _c(c, 2.4))
    return jnp.where(c < _c(c, 0.04045), lin, cur)


def to_pq(x: jnp.ndarray) -> jnp.ndarray:
    """Linear -> PQ/ST.2084 (AToPqF1, ffx_a.h:2178); 1.0 == 10000 cd/m^2."""
    p = jnp.power(x, _c(x, 0.159302))
    return jnp.power(
        (_c(x, 0.835938) + _c(x, 18.8516) * p) / (_c(x, 1.0) + _c(x, 18.6875) * p),
        _c(x, 78.8438),
    )


def from_pq(x: jnp.ndarray) -> jnp.ndarray:
    """PQ -> linear (AFromPqF1, ffx_a.h:2213)."""
    p = jnp.power(x, _c(x, 0.0126833))
    num = jnp.clip(p - _c(x, 0.835938), _c(x, 0.0), None)
    return jnp.power(num / (_c(x, 18.8516) - _c(x, 18.6875) * p), _c(x, 6.27739))


def to_gamma(c: jnp.ndarray, rcp_x: float) -> jnp.ndarray:
    """Linear -> gamma; rcp_x = 1/gamma (AToGammaF*, ffx_a.h:2175)."""
    return jnp.power(c, _c(c, rcp_x))


def from_gamma(c: jnp.ndarray, x: float) -> jnp.ndarray:
    return jnp.power(c, _c(c, x))


def to_two(c: jnp.ndarray) -> jnp.ndarray:
    """Linear -> gamma 2.0: sqrt (the FSR chain's working encoding)."""
    return jnp.sqrt(c)


def from_two(c: jnp.ndarray) -> jnp.ndarray:
    return c * c


def to_three(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.power(c, _c(c, 1.0 / 3.0))


def from_three(c: jnp.ndarray) -> jnp.ndarray:
    return c * c * c


# --- fast PQ approximations (ffx_a.h:1865-1914) ------------------------------


def _quart(a):
    a = a * a
    return a * a


def _oct(a):
    a = a * a
    a = a * a
    return a * a


def prx_pq_to_gamma2(a: jnp.ndarray) -> jnp.ndarray:
    return _quart(a)


def prx_pq_to_linear(a: jnp.ndarray) -> jnp.ndarray:
    return _oct(a)


def _bits_shift_add(a, shift, magic):
    u = lax.bitcast_convert_type(a.astype(jnp.float32), jnp.uint32)
    return lax.bitcast_convert_type(
        (u >> jnp.uint32(shift)) + jnp.uint32(magic), jnp.float32
    ).astype(a.dtype)


def prx_lo_gamma2_to_pq(a: jnp.ndarray) -> jnp.ndarray:
    return _bits_shift_add(a, 2, 0x2F9A4E46)


def prx_med_gamma2_to_pq(a: jnp.ndarray) -> jnp.ndarray:
    b = _bits_shift_add(a, 2, 0x2F9A4E46)
    b4 = _quart(b)
    return b - b * (b4 - a) / (_c(a, 4.0) * b4)


def prx_lo_linear_to_pq(a: jnp.ndarray) -> jnp.ndarray:
    return _bits_shift_add(a, 3, 0x378D8723)


def prx_med_linear_to_pq(a: jnp.ndarray) -> jnp.ndarray:
    b = _bits_shift_add(a, 3, 0x378D8723)
    b8 = _oct(b)
    return b - b * (b8 - a) / (_c(a, 8.0) * b8)
