"""Bit-trick fast approximations (JAX), mirroring ffx_a.h:1786-1860.

These are load-bearing for fidelity parity: EASU uses APrxLoRcp/APrxLoRsq in
its direction normalization (ffx_fsr1.h:392,400,409) and RCAS uses APrxMedRcp
in its resolve (ffx_fsr1.h:765), so the TPU kernels evaluate the same bit
tricks (uint32/uint16 casts on the VPU) rather than native division.  All
functions are dtype-polymorphic over float32/float16; bfloat16 inputs fall
back to rounding through float32 tricks (there is no reference bf16 path).

Differentiability: the bit tricks run through integer bitcasts, which have
no derivative, so each carries a `jax.custom_jvp` whose tangent is the
derivative of the *ideal* function the trick approximates (d(1/a) = -1/a^2,
etc.).  Forward values are untouched (the primal is the exact bit trick;
custom_jvp_call inlines in Pallas/Mosaic lowering), and `jax.grad` flows
through the whole XLA upscale path — FSR as a differentiable layer in
learned (super-resolution / perceptual-loss) training pipelines.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "prx_lo_rcp",
    "prx_med_rcp",
    "prx_lo_rsq",
    "prx_lo_sqrt",
    "rcp",
    "rcp_fast",
    "sat",
    "p_sin",
    "p_cos",
    "fis_to_u32",
    "fis_from_u32",
]


def _dispatch(x):
    if x.dtype == jnp.float32:
        return jnp.uint32, jnp.float32
    if x.dtype == jnp.float16:
        return jnp.uint16, jnp.float16
    raise TypeError(f"bit-trick approximations need float32/float16, got {x.dtype}")


_MAGIC = {
    # dtype-kind: (lo_rcp, med_rcp, lo_rsq, lo_sqrt)
    jnp.dtype(jnp.float32): (0x7EF07EBB, 0x7EF19FFF, 0x5F347D74, 0x1FBC4639),
    jnp.dtype(jnp.float16): (0x7784, 0x778D, 0x59A3, 0x1DE2),
}


def _bits(x):
    ut, _ = _dispatch(x)
    return lax.bitcast_convert_type(x, ut)


def _float(u, ft):
    return lax.bitcast_convert_type(u, ft)


@jax.custom_jvp
def prx_lo_rcp(a: jnp.ndarray) -> jnp.ndarray:
    """APrxLoRcp: 1-op reciprocal estimate (positive inputs)."""
    ut, ft = _dispatch(a)
    magic = _MAGIC[a.dtype][0]
    return _float(ut(magic) - _bits(a), ft)


def _finite(m):
    """Zero non-finite gradient multipliers.

    The forward paths guard their degenerate inputs (EASU's dir zero-protect,
    RCAS's NaN-drop max), so the cotangent arriving at a degenerate point is
    already zero — but reverse mode still evaluates `0 * inf`, which is NaN.
    Zeroing the multiplier gives the conventional "flat at the guard" gradient.
    """
    return jnp.where(jnp.isfinite(m), m, jnp.zeros_like(m))


@prx_lo_rcp.defjvp
def _prx_lo_rcp_jvp(primals, tangents):
    (a,), (t,) = primals, tangents
    return prx_lo_rcp(a), t * _finite(-1.0 / (a * a))


@jax.custom_jvp
def prx_med_rcp(a: jnp.ndarray) -> jnp.ndarray:
    """APrxMedRcp: reciprocal estimate + one Newton-Raphson step."""
    ut, ft = _dispatch(a)
    magic = _MAGIC[a.dtype][1]
    b = _float(ut(magic) - _bits(a), ft)
    return b * (-b * a + ft(2.0))


@prx_med_rcp.defjvp
def _prx_med_rcp_jvp(primals, tangents):
    (a,), (t,) = primals, tangents
    return prx_med_rcp(a), t * _finite(-1.0 / (a * a))


@jax.custom_jvp
def prx_lo_rsq(a: jnp.ndarray) -> jnp.ndarray:
    """APrxLoRsq: 2-op rsqrt estimate (positive inputs)."""
    ut, ft = _dispatch(a)
    magic = _MAGIC[a.dtype][2]
    return _float(ut(magic) - (_bits(a) >> ut(1)), ft)


@prx_lo_rsq.defjvp
def _prx_lo_rsq_jvp(primals, tangents):
    (a,), (t,) = primals, tangents
    half = jnp.asarray(0.5, a.dtype)
    return prx_lo_rsq(a), t * _finite(-half * lax.rsqrt(a) / a)


@jax.custom_jvp
def prx_lo_sqrt(a: jnp.ndarray) -> jnp.ndarray:
    """APrxLoSqrt: 2-op sqrt estimate (positive inputs)."""
    ut, ft = _dispatch(a)
    magic = _MAGIC[a.dtype][3]
    return _float((_bits(a) >> ut(1)) + ut(magic), ft)


@prx_lo_sqrt.defjvp
def _prx_lo_sqrt_jvp(primals, tangents):
    (a,), (t,) = primals, tangents
    half = jnp.asarray(0.5, a.dtype)
    return prx_lo_sqrt(a), t * _finite(half * lax.rsqrt(a))


@jax.custom_jvp
def rcp(a: jnp.ndarray) -> jnp.ndarray:
    """High-precision reciprocal (ARcp semantics for the oracle contract).

    Carries the same finite-guarded derivative as the approximations: the
    RCAS limiters deliberately evaluate `min(...) * rcp(0) = NaN` and drop
    it via HLSL max semantics (easu_math.py), so the multiplier must not
    turn the dropped branch's zero cotangent into `0 * inf`.
    """
    return jnp.asarray(1.0, a.dtype) / a


@rcp.defjvp
def _rcp_jvp(primals, tangents):
    (a,), (t,) = primals, tangents
    return rcp(a), t * _finite(-1.0 / (a * a))


def rcp_fast(a: jnp.ndarray) -> jnp.ndarray:
    """Hardware-speed high-precision reciprocal for Pallas kernels.

    The GPU reference's ARcp* is a fast hardware rcp instruction; TPU has no
    vector divide, and XLA's exact division is many ops.  pl.reciprocal
    (approx) + one Newton-Raphson step reaches ~1 ulp for normal inputs at
    ~3 VPU ops, matching the "high precision RCP" requirement of the RCAS
    limiters (ffx_fsr1.h:749) within the 1/255 budget.  Falls back to exact
    division outside Pallas traces (e.g. interpret mode on CPU).
    """
    try:
        from jax.experimental import pallas as pl

        a32 = a.astype(jnp.float32)
        b = pl.reciprocal(a32, approx=True)
        b = b * (jnp.float32(2.0) - a32 * b)  # one Newton-Raphson step
        return b.astype(a.dtype)
    except Exception:
        return rcp(a)


def sat(a: jnp.ndarray) -> jnp.ndarray:
    """ASat: clamp to [0, 1]."""
    return jnp.clip(a, jnp.asarray(0.0, a.dtype), jnp.asarray(1.0, a.dtype))


# --- Parabolic sin/cos (ffx_a.h:1919-1943) ----------------------------------
# Input {-1..1} represents {0..2pi}; output {-1/4..1/4} represents {-1..1}.


def p_sin(x: jnp.ndarray) -> jnp.ndarray:
    """APSin: one-FMA parabolic sine approximation."""
    return x * jnp.abs(x) - x


def p_cos(x: jnp.ndarray) -> jnp.ndarray:
    """APCos via phase-shifted APSin."""
    half = jnp.asarray(0.5, x.dtype)
    x = x * half + jnp.asarray(0.75, x.dtype)
    x = x - jnp.floor(x)
    x = x * jnp.asarray(2.0, x.dtype) - jnp.asarray(1.0, x.dtype)
    return p_sin(x)


# --- [FIS] float-integer-sortable (ffx_a.h:1533-1559) ------------------------
# Order-preserving float <-> uint mapping (atomic-max / sort tricks).


def fis_to_u32(x: jnp.ndarray) -> jnp.ndarray:
    u = lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    mask = jnp.where(
        (u >> jnp.uint32(31)) > 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0x80000000)
    )
    return u ^ mask


def fis_from_u32(u: jnp.ndarray) -> jnp.ndarray:
    mask = jnp.where(
        (u >> jnp.uint32(31)) > 0, jnp.uint32(0x80000000), jnp.uint32(0xFFFFFFFF)
    )
    return lax.bitcast_convert_type(u ^ mask, jnp.float32)
