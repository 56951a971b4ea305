"""Differentiable dispatch for the fused Pallas kernels.

Pallas kernels have no autodiff rules, so the kernel path wraps each
dispatch in a `jax.custom_vjp` whose forward is the fused kernel and whose
backward is the VJP of the *XLA twin* — the exact same math ``api.upscale``
runs with ``impl="xla"`` (which is differentiable end-to-end thanks to the
ideal-derivative JVPs on the bit-trick approximations, core/approx.py).
The two paths agree within the 1/255 fidelity budget (tested on hardware),
so the backward linearizes the function the kernel approximates; forward
values are untouched.

This makes ``fsr_tpu.upscale`` / ``sharpen`` trainable layers at kernel
speed on TPU: forward = one fused Pallas dispatch, backward = XLA autodiff.
The reference has no training story at all (shaders are forward-only); this
is a TPU-native capability extension, same algorithm (ffx_fsr1.h).

Gradient semantics worth knowing:
  * TEPD dithered quantization (epilogue.dither_bits) contains floor/round,
    whose gradient is zero almost everywhere — grads through a quantizing
    epilogue are legitimately zero (use dither_bits=0 while training).
  * Auxiliary operands (grain, frame, dither_page) get zero cotangents:
    they are noise/indices, not trainable inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _zero_cotangent(v):
    """Zero cotangent for an auxiliary primal (float0 for integer dtypes)."""
    if jnp.issubdtype(jnp.result_type(v), jnp.floating):
        return jnp.zeros_like(v)
    return np.zeros(np.shape(v), dtype=jax.dtypes.float0)


def is_traced(v) -> bool:
    """True when v must be passed as an operand (tracer or device array),
    False when it is a static Python/NumPy value safe to close over."""
    if isinstance(v, jax.Array):
        return True
    tracer = getattr(jax.core, "Tracer", None)  # jax.core layout varies
    return tracer is not None and isinstance(v, tracer)


def kernel_with_xla_vjp(kernel_fn, xla_fn, x, aux):
    """Run ``kernel_fn(x, aux)`` with backward = ``jax.vjp`` of ``xla_fn``.

    x: the differentiable image operand.
    aux: dict of auxiliary *traced* operands (grain/frame/dither_page when
      they are arrays); static config stays closed over in the two
      callables.  Aux receives zero cotangents.
    kernel_fn / xla_fn: ``(x, aux) -> out`` closures over static config
      only (never over tracers — traced values must ride in ``aux``).
    """

    @jax.custom_vjp
    def run(x, aux):
        return kernel_fn(x, aux)

    def fwd(x, aux):
        return kernel_fn(x, aux), (x, aux)

    def bwd(res, g):
        x, aux = res
        _, vjp = jax.vjp(lambda v: xla_fn(v, aux), x)
        (gx,) = vjp(g)
        return gx, {k: _zero_cotangent(v) for k, v in aux.items()}

    run.defvjp(fwd, bwd)
    return run(x, aux)
