"""Pure-XLA EASU (works on any JAX backend, any scale factor).

This is the portable execution path: tap planes are materialized with XLA
gathers from separable per-axis index vectors (the output->input mapping of
FsrEasuCon is separable: pp.x depends only on the output column, pp.y only on
the output row), then the shared filter math (fsr_tpu.core.easu_math) runs on
them.  The Pallas kernels in fsr_tpu.kernels are the performance path; this
module is the correctness/portability baseline and the fallback for scale
factors the kernels do not specialize.

Reference: FsrEasuF (/root/reference/ffx-fsr/ffx_fsr1.h:315-437).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fsr_tpu.core import easu_math
from fsr_tpu.core.constants import EasuConstants

__all__ = ["easu", "easu_coords", "bilinear"]


def easu_coords(con: EasuConstants, out_size: Tuple[int, int]):
    """Static per-axis coordinate vectors: ('f' texel index, subpixel frac).

    Computed with numpy float32 at trace time — identical arithmetic to the
    oracle (scalar.py:_easu_coords) so tap indices can never disagree.
    """
    hout, wout = out_size
    sx, sy = con.scale
    ox, oy = con.offset
    ppx = np.arange(wout, dtype=np.float32) * sx + ox
    ppy = np.arange(hout, dtype=np.float32) * sy + oy
    fx = np.floor(ppx)
    fy = np.floor(ppy)
    px = (ppx - fx).astype(np.float32)
    py = (ppy - fy).astype(np.float32)
    return fx.astype(np.int32), fy.astype(np.int32), px, py


@functools.partial(
    jax.jit, static_argnames=("out_size", "con", "compute_dtype", "precision")
)
def easu(
    src: jnp.ndarray,
    out_size: Tuple[int, int],
    con: EasuConstants,
    compute_dtype=jnp.float32,
    precision: str = "mixed",
    rows=None,
) -> jnp.ndarray:
    """EASU upscale.

    src: (..., 3, Hin, Win) planar image, values in [0, 1].
    out_size: (Hout, Wout).
    compute_dtype: float32 (FsrEasuF parity), float16, or bfloat16.
    precision: "mixed" (default) keeps the direction/length estimation in
      float32 under low-precision compute (stays within the 1/255 budget vs
      the fp32 oracle even on noise); "strict" runs everything in
      compute_dtype, emulating FsrEasuH when compute_dtype=float16.
    rows: optional (row_idx, py_rows) override of the vertical coordinate
      plan — traced int32/float32 arrays of length Hout giving each output
      row's base source row (local index into `src`) and subpixel fraction.
      Used by spatially sharded execution (parallel/spatial.py), where the
      per-shard values must come from the GLOBAL host-exact mapping rather
      than be recomputed from shard-local constants (f32 coordinate math
      would drift by ulps across shards).  Tap rows still clamp into src
      (global-edge shards carry edge-replicated halo rows, so the local
      clamp reproduces the sampler's CLAMP rule bit-for-bit).

    Returns (..., 3, Hout, Wout) in compute_dtype.
    """
    hin, win = src.shape[-2:]
    col, row, px, py = easu_coords(con, out_size)
    dt = jnp.dtype(compute_dtype)
    dir_dt = dt if precision == "strict" else jnp.float32
    src = src.astype(dt)
    if rows is not None:
        row_base, py_rows = rows

    taps = {}
    for name, (dx, dy) in easu_math.TAP_OFFSETS.items():
        if rows is None:
            r = jnp.asarray(np.clip(row + dy, 0, hin - 1))
        else:
            r = jnp.clip(row_base.astype(jnp.int32) + dy, 0, hin - 1)
        c = jnp.asarray(np.clip(col + dx, 0, win - 1))
        plane = src[..., r[:, None], c[None, :]]  # XLA gather
        taps[name] = tuple(plane[..., i, :, :] for i in range(plane.shape[-3]))

    ppx = jnp.asarray(px, jnp.float32)[None, :]
    if rows is None:
        ppy = jnp.asarray(py, jnp.float32)[:, None]
    else:
        ppy = py_rows.astype(jnp.float32)[:, None]
    out = easu_math.easu_resolve(taps, ppx, ppy, dtype=dt, dir_dtype=dir_dt)
    return jnp.stack(out, axis=-3)


@functools.partial(jax.jit, static_argnames=("out_size", "con"))
def bilinear(src: jnp.ndarray, out_size: Tuple[int, int], con: EasuConstants,
             rows=None) -> jnp.ndarray:
    """Bilinear fallback using the same coordinate mapping.

    Mirrors the sample's SAMPLE_BILINEAR mode (sample/src/DX12/FSR_Pass.hlsl:70-73),
    which lerps with the con0-derived position.
    rows: optional (row_idx, py_rows) vertical override — same contract as
    `easu(rows=...)`, for spatially sharded execution.
    """
    hin, win = src.shape[-2:]
    col, row, px, py = easu_coords(con, out_size)
    c0 = jnp.asarray(np.clip(col, 0, win - 1))
    c1 = jnp.asarray(np.clip(col + 1, 0, win - 1))
    if rows is None:
        r0 = jnp.asarray(np.clip(row, 0, hin - 1))
        r1 = jnp.asarray(np.clip(row + 1, 0, hin - 1))
        pyb = jnp.asarray(py)[:, None]
    else:
        row_base, py_rows = rows
        r0 = jnp.clip(row_base.astype(jnp.int32), 0, hin - 1)
        r1 = jnp.clip(row_base.astype(jnp.int32) + 1, 0, hin - 1)
        pyb = py_rows.astype(jnp.float32)[:, None]
    pxb = jnp.asarray(px)[None, :]
    tl = src[..., r0[:, None], c0[None, :]]
    tr = src[..., r0[:, None], c1[None, :]]
    bl = src[..., r1[:, None], c0[None, :]]
    br = src[..., r1[:, None], c1[None, :]]
    top = tl + (tr - tl) * pxb
    bot = bl + (br - bl) * pxb
    return top + (bot - top) * pyb
