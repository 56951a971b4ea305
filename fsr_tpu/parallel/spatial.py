"""Spatial (row-sharded) upscaling with ICI halo exchange.

One frame is split along image rows across the mesh; each device upscales
its strip after exchanging a small row halo with its neighbors via
`jax.lax.ppermute` (the TPU analog of the reference's texture-cache halo
reads at workgroup borders, SURVEY.md section 5 "long-context").

Supported for scale factors with exact phase structure (the same condition
as the fused kernel: the f32 coordinate mapping must advance one source row
per qy output rows), so that every shard's coordinate arithmetic is a
bit-exact shifted copy of the global mapping.  2x/4x presets qualify; other
ratios use batch sharding instead.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from fsr_tpu.core import easu_math
from fsr_tpu.core.constants import EasuConstants, RcasConstants
from fsr_tpu.kernels import fused
from fsr_tpu.ops import easu as easu_ops
from fsr_tpu.ops.rcas import shift_clamped

__all__ = ["upscale_spatial_sharded", "spatial_shardable"]

_HALO = 4  # input rows exchanged per side; covers EASU taps + RCAS halo


def _kernel_path(mesh: "Mesh") -> bool:
    """True when shards should run the fused Pallas kernel (real TPU mesh)."""
    return mesh.devices.flat[0].platform == "tpu" and not fused.INTERPRET


def spatial_shardable(in_size, out_size, n_shards: int) -> bool:
    """Check the exact-phase + divisibility conditions for row sharding."""
    hin, win = in_size
    hout, wout = out_size
    if hin % n_shards or hout % n_shards:
        return False
    con = EasuConstants.create((win, hin), None, (wout, hout))
    st = fused._phase_structure(con, (hout, wout))
    if st is None:
        return False
    qy = st[0]
    hl_out = hout // n_shards
    # Each shard must start on phase 0 and advance by exactly its local
    # input height, so every shard's coordinate pattern is identical.
    return hl_out % qy == 0 and hl_out // qy == hin // n_shards


def _local_constants(con: EasuConstants, sy: float, halo: int) -> EasuConstants:
    """Shard-local constants: global mapping shifted into the halo'd block.

    Every shard k maps local output row y to local input row
    y*sy + oy + halo (the k-dependent term k*Hl_in cancels exactly for
    exact-binary scales), and we evaluate one extra output row on each side
    (offset -sy) as the RCAS halo.
    """
    return EasuConstants(
        viewport=con.viewport,
        input_size=con.input_size,
        output_size=con.output_size,
        input_offset=(0.0, float(halo) - float(sy)),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "out_size", "mesh", "axis", "batch_axis", "sharpness", "apply_rcas",
        "denoise", "compute_dtype",
    ),
)
def upscale_spatial_sharded(
    image: jnp.ndarray,
    out_size: Tuple[int, int],
    mesh: Mesh,
    axis: str = "sp",
    batch_axis: Optional[str] = None,
    sharpness: float = 0.25,
    apply_rcas: bool = True,
    denoise: bool = False,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Upscale (..., 3, H, W) with H row-sharded across `mesh[axis]`.

    batch_axis: optionally also shard the leading batch dimension across a
    second mesh axis (dp x sp execution in one shard_map).
    """
    hout, wout = out_size
    hin, win = image.shape[-2:]
    n = mesh.shape[axis]
    if not spatial_shardable((hin, win), (hout, wout), n):
        raise ValueError(
            f"spatial sharding needs exact phase structure and divisibility "
            f"(in={hin}x{win} out={hout}x{wout} shards={n})"
        )
    con = EasuConstants.create((win, hin), None, (wout, hout))
    sy = float(con.scale[1])
    rcon = RcasConstants(sharpness)
    con_loc = _local_constants(con, sy, _HALO)
    hl_out = hout // n
    dt = jnp.dtype(compute_dtype)

    def local_fn(block):
        # block: (..., 3, Hl, W) local strip
        idx = lax.axis_index(axis)
        up = lax.ppermute(
            block[..., -_HALO:, :], axis, [(i, (i + 1) % n) for i in range(n)]
        )
        down = lax.ppermute(
            block[..., :_HALO, :], axis, [(i, (i - 1) % n) for i in range(n)]
        )
        # Wrap-around halos at the global top/bottom are invalid; replace
        # with edge replication (the sampler's CLAMP behavior).
        top_edge = jnp.repeat(block[..., :1, :], _HALO, axis=-2)
        bot_edge = jnp.repeat(block[..., -1:, :], _HALO, axis=-2)
        up = jnp.where(idx == 0, top_edge, up)
        down = jnp.where(idx == n - 1, bot_edge, down)
        padded = jnp.concatenate([up, block, down], axis=-2)

        # On TPU, run the fused Pallas kernel per shard so multi-chip
        # throughput scales the kernel-path number (the RCAS border clamp
        # uses global row coordinates via row_offset, so edge shards stay
        # bit-exact); the XLA path below serves CPU meshes and f16.
        if _kernel_path(mesh) and fused.supported(
            padded.shape, (hl_out + 2, wout), con_loc, dt
        ):
            out = fused.upscale_fused(
                padded, (hl_out + 2, wout), con_loc, rcon,
                apply_rcas=apply_rcas, denoise=denoise, compute_dtype=dt,
                row_offset=idx * hl_out - 1, global_rows=hout,
            )
            return out[..., 1:-1, :]

        # EASU over local rows [-1, hl_out+1) (one output row of RCAS halo).
        easu_out = easu_ops.easu(
            padded, (hl_out + 2, wout), con_loc, compute_dtype=dt
        )
        if not apply_rcas:
            return easu_out[..., 1:-1, :]

        b = easu_out[..., 0:hl_out, :]
        e = easu_out[..., 1 : 1 + hl_out, :]
        h = easu_out[..., 2 : 2 + hl_out, :]
        d = shift_clamped(e, 0, -1)
        f = shift_clamped(e, 0, 1)
        # Global top/bottom rows clamp their vertical taps (image border).
        grow = idx * hl_out + jnp.arange(hl_out)[:, None]
        b = jnp.where(grow == 0, e, b)
        h = jnp.where(grow == hout - 1, e, h)

        def split(p):
            return tuple(p[..., ch, :, :] for ch in range(3))

        sharp = rcon.sharpness_f16 if dt == jnp.float16 else rcon.sharpness
        res = easu_math.rcas_resolve(
            split(b), split(d), split(e), split(f), split(h), sharp, denoise=denoise
        )
        return jnp.stack(res, axis=-3)

    nb = image.ndim - 3
    lead = (batch_axis,) + (None,) * (nb - 1) if (batch_axis and nb) else (None,) * nb
    spec = P(*lead, None, axis, None)
    return shard_map(
        local_fn, mesh=mesh, in_specs=spec, out_specs=spec, check_rep=False
    )(image)
