"""Spatial (row-sharded) upscaling with ICI halo exchange.

One frame is split along image rows across the mesh; each device upscales
its strip after exchanging a small row halo with its neighbors via
`jax.lax.ppermute` (the TPU analog of the reference's texture-cache halo
reads at workgroup borders, SURVEY.md section 5 "long-context").  Matches
the reference's ratio-agnostic tiling (FSR_Filter.cpp:113-115 dispatches
ceil(display/16)^2 workgroups at every quality preset).

Two regimes, both bit-exact vs the unsharded paths:

- **Exact-phase ratios** (2x/4x): every shard's coordinate mapping is a
  shifted copy of the global one (the k-dependent term cancels in f32), so
  shards run the phase-decomposed fused kernel with shard-local constants.
- **Arbitrary ratios** (1.3x/1.5x/1.7x quality presets, DRS): the
  coordinate mapping does NOT shift cleanly across shards (f32 drift), so
  the row plan is built on the host from the GLOBAL mapping
  (kernels/easu_gather.build_shard_plans) and fed to each shard as sharded
  operands — the gather kernel consumes prebuilt plans directly; the XLA
  fallback takes the same per-row (source row, fraction) vectors via
  `ops.easu(rows=...)`.  Shard seams are exact because every shard uses
  the same host floats the unsharded path would.
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
from fsr_tpu.kernels import easu_gather as easu_gather_mod
from fsr_tpu.kernels import fused
from fsr_tpu.ops import easu as easu_ops
from fsr_tpu.ops.rcas import shift_clamped

__all__ = ["upscale_spatial_sharded", "spatial_shardable"]

_HALO = 4   # exact-phase path: input rows exchanged per side
_GHALO = 8  # general-ratio path: covers f32 coordinate drift + taps


def _kernel_path(mesh: "Mesh") -> bool:
    """True when shards should run the fused Pallas kernel (real TPU mesh)."""
    return mesh.devices.flat[0].platform == "tpu" and not fused.INTERPRET


def _exact_phase(in_size, out_size, n_shards: int) -> bool:
    """Exact phase structure: every shard's mapping is a shifted copy."""
    hin, win = in_size
    hout, wout = out_size
    con = EasuConstants.create((win, hin), None, (wout, hout))
    st = fused._phase_structure(con, (hout, wout))
    if st is None:
        return False
    qy = st[0]
    hl_out = hout // n_shards
    # Each shard must start on phase 0 and advance by exactly its local
    # input height, so every shard's coordinate pattern is identical.
    return hl_out % qy == 0 and hl_out // qy == hin // n_shards


def spatial_shardable(in_size, out_size, n_shards: int) -> bool:
    """Check the divisibility/strip-size conditions for row sharding.

    Any upscale ratio qualifies (arbitrary ratios ride host-built global
    row plans); the strip must divide evenly and be tall enough to host
    the halo exchange.
    """
    hin, win = in_size
    hout, wout = out_size
    if hin % n_shards or hout % n_shards:
        return False
    if hout < hin or wout < win:
        return False
    if _exact_phase(in_size, out_size, n_shards):
        return hin // n_shards >= _HALO
    return hin // n_shards >= _GHALO and hout // n_shards >= 2


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


def _exchange_halo(block, idx, axis, n, halo):
    """Neighbor row halos via ppermute; edge replication at global ends."""
    up = lax.ppermute(
        block[..., -halo:, :], axis, [(i, (i + 1) % n) for i in range(n)]
    )
    down = lax.ppermute(
        block[..., :halo, :], axis, [(i, (i - 1) % n) for i in range(n)]
    )
    # Wrap-around halos at the global top/bottom are invalid; replace
    # with edge replication (the sampler's CLAMP behavior).
    top_edge = jnp.repeat(block[..., :1, :], halo, axis=-2)
    bot_edge = jnp.repeat(block[..., -1:, :], halo, axis=-2)
    up = jnp.where(idx == 0, top_edge, up)
    down = jnp.where(idx == n - 1, bot_edge, down)
    return jnp.concatenate([up, block, down], axis=-2)


def _rcas_tail(easu_out, idx, hl_out, hout, rcon, dt, denoise):
    """RCAS over local rows given EASU rows [-1, hl_out+1) (XLA path)."""
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


@functools.partial(
    jax.jit,
    static_argnames=(
        "out_size", "mesh", "axis", "batch_axis", "sharpness", "apply_rcas",
        "denoise", "compute_dtype", "epilogue", "prologue", "out_dtype",
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
    epilogue=None,
    frame=0,
    grain=None,
    dither_page=None,
    prologue: str = "none",
    out_dtype=None,
) -> jnp.ndarray:
    """Upscale (..., 3|4, H, W) with H row-sharded across `mesh[axis]`.

    Any upscale ratio (1x..4x area, like FsrEasuF).  RGBA follows the same
    contract as api.upscale: alpha is bilinear, never sharpened, resolved
    in-kernel on the kernel paths.  batch_axis: optionally also shard the
    leading batch dimension across a second mesh axis (dp x sp execution
    in one shard_map).

    u8 input / out_dtype: the same byte-I/O contract as `api.upscale` —
    uint8 strips stay bytes through the halo exchange and decode
    in-kernel; uint8/uint16 outputs encode UNORM codes at the kernel
    store (XLA fallback: decode/encode around the float math).

    epilogue / frame / grain / dither_page / prologue: the same fused
    pre/post-ops as `api.upscale` — the TEPD hash, dither page, and grain
    all use GLOBAL coordinates (per-shard row offsets are threaded into
    the kernels), so sharded output matches unsharded.  `grain` is plain
    output-space (3, Hout, Wout), row-sharded with the output.  On the
    exact-phase (2x/4x) kernel path, grain and texture dither are not yet
    fused (the phase-planar operands need a phase-aligned offset); those
    configs run the per-shard XLA path instead.
    """
    from fsr_tpu.api import _apply_epilogue_xla
    from fsr_tpu.ops import extras

    hout, wout = out_size
    hin, win = image.shape[-2:]
    n = mesh.shape[axis]
    if not spatial_shardable((hin, win), (hout, wout), n):
        raise ValueError(
            f"spatial sharding needs divisible, halo-sized strips "
            f"(in={hin}x{win} out={hout}x{wout} shards={n})"
        )
    if prologue not in ("none", "srtm"):
        raise ValueError(f"unknown prologue {prologue!r}")
    nch = image.shape[-3]
    if nch not in (3, 4):
        raise ValueError(f"image must have 3 or 4 channels, got {nch}")
    # RGBA: the kernels resolve alpha in-kernel; the XLA fallback splits
    # it into a bilinear pass per shard (same semantics as api.upscale).
    has_alpha = nch == 4
    # Byte I/O (same contract as api.upscale): uint8 sources stay bytes
    # through the halo exchange and decode v/255 in-kernel; uint8/uint16
    # outputs encode UNORM codes at the store (or as an XLA after-step on
    # the fallback path).
    u8_in = image.dtype == jnp.uint8
    out_dt = jnp.dtype(out_dtype) if out_dtype is not None else None
    u8_out = out_dt == jnp.uint8
    u16_out = out_dt == jnp.uint16
    if out_dt is not None and not (u8_out or u16_out or out_dt == jnp.dtype(compute_dtype)):
        raise ValueError(
            "out_dtype must be uint8/uint16 or match compute_dtype"
        )
    if epilogue is not None and epilogue.dither_bits == 10 and u8_out:
        # 10-bit TEPD codes k/1023 are not representable as x255 UNORM
        # bytes (mirrors api.upscale's check).
        raise ValueError("uint8 output cannot hold 10-bit codes")
    con = EasuConstants.create((win, hin), None, (wout, hout))
    rcon = RcasConstants(sharpness)
    hl_out = hout // n
    dt = jnp.dtype(compute_dtype)
    nb = image.ndim - 3
    lead = (batch_axis,) + (None,) * (nb - 1) if (batch_axis and nb) else (None,) * nb
    spec = P(*lead, None, axis, None)

    epi = epilogue
    if epi is not None and epi.is_noop:
        epi = None
    if epi is not None:
        if epi.needs_grain and grain is None:
            raise ValueError("epilogue.grain_amount != 0 requires grain")
        if epi.needs_dither_tex and dither_page is None:
            raise ValueError("epilogue.dither_texture requires dither_page")
    if grain is not None:
        grain = jnp.asarray(grain, jnp.float32)
        if grain.shape != (3, hout, wout):
            raise ValueError(
                f"grain must be (3, {hout}, {wout}), got {grain.shape}"
            )

    # Optional epilogue operands, appended to every shard_map call so both
    # regimes share the plumbing.  frame/dither_page replicate; grain row-
    # shards with the output.
    extra_ops, extra_specs = [], []
    frame_i = jnp.asarray(0 if frame is None else frame, jnp.int32)
    extra_ops.append(frame_i)
    extra_specs.append(P())
    has_grain = grain is not None
    if has_grain:
        extra_ops.append(grain)
        extra_specs.append(P(None, axis, None))
    has_page = dither_page is not None
    if has_page:
        page = jnp.asarray(dither_page, jnp.float32)
        extra_ops.append(page)
        extra_specs.append(P(None, None))

    def unpack_extras(rest):
        rest = list(rest)
        fr = rest.pop(0)
        g_l = rest.pop(0) if has_grain else None
        pg = rest.pop(0) if has_page else None
        return fr, g_l, pg

    def xla_epilogue(out, idx, fr, g_l, pg):
        if epi is None:
            return out
        return _apply_epilogue_xla(
            out, epi, fr, g_l, dither_page=pg, origin=(idx * hl_out, 0)
        )

    def decode_in(x):
        return (
            x.astype(jnp.float32) * jnp.float32(1.0 / 255.0) if u8_in else x
        )

    def encode_out(x):
        from fsr_tpu.kernels import epilogue as epilogue_mod

        if u8_out:
            return epilogue_mod.encode_unorm8(x)
        if u16_out:
            return epilogue_mod.encode_unorm10(x)
        if out_dt is not None:
            return x.astype(out_dt)
        return x

    if _exact_phase((hin, win), (hout, wout), n):
        sy = float(con.scale[1])
        con_loc = _local_constants(con, sy, _HALO)

        def local_fn(block, *rest):
            # block: (..., 3, Hl, W) local strip
            idx = lax.axis_index(axis)
            fr, g_l, pg = unpack_extras(rest)
            padded = _exchange_halo(block, idx, axis, n, _HALO)

            # On TPU, run the fused Pallas kernel per shard so multi-chip
            # throughput scales the kernel-path number (the RCAS border
            # clamp uses global row coordinates via row_offset, so edge
            # shards stay bit-exact); the XLA path below serves CPU meshes
            # and f16.  The fused grain/dither-page operands are phase-
            # planar in local coordinates, so the shard offset is baked in
            # here: grain planarizes from the shard's LOCAL output strip
            # (its two halo rows are sliced off, so their grain values are
            # irrelevant — edge replication keeps shapes), and the 128-row
            # dither page pre-rolls by the shard's global row offset (the
            # page is periodic, so the kernel's local tile roll composes).
            if (
                _kernel_path(mesh)
                and fused.supported(padded.shape, (hl_out + 2, wout), con_loc,
                                    dt, out_dtype=out_dtype)
            ):
                row_off = idx * hl_out - 1
                gp_l = None
                if epi is not None and epi.needs_grain:
                    g_strip = jnp.concatenate(
                        [g_l[:, :1], g_l, g_l[:, -1:]], axis=1
                    )
                    gp_l = fused.planarize_grain(
                        g_strip, (hl_out + 2, wout), con_loc
                    )
                pg_l = None
                if epi is not None and epi.needs_dither_tex:
                    pg_l = jnp.roll(pg, -row_off, axis=0)
                try:
                    out = fused.upscale_fused(
                        padded, (hl_out + 2, wout), con_loc, rcon,
                        apply_rcas=apply_rcas, denoise=denoise,
                        compute_dtype=dt,
                        row_offset=row_off, global_rows=hout,
                        epilogue=epi, frame=fr, grain_planar=gp_l,
                        dither_page=pg_l, planar_offset_ok=True,
                        prologue=prologue, out_dtype=out_dtype,
                    )
                    return out[..., 1:-1, :]
                except fused.DitherTileError:
                    pass  # narrow output: dither page can't tile; XLA below

            padded = decode_in(padded)
            a_l = None
            rgb_pad = padded
            if has_alpha:
                a_l = easu_ops.bilinear(
                    padded[..., 3:4, :, :], (hl_out + 2, wout), con_loc
                )[..., 1:-1, :]
                rgb_pad = padded[..., :3, :, :]
            if prologue == "srtm":
                rgb_pad = extras.srtm(rgb_pad)
            # EASU over local rows [-1, hl_out+1) (one row of RCAS halo).
            easu_out = easu_ops.easu(
                rgb_pad, (hl_out + 2, wout), con_loc, compute_dtype=dt
            )
            if not apply_rcas:
                out = easu_out[..., 1:-1, :]
            else:
                out = _rcas_tail(easu_out, idx, hl_out, hout, rcon, dt, denoise)
            out = xla_epilogue(out, idx, fr, g_l, pg)
            if a_l is not None:
                out = jnp.concatenate([out, a_l.astype(out.dtype)], axis=-3)
            return encode_out(out)

        return shard_map(
            local_fn, mesh=mesh, in_specs=(spec, *extra_specs),
            out_specs=spec, check_rep=False,
        )(image, *extra_ops)

    # --- General (arbitrary-ratio) path: host-built global row plans.
    kp = (
        _kernel_path(mesh)
        and dt in (jnp.float32, jnp.bfloat16)
        and hl_out >= 16
        and wout >= 128
    )
    meta, plan = easu_gather_mod.build_shard_plans(
        (hin, win), (hout, wout), con, n, halo=_GHALO, apply_rcas=apply_rcas,
        compute_dtype=dt, out_dtype=out_dtype,
    )
    if u8_out or u16_out:
        # Integer output blocks need a 32/16-row sublane granule.
        gran = 32 if u8_out else 16
        kp = kp and (meta["tj"] % gran == 0 or meta["tj"] == hl_out)
    row_meta = (meta["tih"],)
    pad_bottom = meta["pad_bottom"]

    def local_fn_g(block, rs, r_sel, ppy, rloc, pyl, *rest):
        idx = lax.axis_index(axis)
        fr, g_l, pg = unpack_extras(rest)
        padded = _exchange_halo(block, idx, axis, n, _GHALO)
        if kp:
            buf = jnp.pad(
                padded,
                ((0, 0),) * (padded.ndim - 2) + ((0, pad_bottom), (0, 0)),
            )
            try:
                return easu_gather_mod.easu_gather(
                    buf, (hl_out, wout), con, rcon, apply_rcas=apply_rcas,
                    denoise=denoise, compute_dtype=dt,
                    row_plan=(rs[0], r_sel[0], ppy[0]), row_meta=row_meta,
                    epilogue=epi, frame=fr, grain=g_l, dither_page=pg,
                    prologue=prologue, row_offset=idx * hl_out,
                    out_dtype=out_dtype,
                )
            except easu_gather_mod.DitherTileError:
                pass  # narrow output: dither page can't tile; XLA below
        padded = decode_in(padded)
        a_l = None
        rgb_pad = padded
        if has_alpha:
            a_l = easu_ops.bilinear(
                padded[..., 3:4, :, :], (hl_out, wout), con,
                rows=(rloc[0][1:-1], pyl[0][1:-1]),
            )
            rgb_pad = padded[..., :3, :, :]
        if prologue == "srtm":
            rgb_pad = extras.srtm(rgb_pad)
        easu_out = easu_ops.easu(
            rgb_pad, (hl_out + 2, wout), con, compute_dtype=dt,
            rows=(rloc[0], pyl[0]),
        )
        if not apply_rcas:
            out = easu_out[..., 1:-1, :]
        else:
            out = _rcas_tail(easu_out, idx, hl_out, hout, rcon, dt, denoise)
        out = xla_epilogue(out, idx, fr, g_l, pg)
        if a_l is not None:
            out = jnp.concatenate([out, a_l.astype(out.dtype)], axis=-3)
        return encode_out(out)

    pspec = P(axis)
    in_specs = (spec,) + (pspec,) * 5 + tuple(extra_specs)
    return shard_map(
        local_fn_g, mesh=mesh, in_specs=in_specs, out_specs=spec,
        check_rep=False,
    )(
        image, plan["row_starts"], plan["R"], plan["ppy"],
        plan["rows_xla"], plan["py_xla"], *extra_ops,
    )
