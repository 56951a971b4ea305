"""General-ratio EASU(+RCAS) Pallas kernel: static tap gathers.

The fused phase-decomposed kernel (kernels/fused.py) requires the
output->input mapping to advance one source texel per qx outputs (integer
ratios).  The quality presets 1.3x/1.5x/1.7x have no such structure: each
output tile needs a genuine gather of its 12 taps.  TPUs have no global
vector gather — but the gather indices are *static* (the coordinate mapping
is fixed at trace time), which three mechanisms exploit:

- **Hybrid X-phase** (rational column mappings, e.g. the Quality 1.5x
  preset advances exactly 2 source texels per 3 outputs): the tile (and
  the per-texel g responses) are deinterleaved by the source stride with
  within-vreg gathers, after which every phase's tap columns are static
  rolls of a parity plane — no per-tap selection work at all.  Each phase
  resolves against its own (drifting, per-lane) host-exact fraction array
  and the phase planes re-interleave with one gather per output vreg.
  Detected from the ground-truth coordinates (integer part exactly
  linear); requires plane width ti == 128*qx.  Measured 1.86 -> 1.53 ms
  for the 1.5x->4K preset.
- **Columns** (general ratios >= ~1.04x): for each 128-lane
  output block, the tap span ceil(128/scale)+4 fits one vreg, so tap
  columns are one dynamic roll of the tile (aligning the block's first tap
  to lane 0) plus a within-vreg tpu.dynamic_gather with host-precomputed
  indices; the dx in {-1..2} variants just add k to the index vector.
  Measured ~1.9x cheaper than the one-hot matmuls below, and exact for
  every dtype (no bf16 operand splitting needed).
- **Rows** (always) and columns near 1x: one-hot selection matmuls on the
  MXU, tap[dy,dx] = R_dy @ (tile @ St_dx), where St (per tile column)
  selects source columns fx(i)+dx and R (per tile row) selects source rows
  fy(j)+dy; the dy/dx variants are rolls of one base one-hot matrix.
  One-hot selection through the MXU is exact (each output element is one
  product by 1.0); f32 data is split into three bf16 terms with exact sum
  so selection stays bit-exact at bf16 matmul rate.  (Mosaic's
  dynamic_gather is lane-axis/128-wide only, so rows cannot ride it.)

RCAS fuses into the same kernel (the reference runs EASU+RCAS back to back
for every quality preset, FSR_Filter.cpp:119-133) with a one-tile software
pipeline: the RCAS cross at an output tile's right edge needs its right
neighbor's first column, so grid step tx computes EASU for tile tx and
sharpens tile tx-1, whose neighbors both exist by then.  EASU rows carry a
one-row halo (baked into the row selectors); the left-neighbor column rides
a one-vreg ring buffer.  This removes the separate RCAS dispatch and the
intermediate image's HBM round trip + pad.

Subpixel fractions are passed in as per-axis arrays: they must match the
ground-truth host coordinates bit-for-bit, and recomputing them in-kernel
is unsafe — Mosaic contracts x*sx+ox into an FMA (excess precision), which
flips floor() at exact-integer positions and de-synchronizes the fraction
from the gathered taps.

This covers any EASU ratio (1x..4x area) including Dynamic Resolution
Scaling offsets.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fsr_tpu.core import approx, easu_math
from fsr_tpu.core.constants import EasuConstants, RcasConstants
from fsr_tpu.kernels import epilogue as epilogue_mod
from fsr_tpu.kernels.epilogue import DitherTileError
from fsr_tpu.kernels.pad import edge_pad, kernel_path_ok
from fsr_tpu.ops.easu import easu_coords

INTERPRET = False
# In-kernel pad mode (mirrors kernels/fused.py): DMA straight from the
# UNPADDED image with clamped aligned windows, eliminating the pad/convert
# pass.  Module-level so tests can A/B against the padded path.
INKERNEL_PAD = True

import os
# Timing-ablation hook driven by tools/ablation/gather_ablation.py: stubs
# out pieces of the col-gather selection pipeline to attribute device time.
# Output is wrong under every non-empty mode; never set in production.
# Guarded by an explicit opt-in so a stray env var cannot silently corrupt
# output: any mode without FSR_GATHER_ABL_I_KNOW=1 is a hard error.
_ABL = os.environ.get("FSR_GATHER_ABL", "")
if _ABL and os.environ.get("FSR_GATHER_ABL_I_KNOW") != "1":
    raise RuntimeError(
        "FSR_GATHER_ABL is set but produces deliberately WRONG output "
        "(timing ablation only; tools/ablation/gather_ablation.py). "
        "Set FSR_GATHER_ABL_I_KNOW=1 to confirm, or unset FSR_GATHER_ABL."
    )

# Packed-pair gathers on the bf16-matmul path (two bf16 planes per int32
# within-vreg gather; bit-exact there — see the col-gather packing note in
# the kernel).  Default OFF: measured slower on v5e (1.459 vs 1.431 ms at
# 1.7x, 1.515 vs 1.505 at 1.3x, GATHER_ABL_r05) — the pack/unpack integer
# ALU work on full-window planes outweighs the 8 saved gathers + 3 saved
# rolls per block.  FSR_GATHER_PACK=1 re-enables for A/B.
_PACK = os.environ.get("FSR_GATHER_PACK", "0") == "1"


def _pack2(hi, lo):
    """int32 plane holding bf16(hi) in the top half-word, bf16(lo) low.

    bf16 -> f32 upcast is exact and places the bf16 bit pattern in the
    f32's top 16 bits, so the pack is two upcast-bitcasts + shift + or.
    """
    def bits_hi(x):
        return jax.lax.bitcast_convert_type(
            x.astype(jnp.bfloat16).astype(jnp.float32), jnp.int32)

    return bits_hi(hi) | jax.lax.shift_right_logical(
        bits_hi(lo), jnp.int32(16))


def _unpack2(v):
    """Inverse of _pack2: two f32 planes holding the exact bf16 values."""
    hi = jax.lax.bitcast_convert_type(v & jnp.int32(-65536), jnp.float32)
    lo = jax.lax.bitcast_convert_type(
        jax.lax.shift_left(v, jnp.int32(16)), jnp.float32)
    return hi, lo


def supported(in_shape, out_size, con: EasuConstants, compute_dtype,
              out_dtype=None) -> bool:
    if len(in_shape) < 3 or in_shape[-3] not in (3, 4):
        return False  # RGB, or RGBA with in-kernel bilinear alpha
    if jnp.dtype(compute_dtype) not in (jnp.float32, jnp.bfloat16):
        return False
    hout, wout = out_size
    hin, win = in_shape[-2:]
    if hout < 16 or wout < 128:
        return False
    if out_dtype is not None and jnp.dtype(out_dtype) in (jnp.uint8,
                                                          jnp.uint16):
        # 8/16-bit output blocks need a 32/16-row sublane granule.
        o8 = jnp.dtype(out_dtype) == jnp.uint8
        gran = 32 if o8 else 16
        for rc in (True, False):
            tj, _ = _pick_tiles(hout, wout, apply_rcas=rc, out8=o8,
                                out16=not o8)
            if tj % gran and tj != hout:
                return False
    # EASU contract: 1x to 4x area scaling (ffx_fsr1.h:40); the tile-window
    # math below also assumes no downscale.
    return hout >= hin and wout >= win


def _pick_tiles(hout: int, wout: int, apply_rcas: bool = False,
                out8: bool = False, out16: bool = False, scale=None):
    """On-device sweeps (v5e, presets -> 4K).  After the per-block
    gather+resolve restructure the col-gather path favors much wider
    tiles: (136, 640) wins for 1.7x (1.518 -> 1.453 ms) and (120, 768)
    for 1.3x (1.66 -> 1.547) — the wider tile amortizes per-step scratch
    traffic and the per-block software pipeline keeps the live set small
    regardless of ti.  The hybrid X-phase mode overrides ti to 128*qx and
    measured best at tj=120 (136/152 were 1.8%/3.2% slower at 1.5x).
    `scale` is the output/input ratio used to pick between the two
    regimes; None keeps the pre-sweep (120, 384) plan (ablation modes).
    The wide plans serve f32 too since the kernel's scoped-vmem budget
    was raised past Mosaic's 16M default (r5); a wider re-sweep under
    that budget confirmed (136, 640)/(120, 768) still optimal for bf16
    ((136, 768) neutral, (168+, *) and (120, 896+) strictly worse).
    out8/out16: uint8/uint16 output blocks need a 32/16-row granule ->
    tj=96/112 with the proven (.., 384) plan (not re-swept at 640+).
    The EASU-only kernel keeps (64, 256)."""
    if apply_rcas:
        if out8 or out16 or scale is None:
            ti = 384 if wout >= 384 else (256 if wout >= 256 else 128)
            tj = 96 if out8 else (112 if out16 else 120)
        else:
            wide_ratio = scale >= 1.6
            ti = min(640 if wide_ratio else 768,
                     max(128, wout // 128 * 128))
            tj = 136 if wide_ratio else 120
        while tj > hout and tj > 8:
            tj = 8 * ((tj // 2) // 8) or 8
        return tj, ti
    ti = 256
    while ti > wout and ti > 128:
        ti //= 2
    tj = 64
    while tj > hout and tj > 8:
        tj //= 2
    return tj, ti


def _axis_plan(f: np.ndarray, n_out: int, tile: int, pad_lead: int, align: int,
               lead: int = 0, ext: int = None):
    """Per-tile aligned window starts and the uniform window size.

    Returns (starts[nt] int32 in padded coords, local[nt, ext] int32,
    window int).  local[t, u] = source index of output (t*tile - lead + u)
    relative to the window start; taps need local-1 .. local+2, all inside
    [0, window).  Indices outside [0, n_out) are clamped, so lead/trail
    halo rows duplicate the edge output exactly (which reproduces the RCAS
    border rule bit-for-bit).
    """
    nt = -(-n_out // tile)
    ext = tile if ext is None else ext
    starts = np.zeros(nt, np.int32)
    local = np.zeros((nt, ext), np.int32)
    span = 0
    for t in range(nt):
        idx = np.arange(t * tile - lead, t * tile - lead + ext)
        idx = np.clip(idx, 0, n_out - 1)
        fw = f[idx].astype(np.int64)
        start = (fw[0] - 1 + pad_lead) // align * align
        starts[t] = start
        local[t] = fw + pad_lead - start
        span = max(span, int(local[t].max()) + 3)
    window = -(-span // align) * align
    return starts, local, window


def build_shard_plans(in_size, out_size, con: EasuConstants, n: int,
                      halo: int = 8, apply_rcas: bool = True,
                      compute_dtype=jnp.float32, out_dtype=None):
    """Host-side per-shard row plans for row-sharded general-ratio upscaling.

    The gather kernel's row plan (window starts, one-hot row selectors, row
    fractions) already flows in as operands — only its construction is
    host-side.  For spatial sharding the plan is built here from the GLOBAL
    coordinate mapping (bit-identical to the unsharded `easu_coords` floats,
    so shard seams are exact), restricted per shard k to output rows
    [k*hl, (k+1)*hl) with source indices relative to the shard's halo'd
    strip buffer `concat(up_halo, strip, down_halo)`; global-edge clamping
    rides the halo rows, which the sharded caller edge-replicates at the
    top/bottom shards (the sampler CLAMP rule, ffx_fsr1.h:354-360 tap
    clamping via FSR_Filter.cpp:49-50's clamp sampler).

    Returns (meta, plan):
      meta: dict with static geometry — tih (row window), pad_bottom (zero
        rows each shard appends to its strip buffer before the kernel
        call), tj/tj_e/ny_l, halo.
      plan: dict of stacked per-shard arrays, each with leading axis n for
        shard_map to split —
        row_starts (n, ny_l) i32, R (n, ny_l, 4*tj_e, tih) bf16,
        ppy (n, ny_l*tj_e, 128) f32  [kernel path],
        rows_xla (n, hl+2) i32, py_xla (n, hl+2) f32  [XLA path: local
        base source row + fraction per output row incl. one RCAS halo
        row each side].
    """
    hin, win = in_size
    hout, wout = out_size
    if hout % n or hin % n:
        raise ValueError(f"row sharding needs n | sizes (h {hin}->{hout}, n={n})")
    hl, hin_l = hout // n, hin // n
    if hin_l < halo:
        raise ValueError(f"shard strips of {hin_l} rows cannot host a {halo}-row halo")
    fx, fy, px, py = easu_coords(con, out_size)
    o8 = out_dtype is not None and jnp.dtype(out_dtype) == jnp.uint8
    o16 = out_dtype is not None and jnp.dtype(out_dtype) == jnp.uint16
    # Must mirror easu_gather's own plan choice exactly (the kernel
    # validates the R geometry): scale-based plans for every dtype.
    tj, _ = _pick_tiles(
        hl, wout, apply_rcas=apply_rcas, out8=o8, out16=o16,
        scale=1.0 / float(con.scale[1]),
    )
    rhalo = 1 if apply_rcas else 0
    tj_e = -(-(tj + 2) // 8) * 8 if apply_rcas else tj
    ny_l = -(-hl // tj)
    buf = hin_l + 2 * halo
    starts = np.zeros((n, ny_l), np.int32)
    lfy = np.zeros((n, ny_l, tj_e), np.int64)
    ppy = np.zeros((n, ny_l * tj_e, 128), np.float32)
    span = 0
    for k in range(n):
        base = k * hin_l - halo
        # Ragged-tile overflow rows (pallas output padding) clamp to the
        # shard's own trail-halo row so their taps stay within the strip;
        # the rcas halo rows themselves clamp against the GLOBAL range.
        lo = max(0, k * hl - rhalo)
        hi = min(hout - 1, (k + 1) * hl - 1 + rhalo)
        for t in range(ny_l):
            j0 = k * hl + t * tj - rhalo
            idx = np.clip(np.arange(j0, j0 + tj_e), lo, hi)
            fw = fy[idx].astype(np.int64) - base
            if fw.min() < 1 or fw.max() + 2 >= buf:
                raise ValueError(
                    f"halo {halo} cannot host shard {k}'s taps "
                    f"(local rows {fw.min()}..{fw.max()} of {buf})"
                )
            start = max(0, int(fw[0] - 1) // 8 * 8)
            starts[k, t] = start
            lfy[k, t] = fw - start
            span = max(span, int((fw - start).max()) + 3)
            ppy[k, t * tj_e:(t + 1) * tj_e] = py[idx][:, None]
    tih = -(-span // 8) * 8
    pad_bottom = max(0, int(starts.max()) + tih - buf)
    R = np.zeros((n, ny_l, 4 * tj_e, tih), np.float32)
    for k in range(n):
        for t in range(ny_l):
            for s in range(4):
                R[k, t, s * tj_e + np.arange(tj_e), lfy[k, t] - 1 + s] = 1.0
    rows_xla = np.zeros((n, hl + 2), np.int32)
    py_xla = np.zeros((n, hl + 2), np.float32)
    for k in range(n):
        idx = np.clip(np.arange(k * hl - 1, (k + 1) * hl + 1), 0, hout - 1)
        rows_xla[k] = fy[idx] - (k * hin_l - halo)
        py_xla[k] = py[idx]
    meta = dict(tih=tih, pad_bottom=pad_bottom, tj=tj, tj_e=tj_e,
                ny_l=ny_l, halo=halo)
    plan = dict(
        row_starts=jnp.asarray(starts),
        R=jnp.asarray(R, jnp.bfloat16),
        ppy=jnp.asarray(ppy),
        rows_xla=jnp.asarray(rows_xla),
        py_xla=jnp.asarray(py_xla),
    )
    return meta, plan


def _detect_x_phase(fxv: np.ndarray, wout: int):
    """Exact rational X-phase structure of the *integer* source mapping:
    fx(qx*j + b) == stride*j + rx[b].  Checked against the ground-truth
    coordinate array, never assumed.  The subpixel fractions drift by a
    few ulps across the image (f32 coordinate math), so they stay per-lane
    arrays — only the tap geometry needs the exact rational structure.
    Returns (qx, stride, rx[]) or None."""
    for qx in (2, 3, 4, 5):
        stride = None
        rx, ok = [], True
        for b in range(qx):
            sel_f = fxv[b::qx].astype(np.int64)
            if len(sel_f) < 2:
                ok = False
                break
            d = np.diff(sel_f)
            if not np.all(d == d[0]):
                ok = False
                break
            if stride is None:
                stride = int(d[0])
            elif int(d[0]) != stride:
                ok = False
                break
            rx.append(int(sel_f[0]))
        if ok and stride is not None and stride >= 1:
            return qx, stride, rx
    return None


@functools.partial(
    jax.jit,
    static_argnames=("out_size", "con", "rcon", "apply_rcas", "denoise",
                     "compute_dtype", "epilogue", "prologue", "out_dtype",
                     "row_meta"),
)
def easu_gather(
    image: jnp.ndarray,
    out_size: Tuple[int, int],
    con: EasuConstants,
    rcon: Optional[RcasConstants] = None,
    apply_rcas: bool = False,
    denoise: bool = False,
    compute_dtype=jnp.float32,
    epilogue: epilogue_mod.Epilogue = None,
    frame=None,
    grain=None,
    prologue: str = "none",
    out_dtype=None,
    dither_page=None,
    row_plan=None,
    row_meta=None,
    row_offset=None,
) -> jnp.ndarray:
    """EASU upscale (optionally + fused RCAS) for arbitrary ratios.

    image: (..., 3, Hin, Win).  With apply_rcas=True, `rcon` is required and
    the output is the sharpened upscale (FsrEasuF then FsrRcasF semantics).

    epilogue / frame / grain: optional fused output epilogue (SRTM^-1 or
    gamma2 transform, LFGA grain, TEPD dithered quantize) applied in VMEM
    before writeback (kernels/epilogue.py).  Unlike the phase-decomposed
    kernel, `grain` is plain output-space (3, Hout, Wout).
    prologue: "none" | "srtm" — SRTM tonemap applied to the input tile in
    VMEM before EASU (FsrSrtmF, ffx_fsr1.h:1043).
    row_plan / row_meta: prebuilt per-shard row plan for spatially sharded
    execution (see build_shard_plans).  row_plan is the traced arrays
    (row_starts (ny,), R (ny, 4*tj_e, tih), ppy (ny*tj_e, 128)); row_meta
    is the static tuple (tih,).  The image must then be the shard's
    halo'd strip buffer with `pad_bottom` extra zero rows already
    appended (rows fully prepared by the caller; columns are still
    padded here, from the GLOBAL column mapping).
    uint8 I/O: a uint8 image is decoded v/255 in-kernel (byte source +
    byte tile DMAs); out_dtype=jnp.uint8 encodes the D3D UNORM rule at
    the store (see kernels/fused.py).
    """
    if apply_rcas and rcon is None:
        raise ValueError("apply_rcas=True requires rcon")
    if prologue not in ("none", "srtm"):
        raise ValueError(f"unknown prologue {prologue!r}")
    batch_dims = image.shape[:-3]
    image = image.reshape((-1,) + image.shape[-3:])
    nb = image.shape[0]
    nc = image.shape[1]
    if nc not in (3, 4):
        raise ValueError(f"image must have 3 or 4 channels, got {nc}")
    # RGBA: the 4th channel rides the tile DMA and is bilinear-resolved
    # through the same column/row selection machinery (EASU defines no
    # alpha semantics; RCAS passes alpha through, ffx_fsr1.h:688-705).
    has_alpha = nc == 4

    dt = jnp.dtype(compute_dtype)
    u8_in = image.dtype == jnp.uint8
    out_dt = jnp.dtype(out_dtype) if out_dtype is not None else dt
    u8_out = out_dt == jnp.uint8
    u16_out = out_dt == jnp.uint16
    if out_dt != dt and not (u8_out or u16_out):
        raise ValueError(
            "out_dtype must be uint8/uint16 or match compute_dtype"
        )
    hout, wout = out_size
    hin, win = image.shape[-2:]
    fx, fy, px, py = easu_coords(con, out_size)
    # Ablation modes keep the conservative (120, 384) plan: "noroll"
    # removes the alignment rolls, which extends the full-width window
    # planes' live ranges across the whole block loop and OOMs Mosaic's
    # 16M scoped vmem at the wide production plans (GATHER_ABL r4).
    # The wide scale-based plans originally served only bf16 (the f32
    # input window + plane buffers tripped Mosaic's 16M default scoped
    # vmem); with the raised per-kernel stack budget below they win for
    # f32 too (1.7x 2.655 -> 2.566 ms, 1.3x 3.195 -> 3.024, r5 sweep).
    # Ablation modes keep the conservative plan ("noroll" extends the
    # window planes' live ranges past even the raised budget).
    tj, ti = _pick_tiles(
        hout, wout, apply_rcas=apply_rcas, out8=u8_out, out16=u16_out,
        scale=(1.0 / float(con.scale[1]) if not _ABL else None),
    )
    # Sweep hook (tools only): override the tile plan, e.g. "136,640".
    _tiles_env = os.environ.get("FSR_GATHER_TILES")
    if _tiles_env:
        tj, ti = (int(v) for v in _tiles_env.split(","))
    # Hybrid X-phase mode: when the X mapping is exactly rational (stride
    # source texels per qx outputs — e.g. the Quality 1.5x preset is
    # stride 2 / qx 3), column taps become rolls of stride-deinterleaved
    # planes with a constant subpixel fraction per phase, and only rows
    # need selection matmuls.  Requires ti == 128*qx so each phase plane
    # is exactly one vreg block wide.
    xp = _detect_x_phase(fx, wout)
    if xp is not None and wout >= 128 * xp[0]:
        qx_h, stride_h = xp[0], xp[1]
        ti = 128 * qx_h
    else:
        xp = None
    ny, nx = pl.cdiv(hout, tj), pl.cdiv(wout, ti)
    rhalo = 1 if apply_rcas else 0
    # Extended rows: one RCAS halo row each side, rounded up to the sublane
    # granule (the extra rows clamp to the bottom edge and are sliced off).
    tj_e = -(-(tj + 2) // 8) * 8 if apply_rcas else tj
    nsteps = nx + 1 if apply_rcas else nx

    # --- In-kernel pad mode (mirrors kernels/fused.py): DMA straight from
    # the UNPADDED image with clamped aligned windows, eliminating the
    # pad/convert pass (a full-frame HBM round trip).  The host plans are
    # built directly in RAW image coordinates (pad_lead=0), so interior
    # tiles run byte-identically to the padded path (same window sizes,
    # locals, and selection operands — no realignment slice); window
    # STARTS may leave [0, hin-tih]/[0, win-tiw] at the image borders,
    # where the fetch clamps and the affected tiles (a prefix/suffix of
    # tile indices — starts are monotone) realign with one dynamic roll +
    # CLAMP-replicate the border rows/cols in VMEM, bit-identical to edge
    # padding.  Works for every column-selection mode (the fix rewrites
    # the raw tile before any deinterleave/gather/matmul, so tile-local
    # plan invariants — e.g. the hybrid mode's tile-invariant lfx0 — are
    # preserved); requires aligned image extents and storage-dtype input
    # (no fused convert to ride the pad pass).
    ik_want = (
        INKERNEL_PAD
        and row_plan is None
        and not u8_in
        and image.dtype == dt
        and hin % 8 == 0 and win % 128 == 0
    )

    def _plan_axes(raw):
        pt = 0 if raw else max(0, 2 - int(fy[0]))
        pl_ = 0 if raw else max(0, 2 - int(fx[0]))
        rp = _axis_plan(fy, hout, tj, pt, 8, lead=rhalo, ext=tj_e)
        cp = _axis_plan(fx, wout, ti, pl_, 128)
        return pt, pl_, rp, cp

    def _xp_adjust(xp_in, lfx, tiw):
        """Hybrid mode needs a tile-invariant window-relative tap base."""
        if xp_in is None:
            return None, None, None, tiw
        lfx0 = [int(lfx[0, b]) for b in range(qx_h)]
        for t in range(nx):
            for b in range(qx_h):
                if t * ti + b < wout and int(lfx[t, b]) != lfx0[b]:
                    return None, None, None, tiw
        m0max = (max(lfx0) + 2) // stride_h + 1
        tiw = max(tiw, -(-(stride_h * (128 + m0max) + stride_h) // 128) * 128)
        return xp_in, lfx0, m0max, tiw

    if row_plan is not None:
        if row_meta is None:
            raise ValueError("row_plan requires row_meta")
        rs_op, r_op, ppy_op = row_plan
        tih = int(row_meta[0])
        # The caller prepared the rows (halo'd strip + bottom zero pad);
        # only columns are padded below.
        pad_top = 0
        if r_op.shape != (ny, 4 * tj_e, tih):
            raise ValueError(
                f"row plan R is {r_op.shape}, kernel geometry wants "
                f"{(ny, 4 * tj_e, tih)} — was the plan built with the same "
                f"out_size/apply_rcas?"
            )
        pad_left = max(0, 2 - int(fx[0]))
        col_starts, lfx, tiw = _axis_plan(fx, wout, ti, pad_left, 128)
        xp, lfx0, m0max, tiw = _xp_adjust(xp, lfx, tiw)
        ikpad = False
    else:
        pad_top, pad_left, (row_starts, lfy, tih), (col_starts, lfx, tiw) = (
            _plan_axes(raw=ik_want)
        )
        xp, lfx0, m0max, tiw = _xp_adjust(xp, lfx, tiw)
        # Windows must fit inside the raw image for the clamped fetch;
        # otherwise rebuild the padded-coordinate plans.
        ikpad = ik_want and tih <= hin and tiw <= win
        if ik_want and not ikpad:
            pad_top, pad_left, (row_starts, lfy, tih), \
                (col_starts, lfx, tiw) = _plan_axes(raw=False)
            xp2 = _detect_x_phase(fx, wout)
            if xp2 is not None and wout >= 128 * xp2[0]:
                xp = xp2
            xp, lfx0, m0max, tiw = _xp_adjust(xp, lfx, tiw)
    if row_plan is not None or ikpad:
        pad_bottom = 0
    else:
        pad_bottom = max(0, int(row_starts.max()) + tih - (hin + pad_top))
    pad_right = (0 if ikpad else
                 max(0, int(col_starts.max()) + tiw - (win + pad_left)))

    ik_top0 = ik_lft0 = 0   # tiles 0..n-1 low-clamp (prefix counts)
    ik_bot0, ik_rgt0 = ny, nx  # first tile index that high-clamps (suffix)
    if ikpad:
        rsv = np.asarray(row_starts, np.int64)
        csv = np.asarray(col_starts, np.int64)
        ik_top0 = int(np.searchsorted(rsv, 0, side="left"))
        ik_lft0 = int(np.searchsorted(csv, 0, side="left"))
        ik_bot0 = int(np.searchsorted(rsv, hin - tih, side="right"))
        ik_rgt0 = int(np.searchsorted(csv, win - tiw, side="right"))

    # Input prep: one pass over the image, edge-replicated + converted.
    # When the Pallas pad kernel can't window the shape (unaligned extents
    # — e.g. the 1.3x/1.7x preset render sizes), pad with ZEROS instead
    # (a single XLA pad+convert fusion, vs jnp.pad(edge)'s two concat
    # passes) and replicate the borders in-kernel per tile (`fix` below).
    if ikpad:
        src = image
        fix = None
    elif u8_in:
        # Bytes end-to-end: edge replication on uint8 is plain (cheap)
        # concat padding; the v/255 decode happens per tile in-kernel.
        src = jnp.pad(
            image,
            ((0, 0),) * (image.ndim - 2)
            + ((pad_top, pad_bottom), (pad_left, pad_right)),
            mode="edge",
        )
        fix = None
    elif kernel_path_ok(hin, win):
        src = edge_pad(image, (pad_top, pad_bottom, pad_left, pad_right), dt)
        fix = None
    else:
        src = jnp.pad(
            image.astype(dt),
            ((0, 0),) * (image.ndim - 2)
            + ((pad_top, pad_bottom), (pad_left, pad_right)),
        )
        # Valid-region bounds in padded coordinates (row lo, row hi,
        # col lo, col hi), all inclusive.
        fix = (pad_top, pad_top + hin - 1, pad_left, pad_left + win - 1)

    # Base one-hot selectors at shift -1 (the earliest tap); other shifts
    # are in-kernel rolls.  R[t, j, r] = 1 iff r == lfy[t, j] - 1;
    # St[t, c, i] = 1 iff c == lfx[t, i] - 1 (pre-transposed for tile @ St).
    # Selectors are stored bf16 (1.0 is exact); on the f32 path the *data*
    # operand is split into three bf16 terms whose sum is exactly the f32
    # value, so selection stays bit-exact with bf16-rate matmuls (Mosaic
    # rejects Precision.HIGH, and HIGHEST costs 6 passes).
    mm_dt = jnp.float32 if dt == jnp.float32 else jnp.bfloat16
    # Packed-pair gathers ride only the bf16-matmul path, where the select
    # dots round their data operand to bf16 anyway (see _pack2).
    use_pack = mm_dt != jnp.float32 and _PACK
    # All four dy-shift variants are stacked into one (4*tj_e, tih) selector:
    # row block k selects source row lfy - 1 + k.  The col-gather path rides
    # one tall matmul per (channel, dx) instead of one small matmul per tap
    # (the 48 tiny 128x-tih-x128 dots per block were matmul-issue-bound, not
    # FLOP-bound); the other paths slice their per-dy selectors out of the
    # same operand.  _axis_plan guarantees lfy - 1 + 3 < tih, so no wrap.
    if row_plan is not None:
        R = r_op.astype(jnp.bfloat16)
    else:
        R = np.zeros((ny, 4 * tj_e, tih), np.float32)
        for t in range(ny):
            for k in range(4):
                R[t, k * tj_e + np.arange(tj_e), lfy[t] - 1 + k] = 1.0
        R = jnp.asarray(R, jnp.bfloat16)

    # Column path selection: per 128-lane output block, tap columns are a
    # dynamic roll (block's earliest tap -> lane 0) + a within-vreg gather;
    # falls back to one-hot matmuls when a block's tap span exceeds a vreg
    # (upscale ratios under ~1.04x).  Under interpret mode the dynamic roll
    # runs through a jnp.roll twin (same wrap semantics; the interpreter
    # rejects dynamic pltpu.roll shifts), so the production tap-indexing is
    # covered by the CPU suite.
    nblk = ti // 128
    cbase = np.zeros((nx, nblk), np.int32)
    cspan = np.zeros((nx, nblk), np.int32)
    cgidx = np.zeros((nx, 8, ti), np.int32)
    col_gather = ti % 128 == 0 and xp is None
    for t in range(nx):
        for w in range(nblk):
            lo = int(lfx[t, 128 * w]) - 1
            hi = int(lfx[t, min(128 * w + 127, ti - 1)]) + 2
            if hi - lo + 1 > 128:
                col_gather = False
            cbase[t, w] = lo
            cspan[t, w] = hi - lo + 1
            cgidx[t, :, 128 * w:128 * (w + 1)] = (
                lfx[t, 128 * w:128 * (w + 1)] - 1 - lo)[None, :]
    # Static per-block source slice hosting every tile's window for that
    # block: the dynamic alignment roll then runs on a (usually) 256-lane
    # slice instead of the full tiw-wide plane.  sbase is 128-aligned so
    # the slice is a free view; swid covers the worst tile's window end
    # (roll wrap beyond it never reaches a used lane).
    sbase = [0] * nblk
    swid = [tiw] * nblk
    if col_gather:
        for w in range(nblk):
            sbase[w] = int(cbase[:, w].min()) // 128 * 128
            need = int((cbase[:, w] + cspan[:, w]).max()) - sbase[w]
            swid[w] = min(-(-need // 128) * 128, tiw - sbase[w])
        cbase = cbase - np.asarray(sbase, np.int32)[None, :]
    cbase_flat = jnp.asarray(cbase.reshape(-1))
    cgidx_arr = jnp.asarray(cgidx)

    if col_gather or xp is not None:
        St = None
    else:
        St_np = np.zeros((nx, tiw, ti), np.float32)
        for t in range(nx):
            St_np[t, lfx[t] - 1, np.arange(ti)] = 1.0
        St = jnp.asarray(St_np, jnp.bfloat16)

    # Host-exact subpixel fractions, padded to the tile grid and shaped for
    # aligned (8, 128) blocks.  Row fractions carry the same clamped halo as
    # the row selectors, so a duplicated edge row is bit-identical.  The
    # hybrid mode stores them phase-planar: [t, :, 128*b + j] holds the
    # fraction of output column t*ti + qx*j + b.
    ppx_arr = np.zeros((8, nx * ti), np.float32)
    if xp is not None:
        for t in range(nx):
            for b in range(qx_h):
                idx = np.clip(t * ti + qx_h * np.arange(128) + b, 0, wout - 1)
                ppx_arr[:, t * ti + 128 * b:t * ti + 128 * (b + 1)] = px[idx][None, :]
    else:
        ppx_arr[:, :wout] = px[None, :]
    if row_plan is not None:
        ppy_arr = ppy_op.astype(jnp.float32)
        if ppy_arr.shape != (ny * tj_e, 128):
            raise ValueError(
                f"row plan ppy is {ppy_arr.shape}, want {(ny * tj_e, 128)}"
            )
        rs_arr = rs_op.astype(jnp.int32)
    else:
        ppy_arr = np.zeros((ny * tj_e, 128), np.float32)
        for t in range(ny):
            idx = np.clip(np.arange(t * tj - rhalo, t * tj - rhalo + tj_e), 0, hout - 1)
            ppy_arr[t * tj_e:(t + 1) * tj_e, :] = py[idx][:, None]
        ppy_arr = jnp.asarray(ppy_arr)
        rs_arr = jnp.asarray(row_starts)
    ppx_arr = jnp.asarray(ppx_arr)

    sharp = float(rcon.sharpness) if rcon is not None else 0.0

    epi = epilogue
    if epi is not None and epi.is_noop:
        epi = None
    if epi is not None and row_plan is not None and row_offset is None:
        raise ValueError(
            "fused epilogue under a sharded row plan needs row_offset (the "
            "TEPD hash, dither page, and grain use global coordinates)"
        )
    dyn_off = row_offset is not None
    roff_arr = (
        jnp.asarray(row_offset, jnp.int32).reshape(1) if dyn_off else None
    )
    frame_arr = grain_arr = None
    if epi is not None:
        if epi.needs_frame:
            frame_arr = jnp.asarray(
                0 if frame is None else frame, jnp.int32
            ).reshape(1)
        if epi.needs_grain:
            if grain is None:
                raise ValueError("epilogue.grain_amount != 0 requires grain")
            grain_arr = jnp.asarray(grain, jnp.float32)
            if grain_arr.shape != (3, hout, wout):
                raise ValueError(
                    f"grain must be (3, {hout}, {wout}), got {grain_arr.shape}"
                )
    dith_arr = None
    if epi is not None and epi.needs_dither_tex:
        if dither_page is None:
            raise ValueError("epilogue.dither_texture requires dither_page")
        pg = jnp.asarray(dither_page, jnp.float32)
        if pg.shape != (128, 128):
            raise ValueError("dither_page must be (128, 128)")
        if ti % 128:
            raise DitherTileError(
                "tile width incompatible with the 128-wide dither page"
            )
        rr = -(-tj // 128) * 128
        dith_arr = jnp.tile(pg[None], (1, rr // 128, ti // 128))

    def kernel(rs_ref, cs_ref, cb_ref, src_ref, r_ref, *rest):
        rest = list(rest)
        nscr = 5 if apply_rcas else 2
        scratch = rest[-nscr:]
        out_ref = rest[-nscr - 1]
        ins = rest[: -nscr - 1]
        st_ref = ci_ref = frame_ref = grain_ref = roff_ref = None
        if not col_gather and xp is None:
            st_ref = ins.pop(0)
        ppx_ref = ins.pop(0)
        ppy_ref = ins.pop(0)
        if col_gather:
            ci_ref = ins.pop(0)
        if frame_arr is not None:
            frame_ref = ins.pop(0)
        if roff_arr is not None:
            roff_ref = ins.pop(0)
        if grain_arr is not None:
            grain_ref = ins.pop(0)
        dith_ref = None
        if dith_arr is not None:
            dith_ref = ins.pop(0)
        if apply_rcas:
            tile, e_prev, e_cur, lastcol, sem = scratch
        else:
            tile, sem = scratch

        def store_cast(res):
            if u8_out:
                return epilogue_mod.encode_unorm8(res)
            if u16_out:
                return epilogue_mod.encode_unorm10(res)
            return res.astype(dt)

        def run_epilogue(res, out_ty, out_tx):
            """res: (nc, tj, ti) output rows of tile (out_ty, out_tx).
            Epilogue post-ops are color-space transforms: RGB only, alpha
            rides along untouched."""
            al = None
            if has_alpha:
                res, al = res[:3], res[3:]
            row_off = roff_ref[0] if roff_ref is not None else 0
            rlane = jax.lax.broadcasted_iota(jnp.int32, (1, tj, ti), 2)
            rrow = row_off + out_ty * tj + jax.lax.broadcasted_iota(
                jnp.int32, (1, tj, ti), 1
            )
            dit = None
            if dith_ref is not None:
                rr = dith_ref.shape[1]
                # Global plane row: the 128-row page tiles periodically, so
                # a sharded row offset folds straight into the roll.
                sh = jnp.remainder(row_off + out_ty * tj, 128)
                dit = pltpu.roll(
                    dith_ref[:, :, :], jnp.remainder(-sh, rr), axis=1
                )[0][:tj]
            out = epilogue_mod.apply(
                res, rrow, out_tx * ti + rlane,
                frame_ref[0] if frame_ref is not None else 0,
                grain_ref[:, :, :] if grain_ref is not None else None,
                epi, dit=dit,
            )
            if al is not None:
                out = jnp.concatenate([out, al], axis=0)
            return out
        bi = pl.program_id(0)
        ty = pl.program_id(1)
        tx = pl.program_id(2)
        txc = jnp.minimum(tx, nx - 1)
        rstart = pl.multiple_of(rs_ref[ty], 8)
        cstart = pl.multiple_of(cs_ref[txc], 128)

        def lshift(arr, k, axis):
            """result[i] = arr[i + k] (data shifts)."""
            if k == 0:
                return arr
            if jnp.dtype(arr.dtype).itemsize < 4:
                return lshift(arr.astype(jnp.float32), k, axis).astype(arr.dtype)
            return pltpu.roll(arr, (arr.shape[axis] - k) % arr.shape[axis], axis=axis)

        def rshift(arr, k, axis):
            """result[i] = arr[i - k] (one-hot selector shifts)."""
            if k == 0:
                return arr
            if jnp.dtype(arr.dtype).itemsize < 4:
                return rshift(arr.astype(jnp.float32), k, axis).astype(arr.dtype)
            return pltpu.roll(arr, k % arr.shape[axis], axis=axis)

        def easu_tile():
            if ikpad:
                # Raw-coordinate plan: starts may reach past the image at
                # the borders; the fetch clamps and the border tiles below
                # recreate the unclamped-window view in VMEM.
                r0 = pl.multiple_of(jnp.clip(rstart, 0, hin - tih), 8)
                c0 = pl.multiple_of(jnp.clip(cstart, 0, win - tiw), 128)
            else:
                r0, c0 = rstart, cstart
            dma = pltpu.make_async_copy(
                src_ref.at[bi, :, pl.ds(r0, tih), pl.ds(c0, tiw)],
                tile, sem,
            )
            dma.start()
            dma.wait()

            def dyn_roll(x, k, axis):
                """result[i] = x[i + k] for a traced shift k (wrap)."""
                if INTERPRET:
                    return jnp.roll(x, -k, axis=axis)
                return pltpu.roll(
                    x, jnp.remainder(-k, x.shape[axis]), axis=axis)

            wide = jnp.dtype(dt).itemsize < 4
            if ikpad and (ik_top0 > 0 or ik_bot0 < ny):
                pred = jnp.bool_(False)
                if ik_top0 > 0:
                    pred = pred | (ty < ik_top0)
                if ik_bot0 < ny:
                    pred = pred | (ty >= ik_bot0)

                @pl.when(pred)
                def _():
                    x = tile[:, :, :]
                    if wide:
                        x = x.astype(jnp.float32)
                    top_b = x[:, 0:1, :]          # raw row 0 when low-clamped
                    bot_b = x[:, tih - 1:tih, :]  # raw row hin-1 when high-clamped
                    u_r = rstart - jnp.clip(rstart, 0, hin - tih)
                    x = dyn_roll(x, u_r, 1)
                    p = jax.lax.broadcasted_iota(jnp.int32, (1, tih, 1), 1)
                    if ik_top0 > 0:
                        x = jnp.where(rstart + p < 0, top_b, x)
                    if ik_bot0 < ny:
                        x = jnp.where(rstart + p > hin - 1, bot_b, x)
                    tile[:, :, :] = x.astype(dt) if wide else x
            if ikpad and (ik_lft0 > 0 or ik_rgt0 < nx):
                pred = jnp.bool_(False)
                if ik_lft0 > 0:
                    pred = pred | (txc < ik_lft0)
                if ik_rgt0 < nx:
                    pred = pred | (txc >= ik_rgt0)

                @pl.when(pred)
                def _():
                    x = tile[:, :, :]
                    if wide:
                        x = x.astype(jnp.float32)
                    left_b = x[:, :, 0:1]
                    right_b = x[:, :, tiw - 1:tiw]
                    u_c = cstart - jnp.clip(cstart, 0, win - tiw)
                    x = dyn_roll(x, u_c, 2)
                    q = jax.lax.broadcasted_iota(jnp.int32, (1, 1, tiw), 2)
                    if ik_lft0 > 0:
                        x = jnp.where(cstart + q < 0, left_b, x)
                    if ik_rgt0 < nx:
                        x = jnp.where(cstart + q > win - 1, right_b, x)
                    tile[:, :, :] = x.astype(dt) if wide else x

            if fix is not None:
                # Zero-padded source: replicate the image borders in-VMEM
                # (bit-equal to edge padding — pure copies).  Gated to the
                # tiles whose window actually crosses the image border
                # (~25-30% at 4K), which write the fixed tile back in
                # place; interior tiles skip all of it.
                rlo, rhi, clo, chi = fix
                is_edge = (rstart + tih > rhi + 1) | (cstart + tiw > chi + 1)
                if rlo:
                    is_edge = is_edge | (rstart < rlo)
                if clo:
                    is_edge = is_edge | (cstart < clo)

                @pl.when(is_edge)
                def _():
                    wide = jnp.dtype(dt).itemsize < 4
                    t0 = tile[:, :, :]
                    x = t0.astype(jnp.float32) if wide else t0
                    gr = rstart + jax.lax.broadcasted_iota(
                        jnp.int32, (1, tih, 1), 1)
                    gc = cstart + jax.lax.broadcasted_iota(
                        jnp.int32, (1, 1, tiw), 2)
                    brow = jnp.clip(rhi - rstart, 0, tih - 1)
                    bcol = jnp.clip(chi - cstart, 0, tiw - 1)
                    # Dynamic boundary row/col via rolls (Mosaic rejects
                    # dynamic vector loads at unprovable offsets).  Rows
                    # fix first; the right column then comes from the
                    # row-fixed tile, so corners replicate the corner
                    # texel.
                    bot = pltpu.roll(
                        x, jnp.remainder(-brow, tih), axis=1)[:, :1, :]
                    if rlo:
                        x = jnp.where(gr < rlo, x[:, rlo:rlo + 1, :], x)
                    x = jnp.where(gr > rhi, bot, x)
                    rgt = pltpu.roll(
                        x, jnp.remainder(-bcol, tiw), axis=2)[:, :, :1]
                    if clo:
                        x = jnp.where(gc < clo, x[:, :, clo:clo + 1], x)
                    x = jnp.where(gc > chi, rgt, x)
                    tile[:, :, :] = x.astype(dt) if wide else x

            tfull = tile[:, :, :]
            if u8_in:
                tfull = tfull.astype(jnp.int32).astype(jnp.float32) * jnp.float32(
                    1.0 / 255.0
                )
            alpha_t = tfull[3].astype(jnp.float32) if has_alpha else None
            tile3 = tfull[:3]
            if prologue == "srtm":
                t3f = tile3.astype(jnp.float32)
                m = jnp.maximum(jnp.maximum(t3f[0], t3f[1]), t3f[2])
                tile3 = (
                    t3f * approx.rcp_fast(m + jnp.float32(1.0))[None]
                ).astype(tile3.dtype)
            lumt = (
                tile3[2].astype(jnp.float32) * 0.5
                + (tile3[0].astype(jnp.float32) * 0.5 + tile3[1].astype(jnp.float32))
            )
            # g index (m, n) = '+'-response at texel (m+1, n+1).
            g_tex = easu_math.easu_texel_response(
                lshift(lumt, 1, 1),                      # a: (m, n+1)
                lshift(lumt, 1, 0),                      # b: (m+1, n)
                lshift(lshift(lumt, 1, 0), 1, 1),        # c: (m+1, n+1)
                lshift(lshift(lumt, 1, 0), 2, 1),        # d: (m+1, n+2)
                lshift(lshift(lumt, 2, 0), 1, 1),        # e: (m+2, n+1)
                fast=True,
            )
            if _ABL == "nog":
                g_tex = (lumt, lumt, lumt)

            r4 = r_ref[0]    # (4*tj_e, tih): row block k selects lfy - 1 + k

            def bf16_dot(a, b):
                return jnp.dot(
                    a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )

            def split3(x):
                """f32 -> three bf16 terms with exact sum (8+8+8 mantissa bits)."""
                x = x.astype(jnp.float32)
                hi = x.astype(jnp.bfloat16)
                r = x - hi.astype(jnp.float32)
                mid = r.astype(jnp.bfloat16)
                lo = r - mid.astype(jnp.float32)
                return hi, mid, lo

            if _ABL == "noselrow":
                # Timing stub (tools/ablation/gather_ablation.py): row
                # selection replaced by a tj_e-row broadcast of the data
                # (WRONG output; measures the row-matmul share on the
                # hybrid path too, where the col-gather selr stub below
                # is not reached).
                def sel_cols(data, onehot):
                    return bf16_dot(
                        data.astype(jnp.bfloat16),
                        onehot.astype(jnp.bfloat16),
                    ) if mm_dt != jnp.float32 else sum(
                        bf16_dot(p, onehot) for p in split3(data))

                def sel_rows(onehot, data):
                    reps = -(-tj_e // data.shape[0])
                    return jnp.concatenate(
                        [data.astype(jnp.float32)] * reps, axis=0)[:tj_e]
            elif mm_dt == jnp.float32:
                def sel_cols(data_f32, onehot):
                    parts = split3(data_f32)
                    return sum(bf16_dot(p, onehot) for p in parts)

                def sel_rows(onehot, data_f32):
                    parts = split3(data_f32)
                    return sum(bf16_dot(onehot, p) for p in parts)
            else:
                def sel_cols(data, onehot):
                    return bf16_dot(data, onehot)

                def sel_rows(onehot, data):
                    return bf16_dot(onehot, data)

            # Selector variants: index k selects (lf + k - 1).
            r_k = {k: r4[k * tj_e:(k + 1) * tj_e] for k in range(4)}

            def sel_rows4(pp, k0, nk):
                """Row-select dy variants k0..k0+nk-1 of one plane with ONE
                tall matmul over the stacked selector, sliced back per dy.
                Bit-exact vs per-dy dots (each output row is the same
                one-hot dot product) at 1/nk the MXU issues; the k-range
                keeps the FLOPs identical to the per-tap dots too."""
                if _ABL == "noselrow":
                    rep = sel_rows(r_k[k0], pp)  # broadcast stub
                    return {k0 + k: rep for k in range(nk)}
                full = sel_rows(r4[k0 * tj_e:(k0 + nk) * tj_e], pp)
                return {
                    k0 + k: full[k * tj_e:(k + 1) * tj_e] for k in range(nk)
                }

            # dy variants used per column offset: tap columns dx -1/+2 feed
            # only dy in {0,1} (selector rows k 1..2), dx 0/+1 feed all
            # four; the quad-g columns feed k 0..1.
            col_rng = {0: (1, 2), 1: (0, 4), 2: (0, 4), 3: (1, 2)}

            if xp is not None:
                # Hybrid X-phase path: deinterleave the tile (and the
                # per-texel g responses) by the source stride, then every
                # phase's tap columns are static rolls of a parity plane.
                tile3f = tile3.astype(jnp.float32)
                srcs = [tile3f[0], tile3f[1], tile3f[2]] + list(g_tex)
                if has_alpha:
                    srcs.append(alpha_t)  # index 6 in D / colplane
                dw = 128 * ((128 + m0max + 127) // 128)
                nbd = dw // 128
                lane = jax.lax.broadcasted_iota(jnp.int32, (tih, 128), 1)
                # D[si][p][:, m] = srcs[si][:, stride*m + p]
                D = []
                for p_src in srcs:
                    dpar = []
                    for par in range(stride_h):
                        blocks = []
                        for w in range(nbd):
                            acc = None
                            for sblk in range(stride_h):
                                v = stride_h * w + sblk
                                if 128 * v >= tiw:
                                    continue
                                idx = stride_h * lane + (
                                    par + 128 * (stride_h * w) - 128 * v)
                                gath = jnp.take_along_axis(
                                    p_src[:, 128 * v:128 * (v + 1)],
                                    jnp.clip(idx, 0, 127), axis=1)
                                m = jnp.logical_and(idx >= 0, idx < 128)
                                acc = gath if acc is None else jnp.where(m, gath, acc)
                            blocks.append(acc)
                        dpar.append(blocks[0] if nbd == 1
                                    else jnp.concatenate(blocks, axis=1))
                    D.append(dpar)

                def colplane(si, ws):
                    # srcs[si] at window col stride*m + ws for plane col m.
                    return lshift(D[si][ws % stride_h], ws // stride_h, 1)[:, :128]

                quad_off = {"s": (0, 0), "t": (0, 1), "u": (1, 0), "v": (1, 1)}
                res_phases = []
                for b in range(qx_h):
                    sel = {
                        (ch, off): sel_rows4(
                            colplane(ch, lfx0[b] + off - 1), k0, nk)
                        for ch in range(3)
                        for off, (k0, nk) in col_rng.items()
                    }
                    taps = {
                        name: jnp.stack(
                            [sel[(ch, dx + 1)][dy + 1] for ch in range(3)],
                            axis=0)
                        for name, (dx, dy) in easu_math.TAP_OFFSETS.items()
                    }
                    gsel = {
                        (c, qdx): sel_rows4(
                            colplane(3 + c, lfx0[b] + qdx - 1), 0, 2)
                        for c in range(3) for qdx in (0, 1)
                    }
                    quad_g = {
                        qk: tuple(gsel[(c, qdx)][qdy] for c in range(3))
                        for qk, (qdy, qdx) in quad_off.items()
                    }
                    ppx_b = ppx_ref[0:1, 128 * b:128 * (b + 1)]
                    ppy = ppy_ref[:, 0:1]
                    res_b = easu_math.easu_resolve(
                        taps, ppx_b, ppy, dtype=jnp.float32,
                        dir_dtype=jnp.float32, fast=True, quad_g=quad_g,
                    )
                    if has_alpha:
                        # Bilinear alpha: same op order as ops.easu.bilinear.
                        asel = {
                            o: sel_rows4(colplane(6, lfx0[b] + o), 1, 2)
                            for o in (0, 1)
                        }
                        atl, abl = asel[0][1], asel[0][2]
                        atr, abr = asel[1][1], asel[1][2]
                        top = atl + (atr - atl) * ppx_b
                        bot = abl + (abr - abl) * ppx_b
                        ares = top + (bot - top) * ppy
                        res_b = jnp.concatenate([res_b, ares[None]], axis=0)
                    res_phases.append(res_b)
                # Interleave the qx phase planes along lanes: per output
                # 128-block one within-vreg gather per phase + selects.
                flat = [r.reshape(nc * tj_e, 128) for r in res_phases]
                lane2 = jax.lax.broadcasted_iota(
                    jnp.int32, (nc * tj_e, 128), 1)
                blocks = []
                for w in range(ti // 128):
                    glob = lane2 + 128 * w
                    idx = glob // qx_h
                    ph = glob - qx_h * idx
                    acc = jnp.take_along_axis(flat[0], idx, axis=1)
                    for b in range(1, qx_h):
                        acc = jnp.where(
                            ph == b, jnp.take_along_axis(flat[b], idx, axis=1),
                            acc)
                    blocks.append(acc)
                return jnp.concatenate(blocks, axis=1).reshape(nc, tj_e, ti)

            quad_off = {"s": (0, 0), "t": (0, 1), "u": (1, 0), "v": (1, 1)}
            ppy = ppy_ref[:, 0:1]   # (tj_e, 1)

            # Column taps: cg[k][ch] = tile_ch at col lfx + k - 1; the g
            # grid is offset by -1 from texels, so g col (lfx + qdx - 1)
            # uses the same index vector with k = qdx.
            if col_gather:
                # Gather AND resolve one 128-lane output block at a time:
                # the live working set is 16 tap/quad planes of (tj_e, 128)
                # instead of (tj_e, ti), which keeps the resolve stream
                # VMEM-resident (the full-width variant measured ~52% of
                # the VPU roofline from scratch spills; this form ~matches
                # the 2x kernel's utilization).
                if use_pack:
                    # Packed-pair planes: two bf16 values per int32 lane, so
                    # one roll + one within-vreg gather serves two logical
                    # source planes.  Bit-exact on this (bf16 matmul) path:
                    # the row-select dot already rounds its data operand to
                    # bf16, so packing applies the same RNE round one stage
                    # earlier (channel planes come from bf16 storage and
                    # round exactly; the f32 g responses get the identical
                    # rounding the dot would apply).  The f32 path keeps the
                    # unpacked split3 route (packing would truncate).
                    # Layout: P0=(r,g) offs 0-3, P1=(b,g0) offs 0-3 (g0 uses
                    # only 0-1), P2=(g1,g2) offs 0-1; alpha stays unpacked.
                    # Channels pack straight from the bf16 tile (no f32
                    # window planes), and the f32 g planes die at their
                    # pack, so the live window set is 3 int32 planes vs the
                    # unpacked path's 6 f32 — the packs also halve the
                    # scoped-vmem steady state.
                    srcs = None
                    psrcs = [
                        _pack2(tile3[0], tile3[1]),
                        _pack2(tile3[2], g_tex[0]),
                        _pack2(g_tex[1], g_tex[2]),
                    ]
                    poffs = [(0, 1, 2, 3), (0, 1, 2, 3), (0, 1)]
                    if has_alpha:
                        psrcs.append(alpha_t)
                else:
                    tile3f = tile3.astype(jnp.float32)
                    srcs = [tile3f[0], tile3f[1], tile3f[2]] + list(g_tex)
                    if has_alpha:
                        srcs.append(alpha_t)  # wins index 6

                def gath(pp, idx):
                    if _ABL in ("nogather", "noroll"):
                        return pp
                    return jnp.take_along_axis(pp, idx, axis=1)

                def selr4(pp, k0, nk):
                    """sel_rows4 with the ablation stubs of the old selr."""
                    if _ABL in ("nogather", "noroll"):
                        reps = -(-tj_e // pp.shape[0])
                        rep = jnp.concatenate([pp] * reps, axis=0)[:tj_e]
                        return {k0 + k: rep for k in range(nk)}
                    return sel_rows4(pp, k0, nk)

                def roll_win(p, shift, sb, wd):
                    ps = p[:, sb:sb + wd]
                    if _ABL == "noroll":
                        return ps[:, :128]
                    if INTERPRET:
                        # jnp.roll twin of the dynamic pltpu.roll
                        # (identical wrap semantics).
                        return jnp.roll(ps, -shift, axis=1)[:, :128]
                    return pltpu.roll(ps, (wd - shift) % wd, axis=1)[:, :128]

                def sel_block(w):
                    """Roll + gather + row-select the tap/quad planes of
                    128-lane output block w."""
                    shift = cb_ref[txc * nblk + w]
                    bidx = jnp.broadcast_to(
                        ci_ref[0, 0:1, 128 * w:128 * (w + 1)], (tih, 128))
                    sb, wd = sbase[w], swid[w]
                    if use_pack:
                        # One roll + gather per packed pair; unpack restores
                        # the exact bf16 values the select dots would round
                        # to, and each unpacked plane is row-selected
                        # immediately so only the (tj_e, 128) dot results
                        # stay live.  Logical srcs: 0=r 1=g 2=b 3..5=g_tex;
                        # selector ranges: channels per col_rng, g (0, 2).
                        wins = [roll_win(p, shift, sb, wd) for p in psrcs]
                        rng_of = {
                            si: (col_rng if si < 3
                                 else {0: (0, 2), 1: (0, 2)})
                            for si in range(6)
                        }
                        sels = {}
                        for pi, offs in enumerate(poffs):
                            for off in offs:
                                hi, lo = _unpack2(gath(wins[pi], bidx + off))
                                for si, pl_ in ((2 * pi, hi),
                                                (2 * pi + 1, lo)):
                                    rng = rng_of[si].get(off)
                                    if rng is not None:
                                        sels[(si, off)] = selr4(pl_, *rng)
                        sel = {(ch, off): sels[(ch, off)]
                               for ch in range(3) for off in col_rng}
                        gsel = {(c, qdx): sels[(3 + c, qdx)]
                                for c in range(3) for qdx in (0, 1)}
                        awin = wins[3] if has_alpha else None
                    else:
                        wins = [roll_win(p, shift, sb, wd) for p in srcs]
                        sel = {
                            (ch, off): selr4(gath(wins[ch], bidx + off),
                                             k0, nk)
                            for ch in range(3)
                            for off, (k0, nk) in col_rng.items()
                        }
                        gsel = {
                            (c, qdx): selr4(gath(wins[3 + c], bidx + qdx),
                                            0, 2)
                            for c in range(3) for qdx in (0, 1)
                        }
                        awin = wins[6] if has_alpha else None
                    taps = {
                        name: jnp.stack(
                            [sel[(ch, dx + 1)][dy + 1] for ch in range(3)],
                            axis=0)
                        for name, (dx, dy) in easu_math.TAP_OFFSETS.items()
                    }
                    quad_g = {
                        qk: tuple(gsel[(c, qdx)][qdy] for c in range(3))
                        for qk, (qdy, qdx) in quad_off.items()
                    }
                    ataps = None
                    if has_alpha:
                        asel = {
                            off: selr4(gath(awin, bidx + off), 1, 2)
                            for off in (1, 2)
                        }
                        ataps = tuple(
                            asel[dx + 1][dy + 1]
                            for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1))
                        )
                    return taps, quad_g, ataps

                # Software-pipelined over blocks: block w+1's selection
                # (rolls + gathers + MXU dots) is emitted before block w's
                # resolve so Mosaic can overlap the MXU/gather stream with
                # the pure-VPU resolve stream.
                res_blocks = []
                cur = sel_block(0)
                for w in range(nblk):
                    nxt = sel_block(w + 1) if w + 1 < nblk else None
                    taps, quad_g, ataps = cur
                    ppx_w = ppx_ref[0:1, 128 * w:128 * (w + 1)]
                    res_w = easu_math.easu_resolve(
                        taps, ppx_w, ppy, dtype=jnp.float32,
                        dir_dtype=jnp.float32, fast=True, quad_g=quad_g,
                    )
                    if has_alpha:
                        atl, atr, abl, abr = ataps
                        top = atl + (atr - atl) * ppx_w
                        bot = abl + (abr - abl) * ppx_w
                        ares = top + (bot - top) * ppy
                        res_w = jnp.concatenate([res_w, ares[None]], axis=0)
                    res_blocks.append(res_w)
                    cur = nxt
                if nblk == 1:
                    return res_blocks[0]
                return jnp.concatenate(res_blocks, axis=2)

            st0 = st_ref[0]  # (tiw, ti): selects source col lfx - 1
            st_k = {k: rshift(st0, k, 0) for k in range(4)}
            cg = {k: [sel_cols(tile3[ch], st_k[k]) for ch in range(3)]
                  for k in range(4)}
            cgg = {qdx: [sel_cols(comp, st_k[qdx]) for comp in g_tex]
                   for qdx in (0, 1)}

            sel = {
                (ch, off): sel_rows4(cg[off][ch], *col_rng[off])
                for ch in range(3) for off in range(4)
            }
            taps = {
                name: jnp.stack(
                    [sel[(ch, dx + 1)][dy + 1] for ch in range(3)], axis=0)
                for name, (dx, dy) in easu_math.TAP_OFFSETS.items()
            }
            gsel = {
                (c, qdx): sel_rows4(cgg[qdx][c], 0, 2)
                for c in range(3) for qdx in (0, 1)
            }
            quad_g = {
                qk: tuple(gsel[(c, qdx)][qdy] for c in range(3))
                for qk, (qdy, qdx) in quad_off.items()
            }

            ppx = ppx_ref[0:1, :]   # (1, ti)

            # Math is f32 in-kernel (taps arrive f32 from the f32-accumulating
            # dots); compute_dtype controls storage only.
            res = easu_math.easu_resolve(
                taps, ppx, ppy, dtype=jnp.float32, dir_dtype=jnp.float32,
                fast=True, quad_g=quad_g,
            )
            if has_alpha:
                ca = {k: sel_cols(alpha_t, st_k[k]) for k in (1, 2)}
                asel = {k: sel_rows4(ca[k], 1, 2) for k in (1, 2)}
                atl, abl = asel[1][1], asel[1][2]
                atr, abr = asel[2][1], asel[2][2]
                top = atl + (atr - atl) * ppx
                bot = abl + (abr - abl) * ppx
                ares = top + (bot - top) * ppy
                res = jnp.concatenate([res, ares[None]], axis=0)
            return res

        if not apply_rcas:
            res = easu_tile()
            if epi is not None:
                res = run_epilogue(res, ty, tx)
            out_ref[0, :, :, :] = store_cast(res)
            return

        # --- EASU for tile tx (skipped on the drain step tx == nx).
        @pl.when(tx < nx)
        def _():
            e_cur[:, :, :] = easu_tile()

        # --- RCAS for tile tx - 1: both of its column neighbors now exist
        # (left edge via the lastcol ring, right edge via e_cur).
        @pl.when(tx > 0)
        def _():
            ep = e_prev[:, :, :]
            ec = e_cur[:, :, :]
            # RCAS sharpens RGB only; alpha (channel 3) passes through.
            ep3 = ep[:3]
            ec3 = ec[:3]
            n = ep.shape[-1]
            b = pltpu.roll(ep3, 1, axis=1)       # b[j] = ep3[j-1]
            hh = pltpu.roll(ep3, tj_e - 1, axis=1)  # h[j] = ep3[j+1]
            d = pltpu.roll(ep3, 1, axis=2)       # d[i] = ep3[i-1]
            f = pltpu.roll(ep3, n - 1, axis=2)   # f[i] = ep3[i+1]
            lane = jax.lax.broadcasted_iota(jnp.int32, (1,) + ep.shape[1:], 2)
            # Left boundary column: E(tx-2)'s last column from the ring.
            lc = lastcol[:, :, :]
            if ti > 128:
                lc = jnp.concatenate(
                    [lc, jnp.zeros((3, tj_e, ti - 128), jnp.float32)], axis=2
                )
            d = jnp.where(lane == 0, lc, d)
            # Right boundary column: E(tx)'s first column (rolled to lane
            # ti-1).  On the drain step e_cur is stale, but that lane is
            # either past wout (ragged last tile; selectors already clamp)
            # or clamped to the center below.
            f = jnp.where(lane == n - 1, pltpu.roll(ec3, n - 1, axis=2), f)

            gcol = (tx - 1) * ti + lane
            d = jnp.where(gcol == 0, ep3, d)
            f = jnp.where(gcol == wout - 1, ep3, f)
            res = easu_math.rcas_resolve(
                b, d, ep3, f, hh, sharp, denoise=denoise, fast=True
            )[:, rhalo:rhalo + tj, :]
            if has_alpha:
                res = jnp.concatenate(
                    [res, ep[3:, rhalo:rhalo + tj, :]], axis=0
                )
            if epi is not None:
                res = run_epilogue(res, ty, tx - 1)
            out_ref[0, :, :, :] = store_cast(res)

        # --- Ring updates (read-before-write order is preserved above).
        lastcol[:, :, :] = pltpu.roll(
            e_prev[:, :, :][:3], 1, axis=2
        )[:, :, :128]
        e_prev[:, :, :] = e_cur[:, :, :]

    tile_shape = (nc, tih, tiw)
    if apply_rcas:
        scratch_shapes = [
            pltpu.VMEM(tile_shape, jnp.uint8 if u8_in else dt),
            pltpu.VMEM((nc, tj_e, ti), jnp.float32),
            pltpu.VMEM((nc, tj_e, ti), jnp.float32),
            pltpu.VMEM((3, tj_e, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ]
        out_index = lambda bi, ty, tx, *_: (bi, 0, ty, jnp.maximum(tx - 1, 0))
    else:
        scratch_shapes = [
            pltpu.VMEM(tile_shape, jnp.uint8 if u8_in else dt),
            pltpu.SemaphoreType.DMA(()),
        ]
        out_index = lambda bi, ty, tx, *_: (bi, 0, ty, tx)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),  # src
        pl.BlockSpec((1, 4 * tj_e, tih), lambda bi, ty, tx, *_: (ty, 0, 0)),
    ]
    operands = [src, R]
    if St is not None:
        in_specs.append(pl.BlockSpec(
            (1, tiw, ti), lambda bi, ty, tx, *_: (jnp.minimum(tx, nx - 1), 0, 0)))
        operands.append(St)
    in_specs += [
        pl.BlockSpec((8, ti),
                     lambda bi, ty, tx, *_: (0, jnp.minimum(tx, nx - 1))),
        pl.BlockSpec((tj_e, 128), lambda bi, ty, tx, *_: (ty, 0)),
    ]
    operands += [ppx_arr, ppy_arr]
    if col_gather:
        in_specs.append(pl.BlockSpec(
            (1, 8, ti), lambda bi, ty, tx, *_: (jnp.minimum(tx, nx - 1), 0, 0)))
        operands.append(cgidx_arr)
    if frame_arr is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(frame_arr)
    if roff_arr is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(roff_arr)
    if grain_arr is not None:
        if apply_rcas:
            gidx = lambda bi, ty, tx, *_: (0, ty, jnp.maximum(tx - 1, 0))
        else:
            gidx = lambda bi, ty, tx, *_: (0, ty, tx)
        in_specs.append(pl.BlockSpec((3, tj, ti), gidx))
        operands.append(grain_arr)
    if dith_arr is not None:
        in_specs.append(pl.BlockSpec(dith_arr.shape, lambda *_: (0, 0, 0)))
        operands.append(dith_arr)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb, ny, nsteps),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nc, tj, ti), out_index),
        scratch_shapes=scratch_shapes,
    )
    # The packed-pair pipeline's pack-time transient (f32 g planes + the
    # int32 packed planes) peaks past Mosaic's 16M default scoped-vmem
    # stack at the wide production plans; the v5e has 128M of VMEM, so
    # raise the kernel's stack budget (operands/scratch are accounted
    # separately by the BlockSpec machinery).
    params = pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, nc, hout, wout), out_dt),
        interpret=INTERPRET,
        compiler_params=params,
    )(rs_arr, jnp.asarray(col_starts), cbase_flat, *operands)
    return out.reshape(batch_dims + (nc, hout, wout))
