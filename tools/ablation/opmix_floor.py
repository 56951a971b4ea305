"""Measured op-mix replay for the fused 2x kernel (VERDICT r4 #1).

The jaxpr-counted roofline (fused_roofline.py) charges mul and add as two
ops while Mosaic pairs many such chains into single FMAs, so the kernel
measures *above* that analytic floor (114% in r4) — a floor you sit above
cannot bound the remaining headroom.  This tool measures the floor
directly: a Pallas kernel replays EXACTLY the production per-tile math
stream —

  luma + easu_texel_response on a (3, tih, tiw) tile,
  4 phases of easu_math.easu_resolve (fast, quad_g path, constant
  phase fractions) on (3, tih, ti) tap stacks,
  4 rcas_resolve calls (fast path) + the global border-clamp selects,

— on operands that are DMA'd once and then stay VMEM-resident (constant
block indices), with NO tap rolls, input DMA per tile, packing, riffle, or
pipeline scratch traffic.  Mosaic compiles the replay with the same FMA
pairing as the real kernel.

One caveat keeps this from being a strict lower bound: the replay rotates
its tap-plane assignment per phase so the dering min/max cannot CSE-fold
to nothing, but that same rotation also BLOCKS the legitimate cross-phase
sharing the production kernel gets (its four phases roll overlapping tap
windows out of one shared tile, and Mosaic CSEs the shared weight
partials).  The replay is therefore the cost of the UNSHARED math stream;
the production kernel can legitimately land below it.

The per-tile shapes and the tile count are derived from the live
kernels/fused._pick_tiles plan at import time, so they track the shipping
plan exactly.

Run on the TPU: python tools/ablation/opmix_floor.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fsr_tpu.core import easu_math
from fsr_tpu.core.constants import EasuConstants, RcasConstants
from fsr_tpu.kernels import fused
from fsr_tpu.utils import profiling

# Production bf16 headline plan (1080p -> 4K), derived from the live
# kernel geometry so the replay's tile count cannot drift from the real
# grid: phase planes are (hout/qy, wout/qx) = 1080x1920, and the replay
# must run ntiles = cdiv(1080, tj) * cdiv(1920, ti) steps to cover the
# headline's pixels.  (The first committed ROOFLINE_r05 run of this tool
# hardcoded NSTEP = 14*5 from a mistaken 540-row plane model — HALF the
# real 27*5 grid of the then-shipping (40, 384) plan, so its 0.700 ms
# "floor" and 63% utilization were unsound; see the artifact's correction
# note.)
_HPL, _WPL = 1080, 1920


def _round_up(v, m):
    return -(-v // m) * m


TJ, TI = fused._pick_tiles(_HPL, _WPL, 2, 2, pack=True)
TIH, TIW = _round_up(TJ + 6, 8), _round_up(TI + 6, 128)
NSTEP = pl.cdiv(_HPL, TJ) * pl.cdiv(_WPL, TI)
PHASES = ((0.75, 0.75), (0.75, 0.25), (0.25, 0.75), (0.25, 0.25))


def replay_ms(easu_only: bool = False) -> float:
    """Device-op ms of the math-only replay at the headline tile count."""

    def kern(tile_ref, taps_ref, quad_ref, out_ref):
        # Per-texel stage: luma + '+'-response, exactly as compute_planes.
        # The five response arguments are DISTINCT operand planes (rolled
        # views in production; rolls are overhead, not math) — identical
        # arguments would let Mosaic fold the l_d - l_c style differences
        # to zero and delete the response math.
        tile5 = tile_ref[:, :, :]
        lumt = tile5[2] * 0.5 + (tile5[0] * 0.5 + tile5[1])
        g_tex = easu_math.easu_texel_response(
            tile5[3], tile5[4], lumt, tile5[0], tile5[1], fast=True
        )
        gsum = (g_tex[0] + g_tex[1] + g_tex[2])[:, :TI]

        res_ab = []
        for p, (ppy_c, ppx_c) in enumerate(PHASES):
            # Rotate the tap-plane assignment per phase: production phases
            # resolve on four DIFFERENT shifted tap sets, so the dering
            # min/max over {f,g,j,k} must not CSE-share across phases.
            taps = {
                name: taps_ref[(i + 3 * p) % 12, :, :, :]
                for i, name in enumerate(easu_math.TAP_OFFSETS)
            }
            # Consume the response output so it stays live (one extra add
            # on one quad component vs production; ~0.05% of the budget).
            quad_g = {
                qk: (
                    quad_ref[q, 0] + (gsum if q == 0 and p == 0 else 0.0),
                    quad_ref[q, 1],
                    quad_ref[q, 2],
                )
                for q, qk in enumerate(("s", "t", "u", "v"))
            }
            ppx = jnp.full((1, 1), ppx_c, jnp.float32)
            ppy = jnp.full((1, 1), ppy_c, jnp.float32)
            res = easu_math.easu_resolve(
                taps, ppx, ppy, dtype=jnp.float32, dir_dtype=jnp.float32,
                fast=True, quad_g=quad_g,
            )
            res_ab.append(res)

        if easu_only:
            acc = res_ab[0]
            for r in res_ab[1:]:
                acc = acc + r
            out_ref[:, :, :] = acc[:, :TJ, :]
            return

        # RCAS stage: 4 resolves on distinct VMEM planes + the production
        # border-clamp selects (global output coordinates).
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, TJ, TI), 2)
        jrow = jax.lax.broadcasted_iota(jnp.int32, (1, TJ, TI), 1)
        acc = None
        for p in range(4):
            a, b = p // 2, p % 2
            e3 = res_ab[p][:, 1:1 + TJ, :]
            bt = res_ab[(p + 1) % 4][:, 1:1 + TJ, :]
            ht = res_ab[(p + 2) % 4][:, 1:1 + TJ, :]
            dtp = res_ab[(p + 3) % 4][:, 1:1 + TJ, :]
            ftp = res_ab[p][:, 2:2 + TJ, :]
            grow = jrow * 2 + a
            gcol = lane * 2 + b
            if a == 0:
                bt = jnp.where(grow == 0, e3, bt)
            if a == 1:
                ht = jnp.where(grow == 2159, e3, ht)
            if b == 0:
                dtp = jnp.where(gcol == 0, e3, dtp)
            if b == 1:
                ftp = jnp.where(gcol == 3839, e3, ftp)
            r = easu_math.rcas_resolve(
                bt, dtp, e3, ftp, ht, 0.8409, denoise=False, fast=True
            )
            acc = r if acc is None else acc + r
        out_ref[:, :, :] = acc

    rng = np.random.default_rng(0)
    tile = jnp.asarray(rng.uniform(0.1, 0.9, (5, TIH, TIW)), jnp.float32)
    taps = jnp.asarray(rng.uniform(0.1, 0.9, (12, 3, TIH, TI)), jnp.float32)
    quad = jnp.asarray(rng.uniform(0.1, 0.9, (4, 3, TIH, TI)), jnp.float32)

    f = jax.jit(lambda t, tp, q: pl.pallas_call(
        kern,
        grid=(NSTEP,),
        in_specs=[
            pl.BlockSpec((5, TIH, TIW), lambda i: (0, 0, 0)),
            pl.BlockSpec((12, 3, TIH, TI), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((4, 3, TIH, TI), lambda i: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((3, TJ, TI), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((3, TJ, TI), jnp.float32),
        # Same scoped-vmem budget as the production kernel: the (120, 640)
        # plan's operand blocks alone exceed Mosaic's 16M default.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
    )(t, tp, q))
    return min(
        sum(profiling.op_times(
            lambda: f(tile, taps, quad).block_until_ready(), iters=4
        ).values())
        for _ in range(3)
    )


def replay_shared_ms() -> float:
    """TRUE floor: the production dataflow with the cheapest possible tap
    access.  One VMEM-resident tile; every tap/response plane is a STATIC
    SLICE of it (production pays pltpu.roll lane/sublane rotates instead);
    the g response is computed once per texel and sliced per phase/quad
    exactly as compute_planes shares it; the four phases share tile and
    response, so Mosaic gets the same cross-phase CSE as production.  The
    kernel cannot beat this number: it executes the identical math graph
    plus rolls, DMA, assembly, and pipeline work."""
    RY, RX = (0, 1), (0, 1)  # per-phase source alignment (2x exact)

    def kern(tile_ref, out_ref):
        tile3 = tile_ref[:, :, :]  # (3, TIH+8, TIW) f32
        lumt = tile3[2] * 0.5 + (tile3[0] * 0.5 + tile3[1])
        hg, wg = TIH + 4, TI + 4

        def lum_at(dy, dx):
            return lumt[dy:dy + hg, dx:dx + wg]

        g_tex = easu_math.easu_texel_response(
            lum_at(0, 1), lum_at(1, 0), lum_at(1, 1), lum_at(1, 2),
            lum_at(2, 1), fast=True,
        )
        quad_off = {"s": (0, 0), "t": (0, 1), "u": (1, 0), "v": (1, 1)}

        res_ab = []
        for p, (ppy_c, ppx_c) in enumerate(PHASES):
            a, b = p // 2, p % 2
            taps = {
                name: tile3[:, RY[a] + dy + 1:RY[a] + dy + 1 + TIH,
                            RX[b] + dx + 2:RX[b] + dx + 2 + TI]
                for name, (dx, dy) in easu_math.TAP_OFFSETS.items()
            }
            quad_g = {
                qk: tuple(
                    comp[RY[a] + qdy:RY[a] + qdy + TIH,
                         RX[b] + qdx:RX[b] + qdx + TI]
                    for comp in g_tex
                )
                for qk, (qdy, qdx) in quad_off.items()
            }
            ppx = jnp.full((1, 1), ppx_c, jnp.float32)
            ppy = jnp.full((1, 1), ppy_c, jnp.float32)
            res_ab.append(easu_math.easu_resolve(
                taps, ppx, ppy, dtype=jnp.float32, dir_dtype=jnp.float32,
                fast=True, quad_g=quad_g,
            ))

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, TJ, TI), 2)
        jrow = jax.lax.broadcasted_iota(jnp.int32, (1, TJ, TI), 1)
        acc = None
        for p in range(4):
            a, b = p // 2, p % 2
            e3 = res_ab[p][:, 1:1 + TJ, :]
            bt = res_ab[(p + 1) % 4][:, 1:1 + TJ, :]
            ht = res_ab[(p + 2) % 4][:, 1:1 + TJ, :]
            dtp = res_ab[(p + 3) % 4][:, 1:1 + TJ, :]
            ftp = res_ab[p][:, 2:2 + TJ, :]
            grow = jrow * 2 + a
            gcol = lane * 2 + b
            if a == 0:
                bt = jnp.where(grow == 0, e3, bt)
            if a == 1:
                ht = jnp.where(grow == 2159, e3, ht)
            if b == 0:
                dtp = jnp.where(gcol == 0, e3, dtp)
            if b == 1:
                ftp = jnp.where(gcol == 3839, e3, ftp)
            r = easu_math.rcas_resolve(
                bt, dtp, e3, ftp, ht, 0.8409, denoise=False, fast=True
            )
            acc = r if acc is None else acc + r
        out_ref[:, :, :] = acc

    rng = np.random.default_rng(1)
    tile = jnp.asarray(rng.uniform(0.1, 0.9, (3, TIH + 8, TIW)), jnp.float32)
    f = jax.jit(lambda t: pl.pallas_call(
        kern,
        grid=(NSTEP,),
        in_specs=[pl.BlockSpec((3, TIH + 8, TIW), lambda i: (0, 0, 0))],
        out_specs=pl.BlockSpec((3, TJ, TI), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((3, TJ, TI), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
    )(t))
    return min(
        sum(profiling.op_times(
            lambda: f(tile).block_until_ready(), iters=4
        ).values())
        for _ in range(3)
    )


def kernel_ms() -> float:
    in_hw, out_hw = (1080, 1920), (2160, 3840)
    con = EasuConstants.create((in_hw[1], in_hw[0]), None,
                               (out_hw[1], out_hw[0]))
    rcon = RcasConstants(0.25)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (3, *in_hw)).astype(np.float32)
    ).astype(jnp.bfloat16)
    f = jax.jit(lambda z: fused.upscale_fused(
        z, out_hw, con, rcon, compute_dtype=jnp.bfloat16))
    return min(
        sum(profiling.op_times(
            lambda: f(x).block_until_ready(), iters=4).values())
        for _ in range(3)
    )


def main():
    fs = replay_shared_ms()
    fl = replay_ms()
    fe = replay_ms(easu_only=True)
    km = kernel_ms()
    px = 2160 * 3840
    print(f"plan (tj, ti, tih, tiw): ({TJ}, {TI}, {TIH}, {TIW}), "
          f"{NSTEP} tiles")
    print(f"shared-dataflow floor (slice taps):        {fs:.3f} ms")
    print(f"unshared-math replay (full op mix):        {fl:.3f} ms")
    print(f"unshared-math replay (EASU resolve only):  {fe:.3f} ms")
    print(f"production kernel (bf16-in headline):      {km:.3f} ms")
    print(f"overhead vs shared floor (rolls+DMA+asm):  {km - fs:.3f} ms"
          f"  ({(km - fs) / km * 100:.1f}% of kernel)")
    print(f"utilization vs shared floor:               {fs / km * 100:.0f}%")
    print(f"kernel vs unshared replay:                 {km / fl * 100:.0f}%"
          f"  (<100% = cross-phase CSE + schedule beat the unshared stream)")
    print(f"implied math throughput at shared floor: "
          f"{410.75 * px / (fs * 1e-3) / 1e12:.2f} T counted-el-ops/s")


if __name__ == "__main__":
    main()
