"""EASU/RCAS resolve math, shared by the XLA ops layer and Pallas kernels.

The reference expresses EASU as a per-pixel scalar program over 12 taps
(FsrEasuF, /root/reference/ffx-fsr/ffx_fsr1.h:315-437).  On TPU the same
program is a set of elementwise VPU ops over whole tap *planes*: the caller
materializes the 12 tap planes (by XLA gather, or by shifted VMEM slices
inside a Pallas kernel) and this module runs the filter math on them.  This
keeps one canonical implementation of the math that both execution paths —
and their tests — share.

Dtype policy:
- float32: uses the reference's bit-trick approximations (exact parity path).
- float16: FsrEasuH semantics (fp16 tricks, exact-rounded rcp in the set
  stage per ffx_fsr1.h:489).
- bfloat16: no reference analog; uses native rsqrt/rcp (bit tricks do not
  exist for bf16), tuned for VPU throughput.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
from jax import lax

from fsr_tpu.core import approx
from fsr_tpu.core.constants import FSR_RCAS_LIMIT

__all__ = ["TAP_OFFSETS", "EASU_QUADS", "easu_resolve", "rcas_resolve"]

# Stage-knockout set for tools/ablation/fused_stage_ablation.py ONLY.
# Settable solely by assigning the module global from Python (no env hook:
# a stray environment variable must never corrupt production output);
# tools/verify_on_tpu.py asserts it is empty.  Every knockout keeps the
# dataflow shape (substitutes a cheap data-dependent stand-in) so Mosaic
# cannot constant-fold the downstream pipeline away — output is WRONG
# under any knockout; this measures cost, not correctness.
_ABLATION_STAGES: frozenset = frozenset()

# (dx, dy) offsets from 'f' for the 12-tap footprint, in FsrEasuF
# accumulation order (ffx_fsr1.h:423-434).
TAP_OFFSETS: Dict[str, Tuple[int, int]] = {
    "b": (0, -1),
    "c": (1, -1),
    "i": (-1, 1),
    "j": (0, 1),
    "f": (0, 0),
    "e": (-1, 0),
    "k": (1, 1),
    "l": (2, 1),
    "h": (2, 0),
    "g": (1, 0),
    "o": (1, 2),
    "n": (0, 2),
}

# Quadrant '+' patterns: (bilinear-weight key, (lA, lB, lC, lD, lE)) as in the
# four FsrEasuSetF calls (ffx_fsr1.h:383-386).
EASU_QUADS = (
    ("s", ("b", "e", "f", "g", "j")),
    ("t", ("c", "f", "g", "h", "k")),
    ("u", ("f", "i", "j", "k", "n")),
    ("v", ("g", "j", "k", "l", "o")),
)

Planes = Dict[str, Tuple[jnp.ndarray, ...]]  # tap name -> per-channel planes


def _consts(dt):
    return lambda v: jnp.asarray(v, dt)


def _sat(x):
    """HLSL saturate: clamp to [0,1] with NaN -> 0.

    The fp16 set stage can produce 0 * INF = NaN (exact rcp of a zero
    gradient); the reference relies on GPU saturate flushing NaN to 0.
    For finite inputs this is identical to jnp.clip(x, 0, 1).
    """
    dt = x.dtype
    return jnp.where(x > jnp.asarray(0.0, dt), jnp.minimum(x, jnp.asarray(1.0, dt)), jnp.asarray(0.0, dt))


def _nan_drop_max(a, b):
    """HLSL max semantics: if one operand is NaN, return the other."""
    return jnp.maximum(jnp.where(jnp.isnan(a), b, a), jnp.where(jnp.isnan(b), a, b))


def _set_rcp(x, dt, exact: bool, hi_rcp=None):
    hi_rcp = hi_rcp or approx.rcp
    if exact:
        return hi_rcp(x)
    if dt == jnp.float32:
        return approx.prx_lo_rcp(x)
    if dt == jnp.float16:
        # FsrEasuSetH uses ARcpH2 (hardware rcp), not the bit trick
        # (ffx_fsr1.h:489); exact-rounded divide is the oracle contract.
        return hi_rcp(x)
    return hi_rcp(x)


def _lo_rsq(x, dt):
    if dt in (jnp.float32, jnp.float16):
        return approx.prx_lo_rsq(x)
    return lax.rsqrt(x)


def _lo_rcp(x, dt, hi_rcp=None):
    if dt in (jnp.float32, jnp.float16):
        return approx.prx_lo_rcp(x)
    return (hi_rcp or approx.rcp)(x)


def _sat_fastpath(x, dt, hi_rcp_used: bool):
    """Plain clamp when NaN is impossible (f32 bit-trick rcp is finite at 0);
    NaN-flushing select otherwise."""
    if dt == jnp.float32 and not hi_rcp_used:
        return jnp.clip(x, jnp.asarray(0.0, dt), jnp.asarray(1.0, dt))
    return _sat(x)


def easu_texel_response(l_a, l_b, l_c, l_d, l_e, fast: bool = False):
    """Per-texel '+'-pattern direction/length response.

    FsrEasuSetF's quadrant contribution factors as w_q(pp) * g(texel): g
    depends only on the texel's luma neighborhood, so kernels evaluate it
    once per *input* texel and blend four shifted slices per output phase —
    4x less set-stage work than evaluating per output pixel, with bit-equal
    accumulation order.

    Returns (gx, gy, glen_x, glen_y), or (gx, gy, glen_x + glen_y) when
    fast=True: both length responses accumulate into the same sum with the
    same quadrant weight (ffx_fsr1.h:305/312), so pre-adding them per texel
    saves one blend FMA per quadrant per output pixel (a ~1-ulp
    reassociation, kernels only).
    """
    dt = l_c.dtype
    hi_rcp = approx.rcp_fast if fast else approx.rcp
    prx = dt == jnp.float32  # _set_rcp uses the finite bit trick for f32
    dc = l_d - l_c
    cb = l_c - l_b
    len_x = _set_rcp(jnp.maximum(jnp.abs(dc), jnp.abs(cb)), dt, exact=False, hi_rcp=hi_rcp)
    gx = l_d - l_b
    len_x = _sat_fastpath(jnp.abs(gx) * len_x, dt, hi_rcp_used=not prx)
    len_x = len_x * len_x
    ec = l_e - l_c
    ca = l_c - l_a
    len_y = _set_rcp(jnp.maximum(jnp.abs(ec), jnp.abs(ca)), dt, exact=False, hi_rcp=hi_rcp)
    gy = l_e - l_a
    len_y = _sat_fastpath(jnp.abs(gy) * len_y, dt, hi_rcp_used=not prx)
    len_y = len_y * len_y
    if fast:
        return gx, gy, len_x + len_y
    return gx, gy, len_x, len_y


def easu_resolve(
    taps: Planes,
    ppx: jnp.ndarray,
    ppy: jnp.ndarray,
    dtype=None,
    dir_dtype=jnp.float32,
    fast: bool = False,
    quad_g=None,
) -> Tuple[jnp.ndarray, ...]:
    """Run the EASU filter on pre-gathered tap planes.

    quad_g: optional dict quad-key ('s','t','u','v') -> per-texel response
    tuple from easu_texel_response, pre-sliced to the plane shape; when
    given, the set stage becomes a pure bilinear blend (same accumulation
    order, bit-equal in f32).

    taps: dict tap-name -> tuple of channel planes (any number of channels,
      typically (R, G, B)); every plane has the same spatial shape.
    ppx/ppy: subpixel position of the output sample inside the f..k quad,
      broadcastable to the plane shape, float32 (cast internally).
    dtype: tap-weighting/color-accumulation dtype (the bulk of the ALU work).
    dir_dtype: dtype of the direction/length estimation pipeline.  Default
      float32: the reference's fp16 path (FsrEasuH) runs this stage in fp16
      and visibly degrades on high-frequency content (>1/255 vs the fp32
      ref); on TPU the fp32 set stage costs little, so low-precision modes
      keep it in fp32 by default.  Pass dir_dtype=float16 for strict FsrEasuH
      emulation.

    Returns a tuple of resolved channel planes.
    """
    # Channels: taps[name] is either a tuple of per-channel planes, or a
    # single stacked (C, H, W) array (kernels prefer stacked: one vector op
    # per stage instead of one per channel).
    stacked = not isinstance(taps["f"], (tuple, list))
    first = taps["f"] if stacked else taps["f"][0]
    dt = jnp.dtype(dtype) if dtype is not None else first.dtype
    ddt = jnp.dtype(dir_dtype)
    c = _consts(dt)
    cd = _consts(ddt)
    nch = first.shape[0] if stacked else len(taps["f"])
    hi_rcp = approx.rcp_fast if fast else approx.rcp

    # Luma*2 (ffx_fsr1.h:362-366): B*0.5 + (R*0.5 + G); with fewer than 3
    # channels, fall back to the mean-ish first channel.
    def luma(planes):
        if nch >= 3:
            return planes[2] * c(0.5) + (planes[0] * c(0.5) + planes[1])
        return planes[0]

    lum = None
    if quad_g is None:
        # luma() indexes per-channel planes and stacked (C, H, W) arrays the
        # same way, and falls back to channel 0 when nch < 3 in both cases.
        lum = {k: luma(v).astype(ddt) for k, v in taps.items()}

    one = cd(1.0)
    ppx_d = ppx.astype(ddt)
    ppy_d = ppy.astype(ddt)
    wq = {
        "s": (one - ppx_d) * (one - ppy_d),
        "t": ppx_d * (one - ppy_d),
        "u": (one - ppx_d) * ppy_d,
        "v": ppx_d * ppy_d,
    }

    # Strict fp16 mode reproduces FsrEasuH's packed accumulation order:
    # quadrants S,U sum into one partial, T,V into another, then add
    # (ffx_fsr1.h:555-558); fp32 (and mixed) use the FsrEasuF order.
    h_order = ddt == jnp.float16 and dt == jnp.float16
    quad_groups = ("su", "tv") if h_order else ("stuv",)
    quads = {q[0]: q for q in EASU_QUADS}

    def accumulate_quads(keys):
        zero_like = lum["f"] if lum is not None else quad_g["s"][0]
        dirx = jnp.zeros_like(zero_like)
        diry = jnp.zeros_like(zero_like)
        length = jnp.zeros_like(zero_like)
        for wkey in keys:
            w = wq[wkey]
            if quad_g is not None:
                if len(quad_g[wkey]) == 3:  # fast: pre-summed length response
                    gx, gy, gl = quad_g[wkey]
                    dirx = dirx + gx * w
                    diry = diry + gy * w
                    length = length + gl * w
                else:
                    gx, gy, glx, gly = quad_g[wkey]
                    dirx = dirx + gx * w
                    length = length + glx * w
                    diry = diry + gy * w
                    length = length + gly * w
                continue
            _, (a, b_, cc, d, e) = quads[wkey]
            l_a, l_b, l_c, l_d, l_e = lum[a], lum[b_], lum[cc], lum[d], lum[e]
            dc = l_d - l_c
            cb = l_c - l_b
            len_x = _set_rcp(jnp.maximum(jnp.abs(dc), jnp.abs(cb)), ddt, exact=False, hi_rcp=hi_rcp)
            dir_x = l_d - l_b
            dirx = dirx + dir_x * w
            len_x = _sat(jnp.abs(dir_x) * len_x)
            length = length + len_x * len_x * w
            ec = l_e - l_c
            ca = l_c - l_a
            len_y = _set_rcp(jnp.maximum(jnp.abs(ec), jnp.abs(ca)), ddt, exact=False, hi_rcp=hi_rcp)
            dir_y = l_e - l_a
            diry = diry + dir_y * w
            len_y = _sat(jnp.abs(dir_y) * len_y)
            length = length + len_y * len_y * w
        return dirx, diry, length

    if "set" in _ABLATION_STAGES:
        f0 = (taps["f"][0] if stacked else taps["f"][0]).astype(ddt)
        dirx, diry, length = f0, f0 * cd(0.5), _sat(f0)
    else:
        parts = [accumulate_quads(g) for g in quad_groups]
        dirx, diry, length = parts[0]
        for p_ in parts[1:]:
            dirx = dirx + p_[0]
            diry = diry + p_[1]
            length = length + p_[2]

    # Direction normalization with zero-protect (ffx_fsr1.h:388-395).
    if "norm" in _ABLATION_STAGES:
        len2_x, len2_y = dirx, diry
        lob, clp = length, dirx
    else:
        dir_r = dirx * dirx + diry * diry
        zro = dir_r < cd(1.0 / 32768.0)
        dir_r = _lo_rsq(dir_r, ddt)
        dir_r = jnp.where(zro, one, dir_r)
        dirx = jnp.where(zro, one, dirx)
        dirx = dirx * dir_r
        diry = diry * dir_r
        length = length * cd(0.5)
        length = length * length
        stretch = (dirx * dirx + diry * diry) * _lo_rcp(jnp.maximum(jnp.abs(dirx), jnp.abs(diry)), ddt)
        len2_x = one + (stretch - one) * length
        len2_y = one + cd(-0.5) * length
        lob = cd(0.5) + cd((1.0 / 4.0 - 0.04) - 0.5) * length
        clp = _lo_rcp(lob, ddt)
    # Hand the per-pixel filter shape to the accumulation dtype.
    dirx = dirx.astype(dt)
    diry = diry.astype(dt)
    len2_x = len2_x.astype(dt)
    len2_y = len2_y.astype(dt)
    lob = lob.astype(dt)
    clp = clp.astype(dt)

    # Dering bounds from the nearest 2x2 {f,g,j,k} (ffx_fsr1.h:416-419).
    if stacked:
        min4 = jnp.minimum(jnp.minimum(taps["f"], taps["g"]), jnp.minimum(taps["j"], taps["k"]))
        max4 = jnp.maximum(jnp.maximum(taps["f"], taps["g"]), jnp.maximum(taps["j"], taps["k"]))
    else:
        min4 = tuple(
            jnp.minimum(jnp.minimum(taps["f"][i], taps["g"][i]), jnp.minimum(taps["j"][i], taps["k"][i]))
            for i in range(nch)
        )
        max4 = tuple(
            jnp.maximum(jnp.maximum(taps["f"][i], taps["g"][i]), jnp.maximum(taps["j"][i], taps["k"][i]))
            for i in range(nch)
        )

    ppx = ppx.astype(dt)
    ppy = ppy.astype(dt)

    # Tap accumulation order: FsrEasuF's single chain, or FsrEasuH's two
    # packed lanes (x: b,i,f,k,h,o / y: c,j,e,l,g,n; ffx_fsr1.h:583-590).
    if h_order:
        tap_groups = (("b", "i", "f", "k", "h", "o"), ("c", "j", "e", "l", "g", "n"))
    else:
        tap_groups = (tuple(TAP_OFFSETS),)

    shape_hw = (lum["f"] if lum is not None else quad_g["s"][0]).shape

    if fast:
        # Tap distance as a quadratic form (kernels only, ~1-2 ulp
        # reassociation): with v = M @ off for the rotation/anisotropy
        # matrix M, d2 = |v|^2 = qa*off_x^2 + qb*off_x*off_y + qc*off_y^2.
        # qa/qb/qc are per-pixel (computed once).  The quadratic is further
        # factored per tap row/column group: with A_dy = off_y*qb,
        # B_dy = off_y^2*qc, C_dx = off_x^2*qa precomputed for the four
        # distinct dy and dx values, each tap needs just two full-shape ops
        # (d2 = C_dx + fma(off_x, A_dy, B_dy)) — which matters when ppx/ppy
        # are per-lane/per-row arrays (the general-ratio kernel); with
        # constant phases everything folds either way.
        lx2 = len2_x * len2_x
        ly2 = len2_y * len2_y
        xx = dirx * dirx
        yy = diry * diry
        xy = dirx * diry
        qa = xx * lx2 + yy * ly2
        qb = (xy + xy) * (lx2 - ly2)
        qc = yy * lx2 + xx * ly2
        off_xs = {dx: c(float(dx)) - ppx for dx in {d for d, _ in TAP_OFFSETS.values()}}
        off_ys = {dy: c(float(dy)) - ppy for dy in {d for _, d in TAP_OFFSETS.values()}}
        a_dy = {dy: oy * qb for dy, oy in off_ys.items()}
        b_dy = {dy: (oy * oy) * qc for dy, oy in off_ys.items()}
        c_dx = {dx: (ox * ox) * qa for dx, ox in off_xs.items()}
        # NOTE (round 4): expanding the two-factor tap weight into one
        # 4-FMA Horner quartic was tried and REVERTED — (lob*m-1)^2 is
        # near-cancelling at the clip point, so the expansion raised the
        # f32 kernel's max-abs vs the oracle from ~1e-6 to ~8e-6, which
        # quadrupled TEPD knife-edge flips and tripped the hardware
        # fidelity sweep, for only ~10 us at 4K.  The factored form below
        # is the keeper.

    def accumulate_taps(names):
        if stacked:
            ac = jnp.zeros_like(taps["f"], dtype=dt)
        else:
            ac = [jnp.zeros_like(taps["f"][i], dtype=dt) for i in range(nch)]
        aw = jnp.zeros(shape_hw, dt)
        for name in names:
            dx, dy = TAP_OFFSETS[name]
            off_x = c(float(dx)) - ppx
            off_y = c(float(dy)) - ppy
            if "weights" in _ABLATION_STAGES:
                w = lob if (dx + dy) % 2 == 0 else clp
                if stacked:
                    ac = ac + taps[name].astype(dt) * w[None]
                else:
                    for i in range(nch):
                        ac[i] = ac[i] + taps[name][i].astype(dt) * w
                aw = aw + w
                continue
            if fast:
                d2 = c_dx[dx] + (off_x * a_dy[dy] + b_dy[dy])
            else:
                vx = (off_x * dirx + off_y * diry) * len2_x
                vy = (off_x * (-diry) + off_y * dirx) * len2_y
                d2 = vx * vx + vy * vy
            if "poly" in _ABLATION_STAGES:
                w = d2
                if stacked:
                    ac = ac + taps[name].astype(dt) * w[None]
                else:
                    for i in range(nch):
                        ac[i] = ac[i] + taps[name][i].astype(dt) * w
                aw = aw + w
                continue
            d2 = jnp.minimum(d2, clp)
            w_a = lob * d2 + c(-1.0)
            w_a = w_a * w_a
            if fast:
                # Horner form of 25/16*(2/5*d2-1)^2 - 9/16 (one op fewer).
                w_b = (c(0.25) * d2 + c(-1.25)) * d2 + c(1.0)
            else:
                w_b = c(2.0 / 5.0) * d2 + c(-1.0)
                w_b = w_b * w_b
                w_b = c(25.0 / 16.0) * w_b + c(-(25.0 / 16.0 - 1.0))
            w = w_b * w_a
            if stacked:
                ac = ac + taps[name].astype(dt) * w[None]
            else:
                for i in range(nch):
                    ac[i] = ac[i] + taps[name][i].astype(dt) * w
            aw = aw + w
        return ac, aw

    tparts = [accumulate_taps(g) for g in tap_groups]
    ac, aw = tparts[0]
    for ac2, aw2 in tparts[1:]:
        if stacked:
            ac = ac + ac2
        else:
            ac = [a + b2 for a, b2 in zip(ac, ac2)]
        aw = aw + aw2

    inv_w = hi_rcp(aw)
    if "dering" in _ABLATION_STAGES:
        if stacked:
            return ac * inv_w[None]
        return tuple(ac[i] * inv_w for i in range(nch))
    if stacked:
        return jnp.minimum(max4, jnp.maximum(min4, ac * inv_w[None]))
    return tuple(
        jnp.minimum(max4[i], jnp.maximum(min4[i], ac[i] * inv_w)) for i in range(nch)
    )


def rcas_resolve(
    taps_b: Sequence[jnp.ndarray],
    taps_d: Sequence[jnp.ndarray],
    taps_e: Sequence[jnp.ndarray],
    taps_f: Sequence[jnp.ndarray],
    taps_h: Sequence[jnp.ndarray],
    sharpness,
    denoise: bool = False,
    fast: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Run the RCAS 5-tap cross on pre-gathered planes (FsrRcasF semantics).

    taps_*: per-channel (R, G, B) planes of the cross (b / d e f / h), or
      stacked (3, H, W) arrays.
    sharpness: linear sharpness (exp2(-stops), RcasConstants.sharpness).
    fast: use the hardware-speed NR reciprocal (Pallas kernels) instead of
      exact division for the "high precision" limiter rcps; both produce the
      same NaN-at-degenerate-input behavior that the lobe max drops.
    """
    stacked = not isinstance(taps_e, (tuple, list))
    if stacked:
        taps_b, taps_d, taps_e, taps_f, taps_h = (
            tuple(t[ch] for ch in range(t.shape[0]))
            for t in (taps_b, taps_d, taps_e, taps_f, taps_h)
        )
    dt = taps_e[0].dtype
    hi_rcp = approx.rcp_fast if fast else approx.rcp
    c = _consts(dt)
    sharp = jnp.asarray(sharpness, dt)

    def luma(p):
        return p[2] * c(0.5) + (p[0] * c(0.5) + p[1])

    if dt in (jnp.float32, jnp.float16):
        med_rcp = approx.prx_med_rcp
    else:
        med_rcp = hi_rcp

    lobe = None
    nz = None
    if denoise:
        # The 5 lumas feed only the noise-detection highpass; computing
        # them unconditionally costs ~15 live VPU ops/px in the fused
        # kernel when denoise is off (Mosaic does not DCE across the
        # stacked-tuple boundary), so they are gated here.
        b_l, d_l, e_l, f_l, h_l = (
            luma(p) for p in (taps_b, taps_d, taps_e, taps_f, taps_h)
        )
        nz = c(0.25) * b_l + c(0.25) * d_l + c(0.25) * f_l + c(0.25) * h_l - e_l
        rng = jnp.maximum(jnp.maximum(jnp.maximum(b_l, d_l), jnp.maximum(e_l, f_l)), h_l) - jnp.minimum(
            jnp.minimum(jnp.minimum(b_l, d_l), jnp.minimum(e_l, f_l)), h_l
        )
        nz = _sat(jnp.abs(nz) * med_rcp(rng))
        nz = c(-0.5) * nz + c(1.0)

    if "rcaslimit" in _ABLATION_STAGES:
        lobe = taps_e[0] * c(-0.01)
    elif fast:
        # Division-light limiter (kernels): algebraically the same solve.
        # With u = min(mn4, e), v = 1 - max(mx4, e), q = 1 - mn4 (all >= 0
        # for in-range input), the reference's
        #   lobe = max_ch(max(-hitMin, hitMax)) = -(1/4) min_ch min(u/mx4, v/q)
        # so the 6 rcps + NaN-drop maxes collapse to cross-multiplied
        # selects and ONE reciprocal; the 1/4 folds into `sharp` exactly
        # (power-of-two scaling commutes bit-for-bit through rcp and mul).
        # NaN semantics (load-bearing: isolated bright pixels spike) carry
        # over exactly: u/mx4 is 0/0 iff mx4 == 0, where u*q < v*mx4 is
        # 0 < 0 = False and the select takes v/q (q = 1 there) — the
        # reference's dropped-NaN branch; v/q is 0/0 iff mn4 == 1, which
        # forces v == 0, so that side is ignored by substituting v = 1
        # (making u*q = 0 < mx4 = 1 pick u/mx4, again the reference's
        # branch).  Selected denominators are therefore always > 0.
        # Select-vs-max disagreements happen only when the two exact
        # ratios are within the rcp's ~1 ulp — either pick is within
        # ~1e-7 of the reference's.
        num = den = None
        one = c(1.0)
        for i in range(3):
            b, d, e, f, h = taps_b[i], taps_d[i], taps_e[i], taps_f[i], taps_h[i]
            mn4 = jnp.minimum(jnp.minimum(b, d), jnp.minimum(f, h))
            mx4 = jnp.maximum(jnp.maximum(b, d), jnp.maximum(f, h))
            u = jnp.minimum(mn4, e)
            v = one - jnp.maximum(mx4, e)
            q = one - mn4
            v_s = jnp.where(q == c(0.0), one, v)
            pick1 = u * q < v_s * mx4
            n_c = jnp.where(pick1, u, v)
            d_c = jnp.where(pick1, mx4, q)
            if num is None:
                num, den = n_c, d_c
            else:
                sw = n_c * den < num * d_c
                num = jnp.where(sw, n_c, num)
                den = jnp.where(sw, d_c, den)
        r = jnp.minimum(jnp.maximum(num * hi_rcp(den), c(0.0)),
                        c(4.0 * FSR_RCAS_LIMIT))
        lobe = r * (sharp * c(-0.25))
    else:
        for i in range(3):
            b, d, e, f, h = taps_b[i], taps_d[i], taps_e[i], taps_f[i], taps_h[i]
            mn4 = jnp.minimum(jnp.minimum(b, d), jnp.minimum(f, h))
            mx4 = jnp.maximum(jnp.maximum(b, d), jnp.maximum(f, h))
            # Limiters need high-precision rcp (ffx_fsr1.h:749).
            # These divisions can hit 0*INF = NaN (e.g. mx4 == 0 under a bright
            # center pixel); GPU max() drops the NaN operand — emulated here.
            # This is load-bearing: it lets RCAS spike isolated bright pixels.
            hit_min = jnp.minimum(mn4, e) * hi_rcp(c(4.0) * mx4)
            hit_max = (c(1.0) - jnp.maximum(mx4, e)) * hi_rcp(c(4.0) * mn4 + c(-4.0))
            lobe_ch = _nan_drop_max(-hit_min, hit_max)
            lobe = lobe_ch if lobe is None else jnp.maximum(lobe, lobe_ch)

    if not fast and "rcaslimit" not in _ABLATION_STAGES:
        lobe = jnp.maximum(c(-FSR_RCAS_LIMIT), jnp.minimum(lobe, c(0.0))) * sharp
    if denoise:
        lobe = lobe * nz
    rcp_l = med_rcp(c(4.0) * lobe + c(1.0))
    if fast:
        # Factor the lobe out of the cross sum (4 ops/channel fewer; the
        # reference's order is kept on the exact path for oracle parity).
        out = tuple(
            (lobe * ((taps_b[i] + taps_d[i]) + (taps_h[i] + taps_f[i])) + taps_e[i]) * rcp_l
            for i in range(3)
        )
    else:
        out = tuple(
            (lobe * taps_b[i] + lobe * taps_d[i] + lobe * taps_h[i] + lobe * taps_f[i] + taps_e[i]) * rcp_l
            for i in range(3)
        )
    return jnp.stack(out, axis=0) if stacked else out
