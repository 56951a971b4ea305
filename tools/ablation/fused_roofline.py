"""Roofline utilization of the fused 2x kernel, measured end to end.

Answers VERDICT r2 #3 quantitatively: how close is the phase-decomposed
EASU+RCAS kernel to the v5e VPU's elementwise-op ceiling?  Three parts:

1. **Per-pixel op count** — counted from the jaxprs of the actual shared
   math (easu_math.easu_resolve fast path, rcas_resolve fast path, the
   per-texel response amortized by texels/pixel), not hand-estimated.
   Primitives that lower to one VPU op count 1; transcendental-free.
2. **Achieved VPU rate** — a Pallas FMA-chain probe (4 independent
   64-FMA chains per element) measured with the same device-op timing as
   bench.py.  FMA counts as one el-op.
3. **Kernel time** — the production kernel at the 1080p->4K bf16 headline.

utilization = (ops_per_px * out_pixels / vpu_rate) / kernel_time.

Reading the result: utilization ABOVE 100% means the kernel retires the
counted op stream faster than the pure-FMA probe rate — the jaxpr count
charges mul and add separately while the VPU fuses many such pairs into
single FMAs (and pairs other op combinations).  v5e measurement
(2026-08): 468 counted ops/px, probe 2.49 T el-ops/s, kernel 1.259 ms =
124% of the non-fused floor.  Conclusion: the 2x kernel is scheduling- and
fusion-saturated; the remaining levers are per-pixel op count (already a
tight 12-tap dual-polynomial stream) or a faster VPU (v5p-class), not
Mosaic scheduling.

Run on the TPU: python tools/ablation/fused_roofline.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from fsr_tpu.core import easu_math
from fsr_tpu.core.constants import EasuConstants, RcasConstants
from fsr_tpu.kernels import fused
from fsr_tpu.utils import profiling

# Primitives that cost one VPU elementwise op (FMA-class or simpler).
_ONE_OP = {
    "add", "sub", "mul", "max", "min", "and", "or", "xor", "select_n",
    "lt", "le", "gt", "ge", "eq", "ne", "neg", "abs", "floor",
    "shift_right_logical", "shift_left", "bitcast_convert_type",
    "convert_element_type", "integer_pow",
}
_FREE = {"broadcast_in_dim", "reshape", "squeeze", "concatenate", "slice",
         "transpose", "copy", "stop_gradient", "pjit", "custom_jvp_call",
         "custom_vjp_call"}


def _count_ops(jaxpr) -> int:
    n = 0
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim in _FREE:
            if prim == "pjit":
                n += _count_ops(eqn.params["jaxpr"].jaxpr)
            continue
        if prim == "convert_element_type":
            # Same-dtype converts are free (the kernels run f32 throughout;
            # the jaxpr carries astype(dt) markers that erase at dt=f32).
            if eqn.invars[0].aval.dtype != eqn.outvars[0].aval.dtype:
                n += 1
            continue
        if prim in _ONE_OP:
            n += 1
        elif prim in ("div", "rsqrt", "sqrt"):
            n += 4  # multi-op on the VPU (Newton/exact sequences)
        else:
            n += 1  # unknown: count conservatively as one
    return n


def ops_per_pixel() -> dict:
    s = jnp.float32(0.5)
    taps = {k: (s, s, s) for k in easu_math.TAP_OFFSETS}
    quad_g = {k: (s, s, s) for k in ("s", "t", "u", "v")}
    jx = jax.make_jaxpr(
        lambda: easu_math.easu_resolve(
            {k: jnp.stack(v) for k, v in taps.items()},
            jnp.full((1, 1), 0.25), jnp.full((1, 1), 0.75),
            dtype=jnp.float32, dir_dtype=jnp.float32, fast=True,
            quad_g=quad_g,
        )
    )()
    easu = _count_ops(jx.jaxpr)
    t3 = jnp.zeros((3, 1, 1), jnp.float32)
    jr = jax.make_jaxpr(
        lambda: easu_math.rcas_resolve(t3, t3, t3, t3, t3, 0.87, fast=True)
    )()
    rcas = _count_ops(jr.jaxpr)
    jt = jax.make_jaxpr(
        lambda: easu_math.easu_texel_response(s, s, s, s, s, fast=True)
    )()
    texel = _count_ops(jt.jaxpr)
    # 2x: one source texel per 4 output pixels; +luma (2 ops/texel).
    per_px = easu + rcas + (texel + 2) * 0.25
    return {"easu_resolve": easu, "rcas_resolve": rcas,
            "texel_response": texel, "per_px": per_px}


def vpu_rate_teops() -> float:
    """Achieved FMA throughput (el-ops/s, FMA=1) via a Pallas probe.

    4 independent accumulator chains of 64 FMAs each — enough ILP to fill
    the VPU pipeline (a single serial chain measures latency, ~3x lower)
    without spilling the vector register file.
    """
    LANES, CHAIN = 4, 64
    K = LANES * CHAIN
    N, W, G = 64, 256, 4096

    def kern(x_ref, o_ref):
        # 4 independent chains on (64, 256) f32 = 16 vregs each: 64 live
        # vregs of accumulators — enough ILP to cover FMA latency without
        # spilling the register file (8 chains of (256, 256) measured 2.3x
        # slower than the production kernel's achieved rate: spill-bound).
        a = x_ref[:, :]
        accs = [a * jnp.float32(1.0 + 1e-7 * i) for i in range(LANES)]
        for _ in range(CHAIN - 1):
            accs = [acc * jnp.float32(1.0000001) + a for acc in accs]
        out = accs[0]
        for acc in accs[1:]:
            out = out + acc
        o_ref[:, :] = out

    x = jnp.asarray(np.random.default_rng(0).random((N, W)), jnp.float32)
    f = jax.jit(lambda z: pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[pl.BlockSpec((N, W), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((N, W), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.float32),
    )(z))
    ms = min(sum(profiling.op_times(lambda: f(x).block_until_ready(),
                                    iters=4).values()) for _ in range(3))
    return K * N * W * G / (ms * 1e-3)


def main():
    ops = ops_per_pixel()
    rate = vpu_rate_teops()
    in_hw, out_hw = (1080, 1920), (2160, 3840)
    con = EasuConstants.create((in_hw[1], in_hw[0]), None,
                               (out_hw[1], out_hw[0]))
    rcon = RcasConstants(0.25)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (3, *in_hw)).astype(np.float32)
    )
    f = jax.jit(lambda z: fused.upscale_fused(
        z, out_hw, con, rcon, compute_dtype=jnp.bfloat16))
    ms = min(sum(profiling.op_times(lambda: f(x).block_until_ready(),
                                    iters=4).values()) for _ in range(3))
    px = out_hw[0] * out_hw[1]
    # 3 channels share the dir pipeline; resolve/rcas counts are already
    # 3-channel (stacked scalars above are per-channel tuples).
    floor_ms = ops["per_px"] * px / rate * 1e3
    print(f"ops/px: {ops}")
    print(f"achieved VPU rate: {rate/1e12:.2f} T el-ops/s (FMA=1)")
    print(f"kernel: {ms:.3f} ms   analytic floor: {floor_ms:.3f} ms")
    print(f"utilization vs floor: {floor_ms/ms*100:.0f}%")


if __name__ == "__main__":
    main()
