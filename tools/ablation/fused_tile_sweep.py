"""Fused 2x kernel tile-plan sweep on hardware (round 5).

The exact-divisor restructure (ti=384) made any 128-multiple tile width
eligible on the qy=2 pack path (the column riffle shuffles per 128-lane
block), but `_pick_tiles`' candidate list stops at 512 and the old sweep
ran under Mosaic's 16M scoped-vmem default (tj=56 OOM'd there).  Wider
exact divisors of the 1920-lane 4K phase plane shrink the column-roll
overcompute — the lane rolls run at tiw = round_up(ti+6, 128), so
ti=384 rolls 512 lanes per 384 useful (33% waste), ti=640 rolls 768
(20%), ti=1920 rolls 2048 (6.7%) — and taller tj cuts the row-halo
fraction (tih = round_up(tj+6, 8): 48 rows per 40 useful at tj=40, 72
per 64 at tj=64).  This probes the (tj, ti) grid under the 48M budget.

Each config runs in a subprocess (Mosaic OOMs stay isolated) with
`fused._pick_tiles` monkeypatched; output is the production kernel's,
so each config is also max|Δ|-checked against the unpatched baseline.

Run on the TPU: python tools/ablation/fused_tile_sweep.py
"""

import os
import subprocess
import sys

_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")

# (tj, ti); (40, 384) is the shipping plan.  Override on the command
# line with tj,ti pairs: python fused_tile_sweep.py 64,384 80,384
GRID = [
    (40, 384), (48, 384), (56, 384), (64, 384),
    (40, 640), (48, 640), (56, 640), (64, 640),
    (40, 1920), (48, 1920), (56, 1920), (64, 1920),
]

_CHILD = r"""
import numpy as np, jax, jax.numpy as jnp
from fsr_tpu.core.constants import EasuConstants, RcasConstants
from fsr_tpu.kernels import fused
from fsr_tpu.utils import profiling

tj, ti = PLAN
real = fused._pick_tiles
def patched(hpl, wpl, qy, qx, **kw):
    base = real(hpl, wpl, qy, qx, **kw)
    if base is None or qy != 2 or wpl % ti or ti % 128 or tj % 8:
        return base
    return (tj, ti)
fused._pick_tiles = patched

in_hw, out_hw = (1080, 1920), (2160, 3840)
con = EasuConstants.create((in_hw[1], in_hw[0]), None, (out_hw[1], out_hw[0]))
rcon = RcasConstants(0.25)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(0, 1, (3, *in_hw)).astype(np.float32)).astype(
    jnp.bfloat16)
f = jax.jit(lambda z: fused.upscale_fused(
    z, out_hw, con, rcon, compute_dtype=jnp.bfloat16))
y = f(x).block_until_ready()

fused._pick_tiles = real
g = jax.jit(lambda z: fused.upscale_fused(
    z, out_hw, con, rcon, compute_dtype=jnp.bfloat16))
dev = float(jnp.max(jnp.abs(y.astype(jnp.float32)
                            - g(x).astype(jnp.float32))))

best = min(sum(profiling.op_times(
    lambda: f(x).block_until_ready(), iters=4).values()) for _ in range(3))
print(f"SWEEP_MS {best:.4f} DEV {dev:.3e}")
"""


def main():
    grid = GRID
    if len(sys.argv) > 1:
        grid = [tuple(int(v) for v in a.split(",")) for a in sys.argv[1:]]
    base = None
    for tj, ti in grid:
        try:
            out = subprocess.run(
                [sys.executable, "-c", _CHILD.replace("PLAN", repr((tj, ti)))],
                capture_output=True, text=True, timeout=1800, cwd=_ROOT)
        except subprocess.TimeoutExpired:
            print(f"(tj={tj:>3}, ti={ti:>4}): TIMEOUT (1800s)")
            continue
        line = [l for l in out.stdout.splitlines() if l.startswith("SWEEP_MS")]
        tag = f"(tj={tj:>3}, ti={ti:>4})"
        if not line:
            err = out.stderr.strip().splitlines()
            brief = next((l for l in reversed(err) if "RESOURCE_EXHAUSTED" in l
                          or "vmem" in l.lower() or "Error" in l), "")
            print(f"{tag}: FAILED  {brief[:160]}")
            continue
        ms = float(line[0].split()[1])
        dev = float(line[0].split()[3])
        flag = "" if dev == 0.0 else f"  DEV {dev:.1e} (NOT bit-equal)"
        rel = "" if base is None else f"  ({ms - base:+.3f} vs shipping)"
        if (tj, ti) == (40, 384):
            base = ms
            rel = "  (shipping plan)"
        print(f"{tag}: {ms:.3f} ms{rel}{flag}")


if __name__ == "__main__":
    main()
