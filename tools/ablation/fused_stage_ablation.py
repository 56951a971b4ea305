"""Stage-cost ablation for the fused 2x EASU+RCAS kernel (TPU only).

Re-times the 1080p->4K bf16 headline with individual stages of the shared
resolve math knocked out via `easu_math._ABLATION_STAGES` (a module global
assigned programmatically — deliberately NOT an env hook, so nothing in the
environment can corrupt production output; tools/verify_on_tpu.py asserts
it is empty).  Each knockout substitutes a cheap data-dependent stand-in so
Mosaic cannot constant-fold the remaining pipeline.  Output is WRONG under
every mode — this attributes device time to stages, it does not validate.

Stages (cumulative upstream DCE noted):
  set       direction/length quadrant blend + per-texel g response + luma
  norm      direction normalization / anisotropy / lobe chain
  weights   per-tap d2 + polynomial weight math (accumulation FMAs kept)
  poly      per-tap polynomial only (d2 quadratic kept)
  dering    min4/max4 computation + output clamp
  rcaslimit RCAS limiter (mn/mx, hit ratios, NaN-drop max); resolve kept
  norcas    whole RCAS + its software pipeline (apply_rcas=False)

Run on the TPU: python tools/ablation/fused_stage_ablation.py
"""

import os
import subprocess
import sys

_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")

MODES = [
    ("", "full kernel (baseline)"),
    ("set", "quadrant blend + texel g response + luma removed"),
    ("norm", "direction normalization / lobe chain removed"),
    ("weights", "per-tap d2 + weight polynomial removed"),
    ("poly", "per-tap weight polynomial removed (d2 kept)"),
    ("dering", "min4/max4 dering clamp removed"),
    ("rcaslimit", "RCAS limiter chain removed (resolve kept)"),
    ("norcas", "RCAS + software pipeline removed"),
]

_CHILD = r"""
import numpy as np, jax, jax.numpy as jnp
from fsr_tpu.core import easu_math
from fsr_tpu.core.constants import EasuConstants, RcasConstants
from fsr_tpu.kernels import fused
from fsr_tpu.utils import profiling

mode = MODE
apply_rcas = mode != "norcas"
if mode and mode != "norcas":
    easu_math._ABLATION_STAGES = frozenset((mode,))

in_hw, out_hw = (1080, 1920), (2160, 3840)
con = EasuConstants.create((in_hw[1], in_hw[0]), None, (out_hw[1], out_hw[0]))
rcon = RcasConstants(0.25)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(0, 1, (3, *in_hw)).astype(np.float32))
f = jax.jit(lambda z: fused.upscale_fused(
    z, out_hw, con, rcon, apply_rcas=apply_rcas,
    compute_dtype=jnp.bfloat16))
f(x).block_until_ready()
best = min(sum(profiling.op_times(
    lambda: f(x).block_until_ready(), iters=4).values()) for _ in range(3))
print(f"ABL_MS {best:.4f}")
"""


def main():
    base = None
    for mode, desc in MODES:
        out = subprocess.run(
            [sys.executable, "-c", _CHILD.replace("MODE", repr(mode))],
            capture_output=True, text=True, timeout=900, cwd=_ROOT)
        line = [l for l in out.stdout.splitlines() if l.startswith("ABL_MS")]
        if not line:
            print(f"{mode or 'base':>10}: FAILED\n{out.stderr[-800:]}")
            continue
        ms = float(line[0].split()[1])
        if mode == "":
            base = ms
            print(f"{'base':>10}: {ms:.3f} ms  ({desc})")
        else:
            print(f"{mode:>10}: {ms:.3f} ms  (-{base - ms:.3f})  ({desc})")


if __name__ == "__main__":
    main()
