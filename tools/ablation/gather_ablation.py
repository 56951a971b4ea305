"""Timing ablation for the general-ratio gather kernel (TPU only).

Re-runs a quality preset with pieces of the col-gather selection pipeline
stubbed out via the FSR_GATHER_ABL env hook in kernels/easu_gather.py, to
attribute device time to rolls / within-vreg gathers / row-selection
matmuls / the per-texel g response.  Output is WRONG under every ablation
mode — this measures cost, not correctness.

Usage:  python tools/ablation/gather_ablation.py [preset]
        preset in {1.3, 1.7} (col-gather presets); default 1.7.
"""
import os
import subprocess
import sys

_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")

MODES = [
    ("", "full kernel (baseline)"),
    # Every ablation mode runs the conservative (120, 384) tile plan
    # (easu_gather gates the wide scale-based plans off under _ABL:
    # "noroll" extends the window planes' live ranges and OOMs Mosaic's
    # 16M scoped vmem at (136, 640)/(120, 768)).  A second baseline at
    # that plan is measured so the per-stage deltas compare like with
    # like.
    ("base384", "full kernel at the ablation tile plan (120, 384)"),
    ("noroll", "alignment rolls removed (and gathers degenerate)"),
    ("nogather", "within-vreg tap gathers removed (rolls kept)"),
    ("noselrow", "row-selection matmuls replaced by broadcast"),
    ("nog", "per-texel g response reused from luma (g calc removed)"),
]

_CHILD = r"""
import numpy as np, jax, jax.numpy as jnp
import fsr_tpu
from fsr_tpu.utils import profiling
w, h = SIZE
rng = np.random.default_rng(7)
img = jnp.asarray(rng.uniform(0, 1, (3, h, w)).astype(np.float32),
                  dtype=jnp.bfloat16)
f = jax.jit(lambda x: fsr_tpu.upscale(
    x, out_size=(2160, 3840), compute_dtype=jnp.bfloat16, impl="pallas"))
f(img).block_until_ready()
best = min(sum(profiling.op_times(
    lambda: f(img).block_until_ready()).values()) for _ in range(3))
print(f"ABL_MS {best:.4f}")
"""


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "1.7"
    size = {"1.3": (2954, 1662), "1.7": (2259, 1271)}[preset]
    base = None
    for mode, desc in MODES:
        env = dict(os.environ, FSR_GATHER_ABL=mode, FSR_GATHER_ABL_I_KNOW="1")
        if mode == "":
            env.pop("FSR_GATHER_ABL", None)
            env.pop("FSR_GATHER_ABL_I_KNOW", None)
        out = subprocess.run(
            [sys.executable, "-c", _CHILD.replace("SIZE", repr(size))],
            capture_output=True, text=True, env=env, timeout=600, cwd=_ROOT)
        line = [l for l in out.stdout.splitlines() if l.startswith("ABL_MS")]
        if not line:
            print(f"{mode or 'base':>10}: FAILED\n{out.stderr[-500:]}",
                  flush=True)
            continue
        ms = float(line[0].split()[1])
        if mode == "":
            print(f"{'base':>10}: {ms:.3f} ms  ({desc})", flush=True)
        elif mode == "base384":
            base = ms
            print(f"{mode:>10}: {ms:.3f} ms  ({desc})", flush=True)
        else:
            print(f"{mode:>10}: {ms:.3f} ms  (-{base - ms:.3f} vs base384)"
                  f"  ({desc})", flush=True)


if __name__ == "__main__":
    main()
