"""Probe whether the current Mosaic/TPU target supports fp16 vectors.

VERDICT r2 #4 accepted that strict-fp16 kernel compute (the FsrEasuH /
FsrRcasH analog, ffx_fsr1.h:505-593,782-866) is impossible on v5e Mosaic
— "no fp16 vector type" — with the standing instruction to RE-TEST when a
Mosaic target with fp16 vectors appears.  This script is that re-test:

1. fp16 storage:   DMA a float16 operand into VMEM and convert to f32.
2. fp16 compute:   run a small fp16 FMA chain inside the kernel.
3. fp16 output:    store float16 from the kernel.

Each step compiles and runs a minimal Pallas kernel and reports
SUPPORTED / UNSUPPORTED with the Mosaic error when rejected.  If all
three pass, kernels/fused.py's `supported()` gate (which routes fp16 to
the XLA path today) should be revisited.

Run on the TPU: python tools/ablation/fp16_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np


def _probe(name, fn):
    try:
        out = fn()
        np.asarray(out)  # force execution
        print(f"  {name:<14} SUPPORTED")
        return True
    except Exception as e:  # Mosaic rejections surface as XlaRuntimeError etc.
        msg = str(e).splitlines()[0][:140]
        print(f"  {name:<14} UNSUPPORTED: {msg}")
        return False


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    if dev.platform != "tpu":
        print("not a TPU — the probe is about Mosaic lowering; aborting")
        return 1

    x16 = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (256, 256)),
                      jnp.float16)

    def storage_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...].astype(jnp.float32) * 2.0

    def compute_kernel(x_ref, o_ref):
        v = x_ref[...]
        acc = v
        for _ in range(8):
            acc = acc * v + jnp.float16(0.125)
        o_ref[...] = acc.astype(jnp.float32)

    def output_kernel(x_ref, o_ref):
        o_ref[...] = (x_ref[...].astype(jnp.float32) * 0.5).astype(jnp.float16)

    results = {
        "fp16 storage": _probe(
            "fp16 storage",
            lambda: pl.pallas_call(
                storage_kernel,
                out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
            )(x16)),
        "fp16 compute": _probe(
            "fp16 compute",
            lambda: pl.pallas_call(
                compute_kernel,
                out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
            )(x16)),
        "fp16 output": _probe(
            "fp16 output",
            lambda: pl.pallas_call(
                output_kernel,
                out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float16),
            )(x16)),
    }
    if all(results.values()):
        print("ALL SUPPORTED — revisit fused.supported()'s fp16 gate and the "
              "strict-FsrEasuH kernel path (PLAN.md '16-bit compute question').")
    else:
        print("fp16 vectors still (partly) unsupported by this Mosaic target; "
              "the XLA fallback for fp16 remains correct routing.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
