"""Video upscaling: batched fused kernel + temporally-animated dither/grain.

Shows the per-frame temporal controls the reference exposes (TEPD's frame
counter, FSRTonemapping.h:39-41, and LFGA's temporally-changing grain): a
clip is processed in device batches through ONE kernel dispatch per batch
(frames are a grid dimension, not a Python loop; grain and the TEPD dither
fuse into the kernel writeback), with the dither pattern advancing per
batch so quantization error is temporally energy-preserving.

    python examples/video_upscale.py          # on the TPU
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def synthetic_clip(n: int, hw, seed: int = 0):
    """A moving-gradient clip (stand-in for decoded video frames)."""
    rng = np.random.default_rng(seed)
    h, w = hw
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    base = rng.uniform(0, 1, (3, h, w)).astype(np.float32) * 0.1
    frames = []
    for t in range(n):
        wave = 0.45 + 0.45 * np.sin((x + 3.0 * t) / 17.0) * np.cos(y / 11.0)
        frames.append(np.clip(base + wave[None], 0, 1).astype(np.float32))
    return np.stack(frames)


def main():
    import jax
    import jax.numpy as jnp

    import fsr_tpu

    in_hw, out_hw = (270, 480), (540, 960)
    batch = 8
    clip = synthetic_clip(2 * batch, in_hw)
    rng = np.random.default_rng(1)
    grain = jnp.asarray(rng.uniform(-0.5, 0.5, (3, *out_hw)).astype(np.float32))

    # One kernel dispatch per batch: grain and the TEPD dither fuse into
    # the kernel writeback (kernels/epilogue.py); the pipeline caches the
    # phase-planar grain layout for the 2x kernel automatically.  The
    # dither pattern advances with the batch's first frame index (all
    # frames of a batch share a page — the sample advances its blue-noise
    # page per present, frame%8, the same granularity).
    pipe = fsr_tpu.UpscalePipeline(
        out_hw, sharpness=0.25, grain_amount=0.15, dither_bits=8,
    )

    def process(frames, first_index):
        return pipe(frames, grain=grain, frame=first_index)

    outs = []
    t0 = time.perf_counter()
    for b0 in range(0, clip.shape[0], batch):
        out = process(jnp.asarray(clip[b0 : b0 + batch]), b0)
        out.block_until_ready()
        outs.append(np.asarray(out))
    dt = time.perf_counter() - t0
    video = np.concatenate(outs)
    assert video.shape == (2 * batch, 3, *out_hw)
    # Temporal energy preservation: averaging the dithered gamma-2 frames in
    # linear space approaches the undithered signal.
    mean_err = abs(float(np.mean(video[:8] ** 2) - np.mean(video[8:] ** 2)))
    print(
        f"{video.shape[0]} frames {in_hw}->{out_hw} in {dt:.2f}s "
        f"({video.shape[0]/dt:.1f} fps incl. transfers); batch-energy drift {mean_err:.2e}"
    )


if __name__ == "__main__":
    main()
