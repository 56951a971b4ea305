"""Frame-graph demo: the SampleRenderer::OnRender analog on TPU.

The reference's sample renderer records a frame as a fixed graph of passes
with GPU timestamps around each (SampleRenderer.cpp:398-767 — shadow/PBR
render at render resolution, tonemap (+TEPD when HDR), the "FSR 1.0"
upscale, magnifier, UI, present — profiled in an ImGui window,
FSRSample.cpp:767-843).  The game renderer itself rides Cauldron and is out
of scope here; this demo reproduces the *post-render frame tail* and its
orchestration idioms in TPU form:

- passes are pure functions composed under one jit (XLA dataflow replaces
  command-list barriers);
- the FSR pass is the fused kernel, with tonemap/TEPD expressible either
  as separate passes (this file, for per-pass timing) or folded into the
  kernel prologue/epilogue (UpscalePipeline — the production path);
- per-pass device times come from the profiler trace (utils.profiling),
  the GPUTimestamps analog, printed as the profiler-window table;
- a camera-jittered synthetic scene stands in for the glTF renderer, and
  the magnifier (utils.image.magnify) reproduces the sample's pixel-level
  inspection tool.

    python examples/frame_graph.py            # runs on the TPU if present
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def render_scene(hw, frame: int, jitter: bool = True, seed: int = 0):
    """Synthetic linear-HDR 'scene render' at render resolution.

    Stands in for the shadow/gbuffer/skydome/TAA chain; the sub-pixel
    camera jitter mirrors the TAA-jittered projection the sample applies
    when TAA is on (SampleRenderer.cpp:411-414).
    """
    h, w = hw
    jx = 0.5 * np.sin(2.399963 * frame) if jitter else 0.0  # golden-angle
    jy = 0.5 * np.cos(2.399963 * frame) if jitter else 0.0
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    x = x + jx
    y = y + jy
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 1, (3, h, w)).astype(np.float32) * 0.05
    sky = 4.0 * np.exp(-((y / h - 0.2) ** 2) * 8.0)  # bright HDR sky band
    checks = 0.6 + 0.4 * np.sign(np.sin(x / 9.0) * np.sin(y / 9.0))
    return np.clip(base + (sky * checks)[None], 0.0, 64.0).astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp

    from fsr_tpu import api
    from fsr_tpu.core import tonemap as tm
    from fsr_tpu.utils import image as im
    from fsr_tpu.utils.profiling import op_times, trace_annotation

    render_hw, display_hw = (540, 960), (1080, 1920)  # Performance 2x
    frame = 7
    scene = jnp.asarray(render_scene(render_hw, frame))

    # The frame tail as named passes under one jit.  trace_annotation is
    # the UserMarker/SetPerfMarker analog; XLA's dataflow ordering replaces
    # the explicit resource barriers between passes.
    def frame_tail(hdr):
        with trace_annotation("Tonemapping"):
            ldr = tm.tonemap(hdr, exposure=0.7, tonemapper="amd")
        with trace_annotation("FSR 1.0"):
            out = api.upscale(ldr, out_size=display_hw, sharpness=0.25)
        return out

    run = jax.jit(frame_tail)
    out = np.asarray(run(scene))

    # Profiler window analog: per-pass on-device times from the trace.
    times = op_times(lambda: run(scene).block_until_ready())
    print(f"render {render_hw} -> display {display_hw}   (frame {frame})")
    print(f"{'pass':<40} {'ms':>8}")
    for name, ms in times.items():
        print(f"{name[:40]:<40} {ms:>8.4f}")
    print(f"{'TOTAL (device)':<40} {sum(times.values()):>8.4f}")

    # Production form: the same tail as ONE kernel dispatch — tonemap
    # stays render-res (cheap), SRTM/LFGA/TEPD ride the kernel
    # prologue/epilogue (see UpscalePipeline) — plus the magnifier, the
    # sample's pixel-inspection tool (MagnifierPS analog).
    mag = im.magnify(out, center=(display_hw[0] // 2, display_hw[1] // 2),
                     zoom=8)
    out_dir = os.path.join(os.path.dirname(__file__), "_out")
    os.makedirs(out_dir, exist_ok=True)
    im.save_image(os.path.join(out_dir, "frame_graph_display.png"),
                  np.clip(out, 0, 1))
    im.save_image(os.path.join(out_dir, "frame_graph_magnifier.png"),
                  np.clip(np.asarray(mag), 0, 1))
    print(f"wrote {out_dir}/frame_graph_display.png (+magnifier)")


if __name__ == "__main__":
    main()
