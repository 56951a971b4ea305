"""Benchmark harness: fused EASU+RCAS throughput on the local TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline config (BASELINE.json): EASU+RCAS at 1080p -> 4K, per chip.
vs_baseline is measured against the reference's best published number:
the RX 6800 XT-class <=0.40 ms full-FSR-pass budget at 4K, i.e.
~20.7 Gpix/s output (BASELINE.md, FidelityFX-FSR-Overview PDF p.9).

Timing notes: the axon tunnel dispatch path has tens of ms of HTTP
round-trip jitter, memoizes repeated identical dispatches, and the chip is
time-shared, so wall-clock timing of dispatches is meaningless.  We measure
*device op time* from the JAX profiler trace (utils.profiling.op_times):
the sum of on-device "XLA Ops"-track durations per call, which is
reproducible across runs for a given executable.
"""

from __future__ import annotations

import json
import sys

import numpy as np

BASELINE_GPIX_S = 20.7  # derived RX 6800 XT-class throughput (BASELINE.md)


def main():
    import jax
    import jax.numpy as jnp

    from fsr_tpu import api
    from fsr_tpu.core.constants import EasuConstants, RcasConstants
    from fsr_tpu.kernels import fused

    dev = jax.devices()[0]
    in_hw, out_hw = (1080, 1920), (2160, 3840)
    hin, win = in_hw
    mpix = out_hw[0] * out_hw[1] / 1e6
    con = EasuConstants.create((win, hin), None, (out_hw[1], out_hw[0]))
    rcon = RcasConstants(0.25)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (3, hin, win)).astype(np.float32))

    from fsr_tpu.kernels import dispatch
    from fsr_tpu.utils.profiling import op_times

    def device_ms(fn):
        """Total on-device op ms per call: best of 3 trace windows (the
        shared chip's throughput drifts several-x between epochs)."""
        return min(sum(op_times(fn, iters=4).values()) for _ in range(3))

    results = {}
    # Input dtype is part of each config: f32 frames are the float-texture
    # contract; bf16 frames are the video-pipeline contract (the storage
    # rounding is identical — the f32 path converts to bf16 in edge_pad
    # before the kernel ever reads a texel — so outputs are bit-equal,
    # only the pad pass's HBM traffic differs).  The reference's own
    # inputs are 4-byte/px render targets (RGBA8/RGB10A2,
    # FSR_Filter.cpp:72-73), so neither float input overstates it.
    for name, dt, xin in (
        ("f32", jnp.float32, x),
        ("bf16", jnp.bfloat16, x),
        ("bf16in_bf16", jnp.bfloat16, x.astype(jnp.bfloat16)),
    ):
        if not fused.supported(x.shape, out_hw, con, dt):
            continue

        f = jax.jit(
            lambda z, dt=dt: fused.upscale_fused(z, out_hw, con, rcon, compute_dtype=dt)
        )
        try:
            results[name] = device_ms(lambda: f(xin)) / 1e3
        except Exception as e:  # pragma: no cover - report and continue
            print(f"bench {name} failed: {e}", file=sys.stderr)

    # Secondary configs: the non-integer quality presets (one-hot MXU
    # gather kernel + RCAS kernel), reported as extra keys.
    presets = {}
    for pname, in_p in (("ultra_quality_1.3x", (1661, 2953)),
                        ("quality_1.5x", (1440, 2560)),
                        ("balanced_1.7x", (1270, 2259))):
        con_p = EasuConstants.create((in_p[1], in_p[0]), None, (out_hw[1], out_hw[0]))
        xp = jnp.asarray(
            np.random.default_rng(1).uniform(0, 1, (3, *in_p)).astype(np.float32)
        )
        fp = jax.jit(
            lambda z, con_p=con_p: dispatch.upscale_fused(
                z, out_hw, con_p, rcon,
                apply_rcas=True, denoise=False, compute_dtype=jnp.bfloat16,
            )
        )
        try:
            presets[pname] = round(device_ms(lambda: fp(xp)), 3)
        except Exception as e:  # pragma: no cover
            print(f"bench {pname} failed: {e}", file=sys.stderr)

    # Config 1: EASU-only 2x, 960x540 -> 1080p.
    extras = {}
    try:
        con1 = EasuConstants.create((960, 540), None, (1920, 1080))
        x1 = jnp.asarray(
            np.random.default_rng(2).uniform(0, 1, (3, 540, 960)).astype(np.float32)
        )
        f1 = jax.jit(
            lambda z: fused.upscale_fused(z, (1080, 1920), con1, rcon, apply_rcas=False)
        )
        extras["easu_only_540p_to_1080p_ms"] = round(device_ms(lambda: f1(x1)), 3)
    except Exception as e:  # pragma: no cover
        print(f"bench config1 failed: {e}", file=sys.stderr)

    # Byte-pipeline variant: uint8 in -> uint8 codes out, decoded/encoded
    # in-kernel (bit-exact vs the float path + D3D UNORM codec).
    try:
        x8 = jnp.asarray(
            (np.random.default_rng(7).random((3, hin, win)) * 255).astype(np.uint8)
        )
        f8 = jax.jit(lambda z: fused.upscale_fused(
            z, out_hw, con, rcon, out_dtype=jnp.uint8))
        extras["u8_to_u8_ms"] = round(device_ms(lambda: f8(x8)), 3)
    except Exception as e:  # pragma: no cover
        print(f"bench u8 failed: {e}", file=sys.stderr)

    # Config 4: full pipeline (SRTM -> EASU+RCAS -> LFGA -> TEPD 10-bit),
    # batch 16 @ 4K, with the grain/dither/transform epilogue fused into
    # the kernel writeback (UpscalePipeline wires this automatically).
    try:
        b = 16
        xb = jnp.asarray(
            np.random.default_rng(3).uniform(0, 4.0, (b, 3, hin, win)).astype(np.float32)
        )
        grain = jnp.asarray(
            np.random.default_rng(4).uniform(-0.5, 0.5, (3, *out_hw)).astype(np.float32)
        )
        pipe = api.UpscalePipeline(
            out_hw, hdr_srtm=True, grain_amount=0.25, dither_bits=10,
            compute_dtype=jnp.float32,
        )
        extras["pipeline_batch16_4k_ms_per_frame"] = round(
            device_ms(lambda: pipe(xb, grain=grain, frame=0).block_until_ready()) / b,
            3,
        )
        # Best supported configuration of the same chain (VERDICT r3 #4):
        # bf16 compute + 8-bit TEPD straight to uint8 display codes — the
        # byte is the code, so the writeback is a quarter of the f32 one.
        pipe_best = api.UpscalePipeline(
            out_hw, hdr_srtm=True, grain_amount=0.25, dither_bits=8,
            compute_dtype=jnp.bfloat16, out_dtype=jnp.uint8,
        )
        extras["pipeline_best_bf16_u8_batch16_4k_ms_per_frame"] = round(
            device_ms(
                lambda: pipe_best(xb, grain=grain, frame=0).block_until_ready()
            ) / b,
            3,
        )
    except Exception as e:  # pragma: no cover
        print(f"bench config4 failed: {e}", file=sys.stderr)
    # Config 5 (v5e-8 sharded preprocessing) needs a multi-chip slice; it is
    # exercised by examples/dataset_preprocessing.py and dryrun_multichip.

    # Sustained-load regime probe (fixed frame size, growing batch).  The
    # full curve is reported so the narrative can't drift from the numbers
    # (VERDICT r4 #6): on the shared v5e the per-frame cost at b>1 has
    # bounced within ~±4% of b=1 across rounds (r3: b16 better; r4: b16
    # 1.7% worse) — batching neither taxes nor helps the fused kernel
    # beyond tenancy noise, because the kernel pipelines tiles within one
    # frame just as well as across frames.  Larger traced regions CAN
    # throttle (the f32 *pipeline* chain at b>=8 measured +29%, PLAN.md);
    # the curve below is the kernel-only truth.
    try:
        sus = {}
        for b in (1, 4, 16, 64):
            xs = jnp.asarray(
                np.random.default_rng(8).uniform(
                    0, 1, (b, 3, hin, win)
                ).astype(np.float32)
            )
            fb = jax.jit(lambda z: fused.upscale_fused(
                z, out_hw, con, rcon, compute_dtype=jnp.bfloat16))
            sus[f"b{b}"] = round(device_ms(lambda: fb(xs)) / b, 3)
        extras["sustained_2x_bf16_ms_per_frame_by_batch"] = sus
    except Exception as e:  # pragma: no cover
        print(f"bench sustained failed: {e}", file=sys.stderr)

    # On-device fidelity: fused kernel vs the frozen oracle at 540p->1080p,
    # and the fused gather(+RCAS) preset path at a 1.5x config.
    fidelity = None
    fidelity_preset = None
    try:
        from fsr_tpu.reference import scalar as oracle

        con1b = EasuConstants.create((960, 540), None, (1920, 1080))
        img = np.random.default_rng(5).uniform(0, 1, (3, 540, 960)).astype(np.float32)
        got = np.asarray(
            fused.upscale_fused(jnp.asarray(img), (1080, 1920), con1b, rcon)
        )
        want = oracle.rcas_ref(oracle.easu_ref(img, (1080, 1920), con1b), rcon)
        fidelity = float(np.max(np.abs(got - want)))

        con1p = EasuConstants.create((640, 360), None, (960, 540))
        imgp = np.random.default_rng(6).uniform(0, 1, (3, 360, 640)).astype(np.float32)
        gotp = np.asarray(dispatch.upscale_fused(
            jnp.asarray(imgp), (540, 960), con1p, rcon,
            apply_rcas=True, denoise=False, compute_dtype=jnp.float32,
        ))
        wantp = oracle.rcas_ref(oracle.easu_ref(imgp, (540, 960), con1p), rcon)
        fidelity_preset = float(np.max(np.abs(gotp - wantp)))
    except Exception as e:  # pragma: no cover
        print(f"bench fidelity failed: {e}", file=sys.stderr)

    if not results:
        print(json.dumps({"metric": "easu_rcas_1080p_to_4k", "value": 0.0,
                          "unit": "Mpix/s", "vs_baseline": 0.0,
                          "error": "no kernel config ran"}))
        return

    best_name = min(results, key=results.get)
    t = results[best_name]
    mpix_s = mpix / t
    line = {
        "metric": "easu_rcas_1080p_to_4k_output_throughput",
        "value": round(mpix_s, 1),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / (BASELINE_GPIX_S * 1e3), 4),
        "ms_per_frame": round(t * 1e3, 3),
        "compute_dtype": best_name,
        "device": str(dev),
        "all_ms": {k: round(v * 1e3, 3) for k, v in results.items()},
        "preset_ms_bf16": presets,
        "preset_mpix_s": {
            k: round(mpix / (v / 1e3), 1) for k, v in presets.items() if v
        },
        "max_abs_dev_vs_oracle_f32": fidelity,
        "preset_max_abs_dev_vs_oracle_f32": fidelity_preset,
        **extras,
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
