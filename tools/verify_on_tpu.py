"""Hardware verification sweep: every execution path vs the frozen oracle.

Run on a machine with a TPU attached (unit tests force CPU; this exercises
the real compiled kernels).  Exit code 0 iff every check passes.

    python tools/verify_on_tpu.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BUDGET = 1.0 / 255.0


def main() -> int:
    import jax
    import jax.numpy as jnp

    import fsr_tpu
    from fsr_tpu.core.constants import EasuConstants, RcasConstants
    from fsr_tpu.kernels import dispatch, easu_gather, fused, rcas_pallas
    from fsr_tpu.reference import scalar as ref

    dev = jax.devices()[0]
    print(f"device: {dev}")
    rng = np.random.default_rng(0)
    failures = []

    # 0. The timing-ablation hook must be off: any non-empty mode corrupts
    # gather-kernel output by design (tools/ablation/gather_ablation.py).
    abl = os.environ.get("FSR_GATHER_ABL", "")
    print(f"  {'PASS' if not abl else 'FAIL'} FSR_GATHER_ABL unset")
    if abl:
        failures.append("FSR_GATHER_ABL set")

    def check(name, got, want, tol):
        d = float(np.max(np.abs(np.asarray(got, np.float32) - want)))
        ok = d <= tol
        print(f"  {'PASS' if ok else 'FAIL'} {name}: max|Δ|={d:.3g} (tol {tol:g})")
        if not ok:
            failures.append(name)

    def oracle(img, out_hw, con, rcon=None, denoise=False):
        out = ref.easu_ref(img, out_hw, con)
        if rcon is not None:
            out = ref.rcas_ref(out, rcon, denoise=denoise)
        return out

    rcon = RcasConstants(0.25)

    # 1. Fused 2x kernel, f32 + bf16, single + batched
    print("fused phase kernel (2x):")
    in_hw, out_hw = (270, 480), (540, 960)
    con = EasuConstants.create((480, 270), None, (960, 540))
    img = rng.uniform(0, 1, (3, *in_hw)).astype(np.float32)
    want = oracle(img, out_hw, con, rcon)
    got = fused.upscale_fused(jnp.asarray(img), out_hw, con, rcon)
    check("f32", got, want, 2e-5)
    got = fused.upscale_fused(
        jnp.asarray(img), out_hw, con, rcon, compute_dtype=jnp.bfloat16
    ).astype(jnp.float32)
    d = np.abs(np.asarray(got) - want)
    print(f"  INFO bf16: median={np.median(d):.3g} p99={np.percentile(d, 99):.3g}")
    if np.median(d) > BUDGET:
        failures.append("fused bf16 median")
    imgs = rng.uniform(0, 1, (2, 3, *in_hw)).astype(np.float32)
    gotb = np.asarray(fused.upscale_fused(jnp.asarray(imgs), out_hw, con, rcon))
    check("batched", gotb[1], oracle(imgs[1], out_hw, con, rcon), 2e-5)

    # 2. General-ratio gather kernel (1.5x) + RCAS kernel
    print("gather kernel (1.5x) + rcas kernel:")
    in_hw, out_hw = (144, 256), (216, 384)
    con = EasuConstants.create((256, 144), None, (384, 216))
    img = rng.uniform(0, 1, (3, *in_hw)).astype(np.float32)
    easu_want = ref.easu_ref(img, out_hw, con)
    got = easu_gather.easu_gather(jnp.asarray(img), out_hw, con)
    check("easu_gather f32", got, easu_want, 2e-5)
    got2 = rcas_pallas.rcas_fused(got, rcon)
    check("rcas_fused f32", got2, ref.rcas_ref(easu_want, rcon), 4e-5)

    # 2a. Fused gather+RCAS pipeline across the shipping preset ratios,
    # at sizes with many column tiles (the cross-tile handoff is the risk).
    print("gather kernel with fused RCAS (preset ratios):")
    for label, scale in (("ultra_1.3x", 1.3), ("quality_1.5x", 1.5),
                         ("balanced_1.7x", 1.7)):
        oh, ow = 540, 1280  # 4K-adjacent aspect: 4+ column tiles at ti=384
        ih, iw = int(oh / scale), int(ow / scale)
        con_p = EasuConstants.create((iw, ih), None, (ow, oh))
        img_p = rng.uniform(0, 1, (3, ih, iw)).astype(np.float32)
        want_p = oracle(img_p, (oh, ow), con_p, rcon)
        got_p = easu_gather.easu_gather(
            jnp.asarray(img_p), (oh, ow), con_p, rcon=rcon, apply_rcas=True
        )
        check(f"{label} f32", got_p, want_p, 4e-5)
        # bf16 storage: exercises the production wide-tile plans
        # ((120, 768) below 1.6x, (136, 640) above — bf16-only geometry).
        got_b = easu_gather.easu_gather(
            jnp.asarray(img_p), (oh, ow), con_p, rcon=rcon, apply_rcas=True,
            compute_dtype=jnp.bfloat16,
        ).astype(jnp.float32)
        d = np.abs(np.asarray(got_b) - want_p)
        print(f"  INFO {label} bf16: median={np.median(d):.3g} "
              f"p99={np.percentile(d, 99):.3g}")
        if np.median(d) > BUDGET:
            failures.append(f"{label} bf16 median")
    got_d = easu_gather.easu_gather(
        jnp.asarray(img_p), (oh, ow), con_p, rcon=rcon, apply_rcas=True, denoise=True
    )
    check("fused-gather denoise f32", got_d,
          oracle(img_p, (oh, ow), con_p, rcon, denoise=True), 4e-5)

    # 2b. Hybrid X-phase path (rational column mapping: 1.5x = 3 phases of
    # stride 2; 2.5x = 5 phases of stride 2), incl. a ragged-width config.
    print("hybrid X-phase gather kernel:")
    from fsr_tpu.ops.easu import easu_coords as _coords
    for label, ih, iw, oh, ow in (
        ("quality_1.5x_720p", 720, 1280, 1080, 1920),
        ("x2.5", 216, 384, 540, 960),
        ("ragged_1.5x", 360, 854, 540, 1281),
    ):
        con_h = EasuConstants.create((iw, ih), None, (ow, oh))
        det = easu_gather._detect_x_phase(_coords(con_h, (oh, ow))[0], ow)
        img_h = rng.uniform(0, 1, (3, ih, iw)).astype(np.float32)
        want_h = oracle(img_h, (oh, ow), con_h, rcon)
        got_h = easu_gather.easu_gather(
            jnp.asarray(img_h), (oh, ow), con_h, rcon=rcon, apply_rcas=True)
        check(f"{label} (phase={det and (det[0], det[1])}) f32",
              got_h, want_h, 4e-5)

    # 2d. Gather-kernel in-kernel pad (clamped aligned windows, no edge-pad
    # pass): aligned geometry must be BIT-identical to the padded-plan path
    # on hardware (it reimplements the CLAMP sampler, FSR_Filter.cpp:49-50);
    # misaligned preset geometry (1.3x render sizes) must take the fallback
    # and still match the oracle.
    print("gather in-kernel pad (hardware A/B):")
    assert easu_gather.INKERNEL_PAD
    ih, iw, oh, ow = 720, 1280, 1080, 1920  # aligned 1.5x hybrid, ikpad on
    con_ik = EasuConstants.create((iw, ih), None, (ow, oh))
    img_ik = rng.uniform(0, 1, (3, ih, iw)).astype(np.float32)
    for dt_lab, dt_ik in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        x_ik = jnp.asarray(img_ik).astype(dt_ik)
        try:
            jax.clear_caches()
            got_on = np.asarray(easu_gather.easu_gather(
                x_ik, (oh, ow), con_ik, rcon, apply_rcas=True,
                compute_dtype=dt_ik))
            easu_gather.INKERNEL_PAD = False
            jax.clear_caches()
            got_off = np.asarray(easu_gather.easu_gather(
                x_ik, (oh, ow), con_ik, rcon, apply_rcas=True,
                compute_dtype=dt_ik))
        finally:
            easu_gather.INKERNEL_PAD = True
            jax.clear_caches()
        ok = np.array_equal(got_on, got_off)
        print(f"  {'PASS' if ok else 'FAIL'} aligned 1.5x {dt_lab} "
              f"in-kernel pad bit-equal")
        if not ok:
            failures.append(f"in-kernel pad {dt_lab}")
    check("aligned 1.5x ikpad f32 vs oracle",
          easu_gather.easu_gather(jnp.asarray(img_ik), (oh, ow), con_ik,
                                  rcon, apply_rcas=True),
          oracle(img_ik, (oh, ow), con_ik, rcon), 4e-5)
    ih, iw = 416, 666  # misaligned 1.3x-ish: ik gate fails -> padded plan
    con_mk = EasuConstants.create((iw, ih), None, (865, 540))
    img_mk = rng.uniform(0, 1, (3, ih, iw)).astype(np.float32)
    check("misaligned 1.3x (pad fallback) f32",
          easu_gather.easu_gather(jnp.asarray(img_mk), (540, 865), con_mk,
                                  rcon, apply_rcas=True),
          oracle(img_mk, (540, 865), con_mk, rcon), 4e-5)

    # 2c. Regression: integer-fraction columns (the FMA/floor desync size).
    print("gather kernel (irregular 1.266x with frac==0 columns):")
    in_hw, out_hw = (58, 165), (73, 209)
    con = EasuConstants.create((165, 58), None, (209, 73))
    img = rng.uniform(0, 1, (3, *in_hw)).astype(np.float32)
    got = easu_gather.easu_gather(jnp.asarray(img), out_hw, con)
    check("frac==0 columns", got, ref.easu_ref(img, out_hw, con), 2e-5)

    # 3. Public API auto-dispatch, incl. RGBA and presets
    print("api auto-dispatch:")
    in_hw, out_hw = (144, 256), (216, 384)
    img = rng.uniform(0, 1, (3, *in_hw)).astype(np.float32)
    con = EasuConstants.create((256, 144), None, (384, 216))
    easu_want = ref.easu_ref(img, out_hw, con)
    out = fsr_tpu.upscale(jnp.asarray(img), preset="quality", impl="pallas")
    check("preset quality", out, ref.rcas_ref(easu_want, rcon), 4e-5)
    rgba = rng.uniform(0, 1, (4, 128, 256)).astype(np.float32)
    out = fsr_tpu.upscale(jnp.asarray(rgba), scale=2.0, impl="pallas")
    con4 = EasuConstants.create((256, 128), None, (512, 256))
    want_rgb = ref.rcas_ref(ref.easu_ref(rgba[:3], (256, 512), con4), rcon)
    check("rgba rgb part", np.asarray(out)[:3], want_rgb, 2e-5)
    want_a = ref.bilinear_ref(rgba[3:4].repeat(3, 0), (256, 512), con4)[0]
    check("rgba alpha (bilinear)", np.asarray(out)[3], want_a, 1e-5)

    # 4. dispatch gating sanity
    assert dispatch.supported(jnp.zeros((4, 128, 256)), (256, 512), con4, jnp.float32)

    # 5. Sharded execution routes through the Pallas kernel (sp=1 on the
    # single local chip; the CPU-mesh tests cover n>1 with the XLA path,
    # and dryrun_multichip covers n>1 compilation).
    print("sharded kernel path (sp=1 on TPU):")
    from fsr_tpu.parallel import sharding, spatial

    mesh1 = sharding.make_mesh(1, ("sp",))
    img = rng.uniform(0, 1, (3, 128, 256)).astype(np.float32)
    con_s = EasuConstants.create((256, 128), None, (512, 256))
    want_s = oracle(img, (256, 512), con_s, RcasConstants(0.25))
    lowered = jax.jit(
        lambda z: spatial.upscale_spatial_sharded(z, (256, 512), mesh1, axis="sp")
    ).lower(jnp.asarray(img)).compile()
    hlo = lowered.as_text()
    kernel_taken = "tpu_custom_call" in hlo
    print(f"  {'PASS' if kernel_taken else 'FAIL'} pallas kernel in sharded HLO")
    if not kernel_taken:
        failures.append("sharded kernel path")
    check("sharded sp=1 vs oracle", lowered(jnp.asarray(img)), want_s, 2e-5)

    # 5a. General-ratio sharded path (1.5x, sp=1): the build_shard_plans ->
    # easu_gather(row_plan=...) route, compiled and executed on hardware
    # (interpret-mode CPU tests cover n>1; this pins the plan-fed kernel
    # geometry on the real chip).
    print("sharded general-ratio kernel path (1.5x, sp=1 on TPU):")
    img_g15 = rng.uniform(0, 1, (3, 360, 854)).astype(np.float32)
    con_g15 = EasuConstants.create((854, 360), None, (1281, 540))
    want_g15 = oracle(img_g15, (540, 1281), con_g15, RcasConstants(0.25))
    lowered_g = jax.jit(
        lambda z: spatial.upscale_spatial_sharded(z, (540, 1281), mesh1, axis="sp")
    ).lower(jnp.asarray(img_g15)).compile()
    hlo_g = lowered_g.as_text()
    kernel_taken_g = "tpu_custom_call" in hlo_g
    print(f"  {'PASS' if kernel_taken_g else 'FAIL'} pallas kernel in sharded HLO")
    if not kernel_taken_g:
        failures.append("sharded general-ratio kernel path")
    check("sharded 1.5x sp=1 vs oracle", lowered_g(jnp.asarray(img_g15)),
          want_g15, 4e-5)

    # 6. Fused output epilogue (transform + grain + TEPD dither in-kernel)
    # on both kernel families, vs the oracle + ops.extras chain.
    print("fused epilogue (gamma2 + LFGA + TEPD / srtm_inv):")
    from fsr_tpu.kernels.epilogue import Epilogue
    from fsr_tpu.ops import extras as xtr

    def extras_chain(x, epi, grain, frame):
        x = jnp.asarray(x)
        if epi.transform == "srtm_inv":
            x = xtr.srtm_inv(x)
        elif epi.transform == "gamma2":
            x = x * x
        if epi.needs_grain:
            x = xtr.lfga(x, jnp.asarray(grain), epi.grain_amount)
        if epi.dither_bits is not None:
            x = xtr.tepd_quantize(
                x, xtr.tepd_dither(x.shape[-2:], frame), bits=epi.dither_bits
            )
        return np.asarray(x)

    def check_dither(name, got, want, bits, max_flip_frac=1e-4):
        d = np.abs(np.asarray(got, np.float32) - want)
        step = 1.0 / (255.0 if bits == 8 else 1023.0)
        flips = int((d > 4e-5).sum())
        ok = flips <= max_flip_frac * d.size and d.max() <= 2.05 * step
        print(f"  {'PASS' if ok else 'FAIL'} {name}: knife-edge flips="
              f"{flips}/{d.size} max|Δ|={d.max():.3g} (≤1 step {step:.2g})")
        if not ok:
            failures.append(name)

    in_hw, out_hw = (270, 480), (540, 960)
    con = EasuConstants.create((480, 270), None, (960, 540))
    img = rng.uniform(0, 1, (3, *in_hw)).astype(np.float32)
    grain = rng.uniform(-0.5, 0.5, (3, *out_hw)).astype(np.float32)
    base = oracle(img, out_hw, con, rcon)
    epi = Epilogue(transform="gamma2", grain_amount=0.25, dither_bits=10)
    gp = fused.planarize_grain(grain, out_hw, con)
    got = fused.upscale_fused(
        jnp.asarray(img), out_hw, con, rcon, epilogue=epi, frame=7,
        grain_planar=gp,
    )
    check_dither("fused-2x epilogue", got, extras_chain(base, epi, grain, 7), 10)
    epi_h = Epilogue(transform="srtm_inv")
    got = fused.upscale_fused(
        jnp.asarray(img), out_hw, con, rcon, epilogue=epi_h
    )
    want_h = extras_chain(base, epi_h, None, 0)
    drel = np.abs(np.asarray(got) - want_h) / (np.abs(want_h) + 1e-3)
    ok = float(drel.max()) <= 1e-4
    print(f"  {'PASS' if ok else 'FAIL'} fused-2x srtm_inv: max rel Δ={drel.max():.3g}")
    if not ok:
        failures.append("fused-2x srtm_inv")

    hdr = (rng.uniform(0, 8.0, (3, 270, 480)).astype(np.float32))
    con_hdr = EasuConstants.create((480, 270), None, (960, 540))
    got = fused.upscale_fused(
        jnp.asarray(hdr), (540, 960), con_hdr, rcon, prologue="srtm"
    )
    want_p = oracle(
        np.asarray(xtr.srtm(jnp.asarray(hdr))), (540, 960), con_hdr, rcon
    )
    check("fused-2x srtm prologue", got, want_p, 4e-5)

    in_hw, out_hw = (360, 854), (540, 1281)  # gather kernel (1.5x hybrid)
    con_g = EasuConstants.create((854, 360), None, (1281, 540))
    img_g = rng.uniform(0, 1, (3, *in_hw)).astype(np.float32)
    grain_g = rng.uniform(-0.5, 0.5, (3, *out_hw)).astype(np.float32)
    base_g = oracle(img_g, out_hw, con_g, rcon)
    got = easu_gather.easu_gather(
        jnp.asarray(img_g), out_hw, con_g, rcon, apply_rcas=True,
        epilogue=epi, frame=7, grain=jnp.asarray(grain_g),
    )
    check_dither("gather epilogue", got, extras_chain(base_g, epi, grain_g, 7), 10)

    # 7. uint8 I/O: byte source/tiles + D3D UNORM encode at the store,
    # bit-identical to decode -> float kernel -> encode.
    print("uint8 I/O:")
    from fsr_tpu.utils import image as im

    img8 = (rng.uniform(0, 1, (3, 270, 480)) * 255).astype(np.uint8)
    con8 = EasuConstants.create((480, 270), None, (960, 540))
    wantf = np.asarray(fused.upscale_fused(
        jnp.asarray(im.from_uint8(img8)), (540, 960), con8, rcon))
    got = np.asarray(fused.upscale_fused(
        jnp.asarray(img8), (540, 960), con8, rcon, out_dtype=jnp.uint8))
    d8 = int(np.abs(got.astype(np.int32)
                    - im.to_uint8(wantf).astype(np.int32)).max())
    ok = d8 == 0
    print(f"  {'PASS' if ok else 'FAIL'} fused-2x u8->u8: max code dev {d8}")
    if not ok:
        failures.append("fused u8")
    img8g = (rng.uniform(0, 1, (3, 360, 854)) * 255).astype(np.uint8)
    con8g = EasuConstants.create((854, 360), None, (1281, 540))
    wantg = np.asarray(easu_gather.easu_gather(
        jnp.asarray(im.from_uint8(img8g)), (540, 1281), con8g, rcon,
        apply_rcas=True))
    gotg = np.asarray(easu_gather.easu_gather(
        jnp.asarray(img8g), (540, 1281), con8g, rcon, apply_rcas=True,
        out_dtype=jnp.uint8))
    d8g = int(np.abs(gotg.astype(np.int32)
                     - im.to_uint8(wantg).astype(np.int32)).max())
    ok = d8g == 0
    print(f"  {'PASS' if ok else 'FAIL'} gather u8->u8 (1.5x): max code dev {d8g}")
    if not ok:
        failures.append("gather u8")

    # Fused texture dither (128x128 page, periodic in-kernel slices).
    page = rng.uniform(0, 1, (128, 128)).astype(np.float32)
    got_td = np.asarray(fused.upscale_fused(
        jnp.asarray(im.from_uint8(img8)), (540, 960), con8, rcon,
        epilogue=Epilogue(dither_bits=10, dither_texture=True),
        dither_page=jnp.asarray(page)))
    want_td = np.asarray(xtr.tepd_quantize(
        jnp.asarray(wantf), xtr.texture_dither((540, 960), 0,
                                               jnp.asarray(page)), bits=10))
    dtd = np.abs(got_td - want_td)
    flips = int((dtd > 4e-5).sum())
    ok = flips <= 1e-4 * dtd.size and dtd.max() <= 2.05 / 1023.0
    print(f"  {'PASS' if ok else 'FAIL'} fused-2x texture dither: "
          f"flips={flips}/{dtd.size} max|Δ|={dtd.max():.3g}")
    if not ok:
        failures.append("texture dither")

    # uint16 (10-bit UNORM codes, the RGB10A2 analog), integer-packed.
    got16 = np.asarray(fused.upscale_fused(
        jnp.asarray(img8), (540, 960), con8, rcon, out_dtype=jnp.uint16))
    d16 = int(np.abs(got16.astype(np.int32)
                     - im.to_uint10(wantf).astype(np.int32)).max())
    ok = d16 == 0
    print(f"  {'PASS' if ok else 'FAIL'} fused-2x u8->u16 codes: max dev {d16}")
    if not ok:
        failures.append("fused u16")
    got16g = np.asarray(easu_gather.easu_gather(
        jnp.asarray(img8g), (540, 1281), con8g, rcon, apply_rcas=True,
        out_dtype=jnp.uint16))
    d16g = int(np.abs(got16g.astype(np.int32)
                      - im.to_uint10(wantg).astype(np.int32)).max())
    ok = d16g == 0
    print(f"  {'PASS' if ok else 'FAIL'} gather u8->u16 codes: max dev {d16g}")
    if not ok:
        failures.append("gather u16")

    got_r8 = np.asarray(rcas_pallas.rcas_fused(jnp.asarray(img8), rcon))
    want_r8 = im.to_uint8(np.asarray(rcas_pallas.rcas_fused(
        jnp.asarray(im.from_uint8(img8)), rcon)))
    dr8 = int(np.abs(got_r8.astype(np.int32) - want_r8.astype(np.int32)).max())
    ok = dr8 == 0
    print(f"  {'PASS' if ok else 'FAIL'} standalone RCAS u8->u8: max dev {dr8}")
    if not ok:
        failures.append("rcas u8")

    # RGBA sharpen: kernel RGB + verbatim alpha (the passthrough rule).
    img4 = rng.uniform(0, 1, (4, 96, 160)).astype(np.float32)
    got4 = np.asarray(fsr_tpu.sharpen(jnp.asarray(img4), impl="pallas"))
    want_rgb = np.asarray(fsr_tpu.sharpen(jnp.asarray(img4[:3]), impl="pallas"))
    ok = np.array_equal(got4[:3], want_rgb) and np.array_equal(got4[3], img4[3])
    print(f"  {'PASS' if ok else 'FAIL'} standalone RCAS RGBA passthrough")
    if not ok:
        failures.append("rcas rgba")

    # Differentiability on hardware (docs/AUTODIFF.md): forward = fused
    # Pallas kernel, backward = the XLA twin's VJP.  With a linear loss the
    # kernel-path gradient must be bit-equal to the impl="xla" gradient.
    print("autodiff (kernel forward, XLA-twin backward):")
    gimg = jnp.asarray(rng.uniform(0.1, 0.9, (3, 270, 480)).astype(np.float32))
    for label, sc in (("2x fused", 2.0), ("1.5x gather", 1.5)):
        g_k = jax.jit(jax.grad(lambda x: jnp.sum(
            fsr_tpu.upscale(x, scale=sc, impl="pallas"))))(gimg)
        g_x = jax.jit(jax.grad(lambda x: jnp.sum(
            fsr_tpu.upscale(x, scale=sc, impl="xla"))))(gimg)
        gk, gx = np.asarray(g_k), np.asarray(g_x)
        ok = np.array_equal(gk, gx) and np.isfinite(gk).all() and \
            np.abs(gk).max() > 0
        print(f"  {'PASS' if ok else 'FAIL'} grad {label}: "
              f"max|Δ|={np.abs(gk - gx).max():.3g}")
        if not ok:
            failures.append(f"grad {label}")

    print("FAILURES:" if failures else "ALL PASS", failures or "")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
