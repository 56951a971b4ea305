"""Top-level user API: `upscale()` and the full FSR pipeline.

This replaces the reference's L2 pass orchestration (FSR_Filter::Upscale,
sample/src/DX12/FSR_Filter.cpp:101-133): constant setup on the host, EASU,
then RCAS.  On TPU the two passes are either fused into a single Pallas
kernel (no intermediate HBM round-trip — the reference pays one via its
intermediary render target, FSR_Filter.cpp:72-73) or run as two XLA ops.

Layouts: the native layout is planar channels-first (..., C, H, W) — C maps
to separate VMEM planes and W to TPU lanes.  (H, W, C) inputs are accepted
and transposed (`layout="HWC"`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


from fsr_tpu.core.constants import EasuConstants, RcasConstants
from fsr_tpu.core.presets import PRESETS, Preset
from fsr_tpu.ops import easu as easu_ops
from fsr_tpu.ops import rcas as rcas_ops
from fsr_tpu.ops import extras

__all__ = ["upscale", "sharpen", "UpscalePipeline"]


def _resolve_out_size(
    in_size: Tuple[int, int],
    out_size: Optional[Tuple[int, int]],
    scale: Optional[float],
    preset: Optional[str],
) -> Tuple[int, int]:
    if out_size is not None:
        return (int(out_size[0]), int(out_size[1]))
    if preset is not None:
        if preset not in PRESETS:
            raise ValueError(
                f"unknown preset {preset!r}; available: {sorted(PRESETS)}"
            )
        scale = PRESETS[preset].scale
    if scale is None:
        raise ValueError("provide one of out_size=, scale=, or preset=")
    return (round(in_size[0] * scale), round(in_size[1] * scale))


def _encode_u8(x):
    from fsr_tpu.kernels.epilogue import encode_unorm8

    return encode_unorm8(x)


def _apply_epilogue_xla(out, epi, frame, grain, dither_page=None, origin=(0, 0)):
    """XLA-path twin of the kernels' fused epilogue (see
    kernels/epilogue.py).  Consistent within the 1/255 fidelity budget:
    the kernel prologue/epilogue use approx.rcp_fast for srtm/srtm_inv
    while ops.extras divides exactly, so impl='auto' results can differ
    by ~ulps between the TPU and XLA paths.

    origin: (row0, col0) global coordinate of out[..., 0, 0] — spatially
    sharded callers pass each shard's offset so dither positions match the
    unsharded frame."""
    dt = out.dtype
    x = out.astype(jnp.float32)
    if epi.transform == "srtm_inv":
        x = extras.srtm_inv(x)
    elif epi.transform == "gamma2":
        x = x * x
    if epi.needs_grain:
        if grain is None:
            raise ValueError("epilogue.grain_amount != 0 requires grain")
        x = extras.lfga(x, jnp.asarray(grain, jnp.float32), epi.grain_amount)
    if epi.dither_bits is not None:
        if epi.dither_texture:
            if dither_page is None:
                raise ValueError("epilogue.dither_texture requires dither_page")
            dit = extras.texture_dither(x.shape[-2:], 0, dither_page, origin=origin)
        else:
            dit = extras.tepd_dither(
                x.shape[-2:], 0 if frame is None else frame, origin=origin
            )
        x = extras.tepd_quantize(x, dit, bits=epi.dither_bits)
    return x.astype(dt)


def upscale(
    image: jnp.ndarray,
    out_size: Optional[Tuple[int, int]] = None,
    scale: Optional[float] = None,
    preset: Optional[str] = None,
    sharpness: float = 0.25,
    apply_rcas: bool = True,
    denoise: bool = False,
    compute_dtype=jnp.float32,
    impl: str = "auto",
    layout: str = "CHW",
    input_viewport: Optional[Tuple[int, int]] = None,
    input_offset: Tuple[int, int] = (0, 0),
    epilogue=None,
    frame=None,
    grain=None,
    grain_planar=None,
    prologue: str = "none",
    out_dtype=None,
    dither_page=None,
) -> jnp.ndarray:
    """FSR 1.0 upscale: EASU + optional RCAS.

    image: (..., 3, H, W) planar (layout="CHW", default) or (..., H, W, 3)
      (layout="HWC").  Values must be in [0, 1] (tonemapped, perceptual
      encoding ~gamma 2.0 — see ffx_fsr1.h:82-94 input requirements).
    out_size / scale / preset: target size (one of the three).  Presets:
      ultra_quality 1.3x, quality 1.5x, balanced 1.7x, performance 2.0x.
    sharpness: RCAS sharpness in stops (0 = maximum; sample default 0.25).
    compute_dtype: float32 | float16 | bfloat16.
    impl: "auto" | "xla" | "pallas".  "auto" uses the fused Pallas kernel
      when running on TPU and the scale is supported, else the XLA path.
    input_viewport / input_offset: Dynamic Resolution Scaling support — the
      viewport (h, w) actually rendered inside the container image, and its
      offset (FsrEasuConOffset, ffx_fsr1.h:205-225).
    epilogue: optional fsr_tpu.kernels.epilogue.Epilogue of output post-ops
      (SRTM^-1 / gamma2 transform, LFGA grain, TEPD dithered quantize).
      On the kernel path these fuse into the writeback (no extra HBM
      passes); on the XLA path the same ops run via fsr_tpu.ops.extras, so
      results are backend-consistent.  `frame` is the TEPD temporal index;
      `grain` is (3, Hout, Wout) in {-0.5..0.5}; `grain_planar` optionally
      supplies the pre-phase-planarized grain for the 2x kernel (see
      fused.planarize_grain — UpscalePipeline caches this for you).
      Epilogue ops apply to RGB only (alpha rides along untouched).
    prologue: "none" | "srtm" — SRTM reversible tonemap applied to the
      (RGB) input before EASU, fused into the kernel's tile load on the
      kernel path.
    RGBA: the kernels resolve alpha in-kernel (bilinear, never sharpened —
      the RCAS passthrough rule, ffx_fsr1.h:688-705), so a 4-channel
      upscale is still one kernel dispatch; the XLA path runs the same
      bilinear as a separate pass.
    uint8 I/O (byte video pipelines): a uint8 image is decoded v/255
      (in-kernel on the TPU path — the source and tile DMAs stay bytes);
      out_dtype=jnp.uint8 encodes floor(sat(v)*255+0.5) (the D3D UNORM
      rule) at the kernel store — with dither_bits=8 the byte is the
      display code.  Otherwise out_dtype must match compute_dtype.
    """
    if layout == "HWC":
        image = jnp.moveaxis(image, -1, -3)
    elif layout != "CHW":
        raise ValueError(f"unknown layout {layout!r}")

    hin, win = image.shape[-2:]
    vp = input_viewport if input_viewport is not None else (hin, win)
    out_hw = _resolve_out_size(vp, out_size, scale, preset)
    con = EasuConstants.create(
        input_viewport_in_pixels=(vp[1], vp[0]),
        input_size_in_pixels=(win, hin),
        output_size_in_pixels=(out_hw[1], out_hw[0]),
        input_offset_in_pixels=(input_offset[1], input_offset[0]),
    )
    rcon = RcasConstants(sharpness_stops=float(sharpness))

    if out_dtype is not None and jnp.dtype(out_dtype) not in (
        jnp.uint8, jnp.uint16, jnp.dtype(compute_dtype)
    ):
        raise ValueError(
            "out_dtype must be uint8/uint16 or match compute_dtype "
            f"(got {jnp.dtype(out_dtype)} vs {jnp.dtype(compute_dtype)})"
        )
    if (
        epilogue is not None
        and epilogue.dither_bits == 10
        and out_dtype is not None
        and jnp.dtype(out_dtype) == jnp.uint8
    ):
        # 10-bit TEPD codes k/1023 are not representable as x255 UNORM
        # bytes (mirrors UpscalePipeline's constructor check).
        raise ValueError("uint8 output cannot hold 10-bit codes")
    use_pallas = False
    if impl in ("auto", "pallas"):
        from fsr_tpu.kernels import dispatch as kdispatch

        use_pallas = kdispatch.supported(image, out_hw, con, compute_dtype,
                                         out_dtype=out_dtype)
        if impl == "pallas" and not use_pallas:
            raise ValueError(
                "pallas path does not support this configuration "
                f"(in={image.shape} out={out_hw} dtype={compute_dtype})"
            )

    # Alpha handling is backend-independent: EASU defines no alpha semantics
    # (the reference's passthrough flag applies to RCAS, ffx_fsr1.h:688-705),
    # so alpha rides along bilinearly and is never sharpened — on both the
    # kernel and the XLA path, so impl="auto" gives identical results.
    # The phase-decomposed kernel resolves alpha in-kernel (one dispatch);
    # other paths split it into a bilinear pass and concat.
    u8_in = image.dtype == jnp.uint8
    u8_out = out_dtype is not None and jnp.dtype(out_dtype) == jnp.uint8
    u16_out = out_dtype is not None and jnp.dtype(out_dtype) == jnp.uint16
    alpha = None
    rgb = image
    if image.shape[-3] == 4:
        kernel_alpha = use_pallas
        if use_pallas:
            from fsr_tpu.kernels import dispatch as kdispatch

            kernel_alpha = kdispatch.supports_alpha(
                image, out_hw, con, compute_dtype, out_dtype=out_dtype
            )
        if not kernel_alpha:
            a_src = image[..., 3:4, :, :]
            if u8_in:
                a_src = a_src.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
            alpha = easu_ops.bilinear(a_src, out_hw, con)
            rgb = image[..., :3, :, :]

    if epilogue is not None and epilogue.is_noop:
        epilogue = None
    if use_pallas:
        from fsr_tpu import autodiff
        from fsr_tpu.kernels import dispatch as kdispatch

        # Traced auxiliaries must ride as custom_vjp operands (closures in
        # a custom_vjp body may not capture tracers); static values stay
        # closed over.
        aux, statics = {}, {}
        for name, val in (("frame", frame), ("grain", grain),
                          ("grain_planar", grain_planar),
                          ("dither_page", dither_page)):
            if val is not None:
                (aux if autodiff.is_traced(val) else statics)[name] = val

        def _kernel(img, ax):
            m = {**statics, **ax}
            return kdispatch.upscale_fused(
                img, out_hw, con, rcon,
                apply_rcas=apply_rcas, denoise=denoise,
                compute_dtype=compute_dtype, epilogue=epilogue,
                frame=m.get("frame"), grain=m.get("grain"),
                grain_planar=m.get("grain_planar"), prologue=prologue,
                out_dtype=out_dtype, dither_page=m.get("dither_page"),
            )

        def _xla_twin(img, ax):
            # The exact impl="xla" math over the kernel's operands (RGBA
            # when the kernel resolves alpha natively), for the backward
            # pass — see fsr_tpu.autodiff.
            m = {**statics, **ax}
            a = None
            t = img
            if t.shape[-3] == 4:
                a = easu_ops.bilinear(t[..., 3:4, :, :], out_hw, con)
                t = t[..., :3, :, :]
            if prologue == "srtm":
                t = extras.srtm(t)
            o = easu_ops.easu(t, out_hw, con, compute_dtype=compute_dtype)
            if apply_rcas:
                o = rcas_ops.rcas(o, rcon, denoise=denoise,
                                  compute_dtype=compute_dtype)
            if epilogue is not None:
                o = _apply_epilogue_xla(o, epilogue, m.get("frame"),
                                        m.get("grain"),
                                        dither_page=m.get("dither_page"))
            if out_dtype is not None:
                o = o.astype(out_dtype)
            if a is not None:
                o = jnp.concatenate([o, a.astype(o.dtype)], axis=-3)
            return o

        # Differentiable when gradients can flow at all (float in/out) and
        # the twin can reproduce the kernel's grain (plain grain present
        # whenever planar grain is).
        diffable = (
            jnp.issubdtype(rgb.dtype, jnp.floating)
            and not u8_out and not u16_out
            and not (grain is None and grain_planar is not None)
        )
        if diffable:
            out = autodiff.kernel_with_xla_vjp(_kernel, _xla_twin, rgb, aux)
        else:
            out = _kernel(rgb, aux)
    else:
        if u8_in:
            rgb = rgb.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
        if prologue == "srtm":
            rgb = extras.srtm(rgb)
        elif prologue != "none":
            raise ValueError(f"unknown prologue {prologue!r}")
        out = easu_ops.easu(rgb, out_hw, con, compute_dtype=compute_dtype)
        if apply_rcas:
            out = rcas_ops.rcas(out, rcon, denoise=denoise, compute_dtype=compute_dtype)
        if epilogue is not None:
            out = _apply_epilogue_xla(out, epilogue, frame, grain,
                                      dither_page=dither_page)
        if u8_out:
            out = _encode_u8(out)
        elif u16_out:
            from fsr_tpu.kernels.epilogue import encode_unorm10

            out = encode_unorm10(out)
        elif out_dtype is not None:
            out = out.astype(out_dtype)
    if alpha is not None:
        if u8_out:
            alpha = _encode_u8(alpha)
        elif u16_out:
            from fsr_tpu.kernels.epilogue import encode_unorm10

            alpha = encode_unorm10(alpha)
        out = jnp.concatenate([out, alpha.astype(out.dtype)], axis=-3)

    if layout == "HWC":
        out = jnp.moveaxis(out, -3, -1)
    return out


def sharpen(
    image: jnp.ndarray,
    sharpness: float = 0.25,
    denoise: bool = False,
    compute_dtype=None,
    impl: str = "auto",
    layout: str = "CHW",
    border: str = "clamp",
) -> jnp.ndarray:
    """Standalone RCAS sharpening (no scaling) — the reference supports RCAS
    as an independent pass (ffx_fsr1.h:602-608).

    image: (..., 3, H, W) or (..., 3+alpha, H, W); values in [0, 1].
    border: "clamp" (edge replication) or "zero" (the sample's out-of-bounds
    imageLoad behavior; darkens the 1-pixel border — kept for A/B parity).
    """
    if layout == "HWC":
        image = jnp.moveaxis(image, -1, -3)
    elif layout != "CHW":
        raise ValueError(f"unknown layout {layout!r}")
    rcon = RcasConstants(sharpness_stops=float(sharpness))

    u8 = image.dtype == jnp.uint8
    use_kernel = False
    if impl in ("auto", "pallas") and image.shape[-3] in (3, 4):
        import jax

        try:
            use_kernel = jax.devices()[0].platform == "tpu"
        except RuntimeError:
            use_kernel = False
        if u8 and image.shape[-2] < 32:
            use_kernel = False  # 8-bit block granule; XLA path below
    if impl == "pallas" and not use_kernel:
        raise ValueError("pallas RCAS needs a TPU and a 3/4-channel image")

    if use_kernel:
        from fsr_tpu import autodiff
        from fsr_tpu.kernels import rcas_pallas

        # RCAS alpha passthrough (ffx_fsr1.h:688-705) at identical size is
        # a verbatim copy: sharpen RGB in the kernel, carry alpha as-is.
        rgb_in = image[..., :3, :, :] if image.shape[-3] == 4 else image

        def _kernel(img, ax):
            return rcas_pallas.rcas_fused(
                img, rcon, denoise=denoise, compute_dtype=compute_dtype,
                border=border,
            )

        def _xla_twin(img, ax):
            return rcas_ops.rcas(img, rcon, denoise=denoise,
                                 compute_dtype=compute_dtype, border=border)

        if jnp.issubdtype(rgb_in.dtype, jnp.floating):
            out = autodiff.kernel_with_xla_vjp(_kernel, _xla_twin, rgb_in, {})
        else:
            out = _kernel(rgb_in, {})
        if image.shape[-3] == 4:
            out = jnp.concatenate(
                [out, image[..., 3:4, :, :].astype(out.dtype)], axis=-3
            )
    else:
        if u8:
            # The Pallas kernel always sharpens bytes in f32 before the
            # UNORM encode; force the same here so uint8 outputs are
            # bit-stable across impl/platform regardless of compute_dtype.
            image = image.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
            compute_dtype = jnp.float32
        out = rcas_ops.rcas(
            image, rcon, denoise=denoise, compute_dtype=compute_dtype, border=border
        )
        if u8:
            out = _encode_u8(out)
    if layout == "HWC":
        out = jnp.moveaxis(out, -3, -1)
    return out


class UpscalePipeline:
    """Full post-process chain, mirroring the sample's frame tail:

    (optional SRTM for HDR) -> EASU -> RCAS -> (optional SRTM^-1 back to
    HDR, or gamma2 -> linear output squaring) -> (optional LFGA grain)
    -> (optional TEPD dither to 8/10-bit gamma-2.0).

    Construct once with static configuration; `__call__` is jit-compatible.

    hdr_srtm / hdr_out: the reference pairs the reversible tonemap with its
    inverse around the filter chain for HDR inputs (ffx_fsr1.h:1039-1041);
    hdr_out=True applies SRTM^-1 after sharpening so the pipeline returns
    HDR values (requires hdr_srtm).
    gamma2_out: square the output (gamma-2.0 -> linear), the sample's HDR
    swapchain mode (Sample.x == 1, FSR_Pass.hlsl:78-79).
    dither_texture: optional (pages, th, tw) dither texture page-indexed by
    frame (the sample's temporal blue noise, FSR_Tonemapping.hlsl:86-88;
    see fsr_tpu.utils.noise.temporal_blue_noise).  Default: the TEPD
    golden-ratio ordered dither.
    mesh / spatial_axis / batch_axis: optional multi-chip execution — each
    frame row-shards across `mesh[spatial_axis]` (any upscale ratio; halo
    exchange over ICI) and the batch over `batch_axis`, via
    parallel.spatial.upscale_spatial_sharded.  The fused epilogue rides
    per-shard global coordinates, so output matches single-device.
    """

    def __init__(
        self,
        out_size: Tuple[int, int],
        sharpness: float = 0.25,
        apply_rcas: bool = True,
        denoise: bool = False,
        hdr_srtm: bool = False,
        hdr_out: bool = False,
        gamma2_out: bool = False,
        grain_amount: float = 0.0,
        dither_bits: Optional[int] = None,
        dither_texture=None,
        compute_dtype=jnp.float32,
        impl: str = "auto",
        out_dtype=None,
        mesh=None,
        spatial_axis: str = "sp",
        batch_axis: Optional[str] = None,
    ):
        if out_dtype is not None and jnp.dtype(out_dtype) in (jnp.uint8,
                                                              jnp.uint16):
            if hdr_out:
                raise ValueError("integer output cannot hold HDR values")
            if dither_bits == 10 and jnp.dtype(out_dtype) == jnp.uint8:
                raise ValueError("uint8 output cannot hold 10-bit codes")
        if hdr_out and not hdr_srtm:
            raise ValueError("hdr_out=True requires hdr_srtm=True")
        if hdr_out and gamma2_out:
            raise ValueError("hdr_out and gamma2_out are exclusive output modes")
        if hdr_out and dither_bits is not None:
            raise ValueError("TEPD dithering expects {0..1} input, not HDR out")
        self.out_size = tuple(out_size)
        self.sharpness = sharpness
        self.apply_rcas = apply_rcas
        self.denoise = denoise
        self.hdr_srtm = hdr_srtm
        self.hdr_out = hdr_out
        self.gamma2_out = gamma2_out
        self.grain_amount = grain_amount
        self.dither_bits = dither_bits
        self.dither_texture = (
            jnp.asarray(dither_texture) if dither_texture is not None else None
        )
        self.compute_dtype = compute_dtype
        self.impl = impl
        self.out_dtype = out_dtype
        self.mesh = mesh
        self.spatial_axis = spatial_axis
        self.batch_axis = batch_axis
        self._grain_cache = []

    def _planar_grain(self, grain, in_hw):
        """Phase-planar grain for the 2x kernel, cached per (grain, size).

        The planarize transpose costs a full-frame pass, so it runs once
        per grain texture.  The cache holds the grain array itself and
        compares identity (a bare id() key could be recycled after the
        array is collected and silently serve a stale texture); a few
        entries are kept so alternating grain pages don't thrash.
        Returns None off-TPU (only the fused kernel consumes the planar
        layout), when the phase structure doesn't apply (the gather
        kernel takes plain grain), or when `grain` is a tracer (jitted
        per-frame grain: pass grain_planar to upscale() yourself).
        """
        from fsr_tpu.kernels import dispatch, fused

        if not dispatch._on_tpu():
            return None
        try:
            is_tracer = isinstance(grain, jax.core.Tracer)
        except AttributeError:  # pragma: no cover - jax.core moved
            is_tracer = False
        in_hw = tuple(in_hw)
        if not is_tracer:
            for g, hw, gp in self._grain_cache:
                if g is grain and hw == in_hw:
                    return gp
        con = EasuConstants.create(
            (in_hw[1], in_hw[0]), None, (self.out_size[1], self.out_size[0])
        )
        if not fused.supported((3, *in_hw), self.out_size, con,
                               self.compute_dtype, out_dtype=self.out_dtype):
            return None
        gp = fused.planarize_grain(grain, self.out_size, con)
        if not is_tracer:
            self._grain_cache = ([(grain, in_hw, gp)]
                                 + self._grain_cache)[:4]
        return gp

    def __call__(self, image, grain=None, frame=0):
        from fsr_tpu.kernels.epilogue import Epilogue

        x = image
        use_grain = bool(self.grain_amount) and grain is not None
        # TEPD codes are k/255 or k/1023 levels: 16-bit storage cannot hold
        # the 10-bit codes near white, so the dither fuses into the kernel
        # only when the output dtype can hold the codes exactly (f32,
        # uint8 for 8-bit, uint16 for either).  The texture variant fuses
        # too when the page is the sample's 128x128 shape (its tiling then
        # reduces to periodic slices in-kernel); other page sizes run as
        # an XLA after-pass.
        u8_out = (self.out_dtype is not None
                  and jnp.dtype(self.out_dtype) == jnp.uint8)
        u16_out = (self.out_dtype is not None
                   and jnp.dtype(self.out_dtype) == jnp.uint16)
        tex = self.dither_texture
        tex_fusible = tex is not None and tuple(tex.shape[-2:]) == (128, 128)
        fuse_dither = (
            self.dither_bits is not None
            and (tex is None or tex_fusible)
            and (jnp.dtype(self.compute_dtype) == jnp.float32
                 or (u8_out and self.dither_bits == 8)
                 or u16_out)
        )

        def run(fuse):
            epi = Epilogue(
                transform=("srtm_inv" if self.hdr_out
                           else "gamma2" if self.gamma2_out else "none"),
                grain_amount=self.grain_amount if use_grain else 0.0,
                dither_bits=self.dither_bits if fuse else None,
                dither_texture=fuse and tex is not None,
            )
            page = None
            if fuse and tex is not None:
                t3 = tex if tex.ndim == 3 else tex[None]
                page = jax.lax.dynamic_index_in_dim(
                    t3, jnp.asarray(frame, jnp.int32) % t3.shape[0],
                    axis=0, keepdims=False,
                )
            if self.mesh is not None:
                from fsr_tpu.parallel import spatial as spatial_mod

                return spatial_mod.upscale_spatial_sharded(
                    x, self.out_size, self.mesh, axis=self.spatial_axis,
                    batch_axis=self.batch_axis, sharpness=self.sharpness,
                    apply_rcas=self.apply_rcas, denoise=self.denoise,
                    compute_dtype=self.compute_dtype,
                    epilogue=None if epi.is_noop else epi, frame=frame,
                    grain=grain if use_grain else None, dither_page=page,
                    prologue="srtm" if self.hdr_srtm else "none",
                    out_dtype=self.out_dtype if (fuse or
                                                 self.dither_bits is None)
                    else None,
                )
            gp = (self._planar_grain(grain, x.shape[-2:])
                  if use_grain else None)
            return upscale(
                x,
                out_size=self.out_size,
                sharpness=self.sharpness,
                apply_rcas=self.apply_rcas,
                denoise=self.denoise,
                compute_dtype=self.compute_dtype,
                impl=self.impl,
                epilogue=None if epi.is_noop else epi,
                frame=frame,
                grain=grain if use_grain else None,
                grain_planar=gp,
                prologue="srtm" if self.hdr_srtm else "none",
                out_dtype=self.out_dtype if (fuse or
                                             self.dither_bits is None)
                else None,
                dither_page=page,
            )

        if fuse_dither:
            from fsr_tpu.kernels.epilogue import DitherTileError

            try:
                x = run(True)
            except DitherTileError:
                # A tile plan the 128-wide page cannot tile into (very
                # narrow outputs): fall back to the XLA after-pass.  Any
                # other ValueError is a real misconfiguration and raises.
                fuse_dither = False
                x = run(False)
        else:
            x = run(False)
        if self.dither_bits is not None and not fuse_dither:
            if self.dither_texture is not None:
                dit = extras.texture_dither(self.out_size, frame, self.dither_texture)
            else:
                dit = extras.tepd_dither(self.out_size, frame)
            x = extras.tepd_quantize(x.astype(jnp.float32), dit, bits=self.dither_bits)
            if u8_out:
                x = _encode_u8(x)
            elif u16_out:
                from fsr_tpu.kernels.epilogue import encode_unorm10

                x = encode_unorm10(x)
            elif self.out_dtype is not None:
                x = x.astype(self.out_dtype)
        return x
