"""Fused Pallas kernel vs the XLA ops path (interpret mode on CPU).

The real-TPU run of the same kernel is exercised by bench.py and the driver;
these tests validate the kernel's tap routing, phase interleave, halo, and
border logic against the already-oracle-verified XLA path.

Tolerance: the kernel's high-precision reciprocals use pl.reciprocal plus a
Newton step (~2 ulp vs exact division), so parity is ~1e-5, not bit-equal.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fsr_tpu.core.constants import EasuConstants, RcasConstants
from fsr_tpu.kernels import fused
from fsr_tpu.ops import easu as easu_ops
from fsr_tpu.ops import rcas as rcas_ops


@pytest.fixture(autouse=True)
def _interpret():
    fused.INTERPRET = True
    yield
    fused.INTERPRET = False


def _con(in_hw, out_hw):
    return EasuConstants.create((in_hw[1], in_hw[0]), None, (out_hw[1], out_hw[0]))


def _xla(img, out_hw, con, rcon, apply_rcas=True, denoise=False):
    out = easu_ops.easu(jnp.asarray(img), out_hw, con)
    if apply_rcas:
        out = rcas_ops.rcas(out, rcon, denoise=denoise)
    return np.asarray(out)


SIZES_2X = [
    ((64, 160), (128, 320)),
    ((67, 131), (134, 262)),  # ragged tiles
    ((32, 640), (64, 1280)),  # wide, multiple col tiles
]


@pytest.mark.parametrize("in_hw,out_hw", SIZES_2X)
def test_fused_matches_xla_2x(rng, in_hw, out_hw):
    img = rng.uniform(0, 1, (3, *in_hw)).astype(np.float32)
    con = _con(in_hw, out_hw)
    rcon = RcasConstants(0.25)
    got = np.asarray(fused.upscale_fused(jnp.asarray(img), out_hw, con, rcon))
    want = _xla(img, out_hw, con, rcon)
    np.testing.assert_allclose(got, want, atol=6e-5, rtol=0)


@pytest.mark.parametrize(
    "in_hw,out_hw,dt",
    [
        ((64, 384), (128, 768), jnp.float32),   # gate-qualifying 2x
        ((64, 384), (256, 1536), jnp.float32),  # 4x (both clamps + masks)
        ((72, 384), (144, 768), jnp.float32),   # odd tile counts
        ((64, 384), (128, 768), jnp.bfloat16),  # bf16 frames in
    ],
)
def test_fused_inkernel_pad_bit_equal(rng, in_hw, out_hw, dt):
    """In-kernel pad mode (clamped aligned windows + border fix-ups, no
    edge_pad pass) is bit-identical to the edge-padded path.  Sizes are
    chosen to hit the 8-row/128-lane gate (8 | hin, 128 | win)."""
    img = jnp.asarray(rng.uniform(0, 1, (3, *in_hw)).astype(np.float32))
    if dt == jnp.bfloat16:
        img = img.astype(jnp.bfloat16)
    con = _con(in_hw, out_hw)
    rcon = RcasConstants(0.25)
    assert fused.INKERNEL_PAD
    try:
        fused.upscale_fused.clear_cache()
        got = np.asarray(
            fused.upscale_fused(img, out_hw, con, rcon, compute_dtype=dt)
        )
        fused.INKERNEL_PAD = False
        fused.upscale_fused.clear_cache()
        want = np.asarray(
            fused.upscale_fused(img, out_hw, con, rcon, compute_dtype=dt)
        )
    finally:
        fused.INKERNEL_PAD = True
        fused.upscale_fused.clear_cache()
    assert np.array_equal(got, want)


def test_fused_2x_tall_divisor_tile(rng):
    """qy=2 pack path prefers the tallest exact row-divisor tj <= 120 and
    the widest exact-divisor ti: ragged last-tile overcompute disappears
    (round-5 hardware sweep: (120, 640) runs the 4K headline at 1.002 ms
    vs the old (40, 384)'s 1.114, bit-exact).  hpl=192 picks tj=96 here
    (two row tiles); output must be bit-equal to the XLA assembly."""
    assert fused._pick_tiles(1080, 1920, 2, 2, pack=True) == (120, 640)
    assert fused._pick_tiles(1080, 1920, 2, 2, pack=True, out8=True) == (48, 640)
    assert fused._pick_tiles(540, 960, 2, 2, pack=True) == (40, 512)
    in_hw, out_hw = (192, 128), (384, 256)
    assert fused._pick_tiles(192, 128, 2, 2, pack=True) == (96, 128)
    img = jnp.asarray(
        rng.uniform(0, 1, (3, *in_hw)).astype(np.float32), jnp.bfloat16)
    con, rcon = _con(in_hw, out_hw), RcasConstants(0.25)
    got = np.asarray(fused.upscale_fused(
        img, out_hw, con, rcon, compute_dtype=jnp.bfloat16))
    want = np.asarray(fused.upscale_fused(
        img, out_hw, con, rcon, compute_dtype=jnp.bfloat16, assemble="xla"))
    assert np.array_equal(got, want)


def test_fused_4x(rng):
    # qx = qy = 4 (exact binary scale): 4-way riffle assembly.
    in_hw, out_hw = (32, 64), (128, 256)
    img = rng.uniform(0, 1, (3, *in_hw)).astype(np.float32)
    con = _con(in_hw, out_hw)
    st = fused._phase_structure(con, out_hw)
    assert st is not None and (st[0], st[1]) == (4, 4)
    assert fused.supported((3, *in_hw), out_hw, con, jnp.float32)
    rcon = RcasConstants(0.25)
    got = np.asarray(fused.upscale_fused(jnp.asarray(img), out_hw, con, rcon))
    want = _xla(img, out_hw, con, rcon)
    np.testing.assert_allclose(got, want, atol=6e-5, rtol=0)


def test_fused_4x_pack_paths_tall(rng):
    """4x pack assemblies at hpl > 40 (tall planes pick the pack tj, which
    at qy=4 must be a power of two — the second pack level riffles packed
    rows).  Covers the tile plan the old tj=40/48 pick broke at 4K, and
    the RCAS-fused ti<=256 VMEM cap (4x plane scratch OOMs at ti=512 on
    hardware)."""
    in_hw, out_hw = (48, 128), (192, 512)  # hpl=48 > 40
    img = rng.uniform(0, 1, (3, *in_hw)).astype(np.float32)
    con, rcon = _con(in_hw, out_hw), RcasConstants(0.25)
    tj, ti = fused._pick_tiles(48, 128, 4, 4, pack=True)
    assert tj & (tj - 1) == 0 and ti <= 256
    # bf16 row-pack: bit-equal to the same compute with XLA assembly.
    bimg = jnp.asarray(img, jnp.bfloat16)
    got = np.asarray(fused.upscale_fused(
        bimg, out_hw, con, rcon, compute_dtype=jnp.bfloat16))
    want = np.asarray(fused.upscale_fused(
        bimg, out_hw, con, rcon, compute_dtype=jnp.bfloat16,
        assemble="xla"))
    assert np.array_equal(got, want)
    # u8 codes (pack_codes): exact vs host-encoded float output.
    from fsr_tpu.utils import image as im
    base = np.asarray(fused.upscale_fused(jnp.asarray(img), out_hw, con, rcon))
    got8 = np.asarray(fused.upscale_fused(
        jnp.asarray(img), out_hw, con, rcon, out_dtype=jnp.uint8))
    np.testing.assert_array_equal(got8, im.to_uint8(base))
    # u16 10-bit codes (pack_codes16).
    got16 = np.asarray(fused.upscale_fused(
        jnp.asarray(img), out_hw, con, rcon, out_dtype=jnp.uint16))
    np.testing.assert_array_equal(got16, im.to_uint10(base))


def test_fused_easu_only(rng):
    in_hw, out_hw = (48, 144), (96, 288)
    img = rng.uniform(0, 1, (3, *in_hw)).astype(np.float32)
    con = _con(in_hw, out_hw)
    got = np.asarray(
        fused.upscale_fused(jnp.asarray(img), out_hw, con, RcasConstants(0.0), apply_rcas=False)
    )
    want = _xla(img, out_hw, con, None, apply_rcas=False)
    np.testing.assert_allclose(got, want, atol=6e-5, rtol=0)


def test_fused_denoise(rng):
    in_hw, out_hw = (48, 144), (96, 288)
    img = rng.uniform(0, 1, (3, *in_hw)).astype(np.float32)
    con = _con(in_hw, out_hw)
    rcon = RcasConstants(0.5)
    got = np.asarray(
        fused.upscale_fused(jnp.asarray(img), out_hw, con, rcon, denoise=True)
    )
    want = _xla(img, out_hw, con, rcon, denoise=True)
    np.testing.assert_allclose(got, want, atol=6e-5, rtol=0)


def test_fused_batched(rng):
    in_hw, out_hw = (32, 140), (64, 280)
    imgs = rng.uniform(0, 1, (2, 3, *in_hw)).astype(np.float32)
    con = _con(in_hw, out_hw)
    rcon = RcasConstants(0.25)
    got = np.asarray(fused.upscale_fused(jnp.asarray(imgs), out_hw, con, rcon))
    assert got.shape == (2, 3, *out_hw)
    for i in range(2):
        want = _xla(imgs[i], out_hw, con, rcon)
        np.testing.assert_allclose(got[i], want, atol=6e-5, rtol=0)


def test_fused_isolated_bright_pixel(rng):
    # The RCAS NaN-drop path inside the kernel (rcp_fast NaN at 0 behaves
    # like division's inf here).
    in_hw, out_hw = (32, 130), (64, 260)
    img = np.zeros((3, *in_hw), np.float32)
    img[:, 16, 60] = 0.5
    con = _con(in_hw, out_hw)
    rcon = RcasConstants(0.0)
    got = np.asarray(fused.upscale_fused(jnp.asarray(img), out_hw, con, rcon))
    want = _xla(img, out_hw, con, rcon)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=6e-5, rtol=0)


def test_phase_structure_detection():
    # 2x exact-binary: q=(2,2); 1.5x breaks the float32 pattern -> None.
    con2 = _con((540, 960), (1080, 1920))
    st = fused._phase_structure(con2, (1080, 1920))
    assert st is not None and (st[0], st[1]) == (2, 2)
    assert st[4] == [np.float32(0.75), np.float32(0.25)]
    con15 = _con((720, 1280), (1080, 1920))
    assert fused._phase_structure(con15, (1080, 1920)) is None


def test_supported_gating():
    con = _con((540, 960), (1080, 1920))
    assert fused.supported((3, 540, 960), (1080, 1920), con, jnp.float32)
    assert fused.supported((3, 540, 960), (1080, 1920), con, jnp.bfloat16)
    # fp16 has no Mosaic vector type on current targets -> XLA path.
    assert not fused.supported((3, 540, 960), (1080, 1920), con, jnp.float16)
    # RGBA rides the kernel natively (in-kernel bilinear alpha).
    assert fused.supported((4, 540, 960), (1080, 1920), con, jnp.float32)
    assert not fused.supported((2, 540, 960), (1080, 1920), con, jnp.float32)


def test_riffle_correctness():
    # pltpu.roll is a Pallas primitive; run the riffle inside a kernel.
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def via_kernel(fn, out_shape, *xs):
        def k(*refs):
            out_ref = refs[-1]
            out_ref[:] = fn(*(r[:] for r in refs[:-1]))

        return np.asarray(
            pl.pallas_call(
                k,
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
                interpret=True,
            )(*xs)
        )

    a = jnp.arange(16, dtype=jnp.float32).reshape(2, 8)
    b = -a
    r = via_kernel(lambda x, y: fused._riffle2(x, y, axis=1), (2, 16), a, b)
    want = np.empty((2, 16), np.float32)
    want[:, 0::2] = np.asarray(a)
    want[:, 1::2] = np.asarray(b)
    np.testing.assert_array_equal(r, want)
    # 4-way, and axis 0
    planes = [jnp.full((2, 8), i, jnp.float32) for i in range(4)]
    r4 = via_kernel(lambda *ps: fused._riffle(list(ps), axis=1), (2, 32), *planes)
    np.testing.assert_array_equal(r4[0, :8], [0, 1, 2, 3, 0, 1, 2, 3])
    r0 = via_kernel(lambda x, y: fused._riffle2(x, y, axis=0), (4, 8), a, b)
    want0 = np.empty((4, 8), np.float32)
    want0[0::2] = np.asarray(a)
    want0[1::2] = np.asarray(b)
    np.testing.assert_array_equal(r0, want0)


def test_fused_rgba_alpha(rng):
    """RGBA through the kernel: one dispatch, RGB identical to the
    3-channel kernel result, alpha bit-equal to ops.easu.bilinear (same
    f32 op order), never sharpened (ffx_fsr1.h:688-705 passthrough)."""
    in_hw, out_hw = (40, 144), (80, 288)
    img = rng.uniform(0, 1, (4, *in_hw)).astype(np.float32)
    con, rcon = _con(in_hw, out_hw), RcasConstants(0.25)
    out = np.asarray(
        fused.upscale_fused(jnp.asarray(img), out_hw, con, rcon)
    )
    assert out.shape == (4, *out_hw)
    want_rgb = np.asarray(
        fused.upscale_fused(jnp.asarray(img[:3]), out_hw, con, rcon)
    )
    np.testing.assert_array_equal(out[:3], want_rgb)
    want_a = np.asarray(easu_ops.bilinear(jnp.asarray(img[3:4]), out_hw, con))
    np.testing.assert_allclose(out[3:4], want_a, atol=1e-7, rtol=0)


def test_fused_rgba_alpha_epilogue(rng):
    """Epilogue post-ops (gamma2 here) touch RGB only; alpha rides along."""
    from fsr_tpu.kernels.epilogue import Epilogue

    in_hw, out_hw = (40, 144), (80, 288)
    img = rng.uniform(0, 1, (4, *in_hw)).astype(np.float32)
    con, rcon = _con(in_hw, out_hw), RcasConstants(0.25)
    out = np.asarray(fused.upscale_fused(
        jnp.asarray(img), out_hw, con, rcon,
        epilogue=Epilogue(transform="gamma2"),
    ))
    base = np.asarray(
        fused.upscale_fused(jnp.asarray(img), out_hw, con, rcon)
    )
    np.testing.assert_allclose(out[:3], base[:3] ** 2, atol=2e-6, rtol=0)
    np.testing.assert_array_equal(out[3], base[3])


def test_fused_rgba_alpha_bf16_easu_only(rng):
    in_hw, out_hw = (40, 128), (80, 256)
    img = rng.uniform(0, 1, (4, *in_hw)).astype(np.float32)
    con = _con(in_hw, out_hw)
    out = np.asarray(fused.upscale_fused(
        jnp.asarray(img, dtype=jnp.bfloat16), out_hw, con, None,
        apply_rcas=False, compute_dtype=jnp.bfloat16,
    ).astype(jnp.float32))
    assert out.shape == (4, *out_hw)
    want_a = np.asarray(easu_ops.bilinear(jnp.asarray(img[3:4]), out_hw, con))
    # bf16 storage: alpha is the f32 bilinear rounded to bf16.
    np.testing.assert_allclose(out[3:4], want_a, atol=4e-3, rtol=0)
