"""uint8 I/O on the kernels and API (beyond the reference's float-texture
contract, for byte video pipelines).

Contract: uint8 input decodes v/255 (from_uint8); uint8 output encodes
floor(sat(v)*255 + 0.5) (the D3D UNORM rule, to_uint8).  The kernel paths
do both in-VMEM so the HBM-side buffers stay bytes; results must be
bit-identical to decode -> float path -> encode.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import fsr_tpu
from fsr_tpu.core.constants import EasuConstants, RcasConstants
from fsr_tpu.kernels import easu_gather, fused, pad
from fsr_tpu.kernels.epilogue import Epilogue
from fsr_tpu.ops import extras as xtr
from fsr_tpu.utils import image as im


@pytest.fixture(autouse=True)
def _interpret():
    fused.INTERPRET = True
    easu_gather.INTERPRET = True
    pad.INTERPRET = True
    yield
    fused.INTERPRET = False
    easu_gather.INTERPRET = False
    pad.INTERPRET = False


def _con(in_hw, out_hw):
    return EasuConstants.create((in_hw[1], in_hw[0]), None, (out_hw[1], out_hw[0]))


def test_fused_u8_in_matches_decoded(rng):
    in_hw, out_hw = (40, 144), (80, 288)
    img8 = (rng.uniform(0, 1, (3, *in_hw)) * 255).astype(np.uint8)
    con, rcon = _con(in_hw, out_hw), RcasConstants(0.25)
    want = np.asarray(fused.upscale_fused(
        jnp.asarray(im.from_uint8(img8)), out_hw, con, rcon))
    got = np.asarray(fused.upscale_fused(jnp.asarray(img8), out_hw, con, rcon))
    np.testing.assert_array_equal(got, want)


def test_fused_u8_out_codes(rng):
    in_hw, out_hw = (40, 144), (80, 288)
    img8 = (rng.uniform(0, 1, (3, *in_hw)) * 255).astype(np.uint8)
    con, rcon = _con(in_hw, out_hw), RcasConstants(0.25)
    want = im.to_uint8(np.asarray(fused.upscale_fused(
        jnp.asarray(im.from_uint8(img8)), out_hw, con, rcon)))
    got = np.asarray(fused.upscale_fused(
        jnp.asarray(img8), out_hw, con, rcon, out_dtype=jnp.uint8))
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


def test_fused_u8_dithered_display_codes(rng):
    in_hw, out_hw = (40, 144), (80, 288)
    img8 = (rng.uniform(0, 1, (3, *in_hw)) * 255).astype(np.uint8)
    con, rcon = _con(in_hw, out_hw), RcasConstants(0.25)
    base = fused.upscale_fused(
        jnp.asarray(im.from_uint8(img8)), out_hw, con, rcon)
    want = im.to_uint8(np.asarray(xtr.tepd_quantize(
        base, xtr.tepd_dither(out_hw, 1), bits=8)))
    got = np.asarray(fused.upscale_fused(
        jnp.asarray(img8), out_hw, con, rcon, out_dtype=jnp.uint8,
        epilogue=Epilogue(dither_bits=8), frame=1))
    d = np.abs(got.astype(int) - want.astype(int))
    assert (d > 0).sum() <= 4 and d.max() <= 1  # knife-edge dither flips


def test_gather_u8_roundtrip(rng):
    in_hw, out_hw = (48, 160), (72, 240)  # 1.5x gather kernel
    img8 = (rng.uniform(0, 1, (3, *in_hw)) * 255).astype(np.uint8)
    con, rcon = _con(in_hw, out_hw), RcasConstants(0.25)
    want = im.to_uint8(np.asarray(easu_gather.easu_gather(
        jnp.asarray(im.from_uint8(img8)), out_hw, con, rcon, apply_rcas=True)))
    got = np.asarray(easu_gather.easu_gather(
        jnp.asarray(img8), out_hw, con, rcon, apply_rcas=True,
        out_dtype=jnp.uint8))
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


def test_api_u8_xla_path(rng):
    in_hw = (32, 48)
    img8 = (rng.uniform(0, 1, (3, *in_hw)) * 255).astype(np.uint8)
    want = im.to_uint8(np.asarray(fsr_tpu.upscale(
        jnp.asarray(im.from_uint8(img8)), scale=2.0, impl="xla")))
    got = np.asarray(fsr_tpu.upscale(
        jnp.asarray(img8), scale=2.0, impl="xla", out_dtype=jnp.uint8))
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


def test_api_u8_rgba_alpha(rng):
    in_hw = (32, 48)
    img8 = (rng.uniform(0, 1, (4, *in_hw)) * 255).astype(np.uint8)
    got = np.asarray(fsr_tpu.upscale(
        jnp.asarray(img8), scale=2.0, impl="xla", out_dtype=jnp.uint8))
    assert got.shape == (4, 64, 96) and got.dtype == np.uint8
    from fsr_tpu.ops import easu as easu_ops
    con = _con(in_hw, (64, 96))
    want_a = im.to_uint8(np.asarray(easu_ops.bilinear(
        jnp.asarray(im.from_uint8(img8[3:4])), (64, 96), con)))
    np.testing.assert_array_equal(got[3:4], want_a)


def test_pipeline_u8_display_codes(rng):
    in_hw, out_hw = (40, 144), (80, 288)
    img8 = (rng.uniform(0, 1, (3, *in_hw)) * 255).astype(np.uint8)
    pipe = fsr_tpu.UpscalePipeline(out_hw, dither_bits=8, out_dtype=jnp.uint8)
    out = np.asarray(pipe(jnp.asarray(img8), frame=2))
    assert out.dtype == np.uint8 and out.shape == (3, *out_hw)
    # manual: decode -> upscale -> dither -> encode
    x = fsr_tpu.upscale(jnp.asarray(im.from_uint8(img8)), out_size=out_hw)
    x = xtr.tepd_quantize(x, xtr.tepd_dither(out_hw, 2), bits=8)
    np.testing.assert_array_equal(out, im.to_uint8(np.asarray(x)))


def test_pipeline_u8_validation():
    with pytest.raises(ValueError):
        fsr_tpu.UpscalePipeline((64, 128), dither_bits=10, out_dtype=jnp.uint8)
    with pytest.raises(ValueError):
        fsr_tpu.UpscalePipeline((64, 128), hdr_srtm=True, hdr_out=True,
                                out_dtype=jnp.uint8)


def test_out_dtype_guard(rng):
    in_hw, out_hw = (40, 144), (80, 288)
    img = rng.uniform(0, 1, (3, *in_hw)).astype(np.float32)
    con, rcon = _con(in_hw, out_hw), RcasConstants(0.25)
    with pytest.raises(ValueError):
        fused.upscale_fused(jnp.asarray(img), out_hw, con, rcon,
                            compute_dtype=jnp.bfloat16, out_dtype=jnp.float32)


def test_fused_u16_out_codes(rng):
    in_hw, out_hw = (40, 144), (80, 288)
    img = rng.uniform(0, 1, (3, *in_hw)).astype(np.float32)
    con, rcon = _con(in_hw, out_hw), RcasConstants(0.25)
    want = im.to_uint10(np.asarray(
        fused.upscale_fused(jnp.asarray(img), out_hw, con, rcon)))
    got = np.asarray(fused.upscale_fused(
        jnp.asarray(img), out_hw, con, rcon, out_dtype=jnp.uint16))
    assert got.dtype == np.uint16
    np.testing.assert_array_equal(got, want)


def test_fused_u16_dithered_10bit_codes(rng):
    in_hw, out_hw = (40, 144), (80, 288)
    img = rng.uniform(0, 1, (3, *in_hw)).astype(np.float32)
    con, rcon = _con(in_hw, out_hw), RcasConstants(0.25)
    base = fused.upscale_fused(jnp.asarray(img), out_hw, con, rcon)
    want = im.to_uint10(np.asarray(xtr.tepd_quantize(
        base, xtr.tepd_dither(out_hw, 4), bits=10)))
    got = np.asarray(fused.upscale_fused(
        jnp.asarray(img), out_hw, con, rcon, out_dtype=jnp.uint16,
        epilogue=Epilogue(dither_bits=10), frame=4))
    d = np.abs(got.astype(int) - want.astype(int))
    assert (d > 0).sum() <= 4 and d.max() <= 1  # knife-edge flips


def test_gather_u16_roundtrip(rng):
    in_hw, out_hw = (48, 160), (72, 240)
    img = rng.uniform(0, 1, (3, *in_hw)).astype(np.float32)
    con, rcon = _con(in_hw, out_hw), RcasConstants(0.25)
    want = im.to_uint10(np.asarray(easu_gather.easu_gather(
        jnp.asarray(img), out_hw, con, rcon, apply_rcas=True)))
    got = np.asarray(easu_gather.easu_gather(
        jnp.asarray(img), out_hw, con, rcon, apply_rcas=True,
        out_dtype=jnp.uint16))
    assert got.dtype == np.uint16
    np.testing.assert_array_equal(got, want)


def test_pipeline_u16_display_codes(rng):
    in_hw, out_hw = (40, 144), (80, 288)
    img8 = (rng.uniform(0, 1, (3, *in_hw)) * 255).astype(np.uint8)
    pipe = fsr_tpu.UpscalePipeline(out_hw, dither_bits=10,
                                   out_dtype=jnp.uint16)
    out = np.asarray(pipe(jnp.asarray(img8), frame=2))
    assert out.dtype == np.uint16 and out.shape == (3, *out_hw)
    x = fsr_tpu.upscale(jnp.asarray(im.from_uint8(img8)), out_size=out_hw)
    x = xtr.tepd_quantize(x, xtr.tepd_dither(out_hw, 2), bits=10)
    np.testing.assert_array_equal(out, im.to_uint10(np.asarray(x)))


def test_fused_u8_batched_with_epilogue(rng):
    """Batch grid + epilogue + u8 codes together (grain/dither blocks are
    shared across the batch; per-frame results must match single calls)."""
    in_hw, out_hw = (40, 144), (80, 288)
    imgs8 = (rng.uniform(0, 1, (2, 3, *in_hw)) * 255).astype(np.uint8)
    con, rcon = _con(in_hw, out_hw), RcasConstants(0.25)
    grain = rng.uniform(-0.5, 0.5, (3, *out_hw)).astype(np.float32)
    gp = fused.planarize_grain(grain, out_hw, con)
    epi = Epilogue(grain_amount=0.2, dither_bits=8)
    got = np.asarray(fused.upscale_fused(
        jnp.asarray(imgs8), out_hw, con, rcon, out_dtype=jnp.uint8,
        epilogue=epi, frame=3, grain_planar=gp))
    for i in range(2):
        want = np.asarray(fused.upscale_fused(
            jnp.asarray(imgs8[i]), out_hw, con, rcon, out_dtype=jnp.uint8,
            epilogue=epi, frame=3, grain_planar=gp))
        np.testing.assert_array_equal(got[i], want)


def test_rcas_u8_roundtrip(rng):
    """Standalone RCAS byte-in/byte-out (kernel, interpret) matches
    decode -> float RCAS -> encode."""
    from fsr_tpu.kernels import rcas_pallas
    rcas_pallas.INTERPRET = True
    try:
        img8 = (rng.uniform(0, 1, (3, 64, 256)) * 255).astype(np.uint8)
        rcon = RcasConstants(0.25)
        got = np.asarray(rcas_pallas.rcas_fused(jnp.asarray(img8), rcon))
        want = im.to_uint8(np.asarray(rcas_pallas.rcas_fused(
            jnp.asarray(im.from_uint8(img8)), rcon)))
        assert got.dtype == np.uint8
        np.testing.assert_array_equal(got, want)
        # api.sharpen XLA fallback for short images matches the contract
        small = (rng.uniform(0, 1, (3, 16, 64)) * 255).astype(np.uint8)
        out = np.asarray(fsr_tpu.sharpen(jnp.asarray(small), impl="xla"))
        from fsr_tpu.ops import rcas as rcas_ops
        want2 = im.to_uint8(np.asarray(rcas_ops.rcas(
            jnp.asarray(im.from_uint8(small)), rcon)))
        np.testing.assert_array_equal(out, want2)
    finally:
        rcas_pallas.INTERPRET = False
