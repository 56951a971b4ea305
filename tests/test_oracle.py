"""Sanity and property tests of the frozen NumPy oracle itself."""

import numpy as np
import pytest

from fsr_tpu.core.constants import EasuConstants, RcasConstants
from fsr_tpu.reference import scalar as ref


def _con(in_hw, out_hw):
    return EasuConstants.create(
        (in_hw[1], in_hw[0]), None, (out_hw[1], out_hw[0])
    )


def _img(rng, h, w, c=3):
    return rng.uniform(0.0, 1.0, (c, h, w)).astype(np.float32)


@pytest.mark.parametrize("scale", [1.0, 1.3, 1.5, 1.7, 2.0])
def test_easu_constant_image_is_preserved(scale):
    h, w = 48, 64
    oh, ow = round(h * scale), round(w * scale)
    img = np.full((3, h, w), 0.375, np.float32)
    out = ref.easu_ref(img, (oh, ow), _con((h, w), (oh, ow)))
    assert out.shape == (3, oh, ow)
    np.testing.assert_allclose(out, 0.375, atol=1e-6)


def test_easu_output_within_neighborhood_bounds(rng):
    # Dering clamp: every output pixel within [min, max] of the full input.
    img = _img(rng, 40, 56)
    out = ref.easu_ref(img, (80, 112), _con((40, 56), (80, 112)))
    assert out.min() >= img.min() - 1e-6
    assert out.max() <= img.max() + 1e-6
    assert np.isfinite(out).all()


def test_easu_at_integer_positions_near_source(rng):
    # 2x upscale: output pixel (2i+1, 2j+1) samples at frac 0.25 from src (i, j);
    # a smooth ramp should reproduce values close to the source.
    h, w = 32, 32
    ramp = np.linspace(0, 1, w, dtype=np.float32)[None, :] * np.ones((h, 1), np.float32)
    img = np.stack([ramp, ramp, ramp])
    out = ref.easu_ref(img, (2 * h, 2 * w), _con((h, w), (2 * h, 2 * w)))
    # Interior: the ramp is linear, EASU should reconstruct it to ~1e-2.
    x_out = (np.arange(2 * w, dtype=np.float32) * 0.5 - 0.25).clip(0, w - 1)
    want = np.interp(x_out, np.arange(w), ramp[0])
    np.testing.assert_allclose(out[0, 32, 4:-4], want[4:-4], atol=2e-2)


def test_easu_f16_close_to_f32(rng):
    img = _img(rng, 36, 48)
    con = _con((36, 48), (72, 96))
    out32 = ref.easu_ref(img, (72, 96), con)
    out16 = ref.easu_ref_f16(img, (72, 96), con).astype(np.float32)
    assert np.isfinite(out16).all()
    # The fp16 path is itself lossy vs fp32 (fp16 luma quantization feeds a
    # chaotic direction estimate); statistical contract on noise input.
    d = np.abs(out32 - out16)
    assert np.median(d) <= 1.0 / 255.0
    assert d.max() <= 0.25  # dering clamp bounds the damage


def test_rcas_flat_is_identity():
    img = np.full((3, 16, 16), 0.5, np.float32)
    out = ref.rcas_ref(img, RcasConstants(0.0))
    np.testing.assert_allclose(out, img, atol=2e-3)


def test_rcas_sharpens_edges():
    img = np.zeros((3, 16, 16), np.float32)
    img[:, :, 8:] = 1.0
    base = img.copy()
    out = ref.rcas_ref(img, RcasConstants(0.0))
    # Contrast across the edge must not decrease, and values stay finite.
    assert np.isfinite(out).all()
    assert (out[:, :, 7] <= base[:, :, 7] + 1e-6).all()


def test_rcas_isolated_bright_pixel_spikes_to_clip():
    # The NaN-drop max path: bright pixel over black cross resolves to ~1.
    img = np.zeros((3, 9, 9), np.float32)
    img[:, 4, 4] = 0.5
    out = ref.rcas_ref(img, RcasConstants(0.0))
    assert np.isfinite(out).all()
    assert out[0, 4, 4] > 0.9


def test_rcas_alpha_passthrough(rng):
    img = rng.uniform(0, 1, (4, 12, 12)).astype(np.float32)
    out = ref.rcas_ref(img, RcasConstants(0.25))
    np.testing.assert_array_equal(out[3], img[3].astype(np.float32))


def test_rcas_f16(rng):
    img = _img(rng, 24, 24)
    out32 = ref.rcas_ref(img, RcasConstants(0.25))
    out16 = ref.rcas_ref(img, RcasConstants(0.25), dtype=np.float16).astype(np.float32)
    assert np.max(np.abs(out32 - out16)) <= 1.0 / 255.0 + 1e-6


def test_srtm_roundtrip(rng):
    hdr = rng.uniform(0, 1000.0, (3, 8, 8)).astype(np.float32)
    sdr = ref.srtm_ref(hdr)
    assert sdr.max() <= 1.0
    back = ref.srtm_inv_ref(sdr)
    np.testing.assert_allclose(back, hdr, rtol=2e-3)


def test_srtm_preserves_ratio(rng):
    hdr = rng.uniform(0.1, 10.0, (3, 4, 4)).astype(np.float32)
    sdr = ref.srtm_ref(hdr)
    np.testing.assert_allclose(sdr[0] / sdr[1], hdr[0] / hdr[1], rtol=1e-4)


def test_lfga_energy_limits(rng):
    c = rng.uniform(0, 1, (3, 8, 8)).astype(np.float32)
    grain = rng.uniform(-0.5, 0.5, (3, 8, 8)).astype(np.float32)
    out = ref.lfga_ref(c, grain, 1.0)
    assert (out >= -1e-6).all() and (out <= 1.0 + 1e-6).all()
    # zero grain -> identity
    np.testing.assert_array_equal(ref.lfga_ref(c, np.zeros_like(grain), 1.0), c)


def test_tepd_dither_range_and_pattern():
    d = ref.tepd_dither_ref(16, 16, 0)
    assert (d >= 0).all() and (d < 1).all()
    d2 = ref.tepd_dither_ref(16, 16, 1)
    assert not np.array_equal(d, d2)  # temporally varying


@pytest.mark.parametrize("bits", [8, 10])
def test_tepd_quantize_steps_and_energy(rng, bits):
    c = rng.uniform(0, 1, (3, 32, 32)).astype(np.float32)
    steps = 255.0 if bits == 8 else 1023.0
    dit = ref.tepd_dither_ref(32, 32, 0)
    q = ref.tepd_quantize_ref(c, dit, bits)
    # Outputs are on the gamma-2.0 step lattice.
    lat = np.round(q * steps) / steps
    np.testing.assert_allclose(q, lat, atol=1e-6)
    # Energy preservation: averaged over many frames, mean linear error ~ 0.
    acc = np.zeros_like(c)
    n = 64
    for f in range(n):
        dit = ref.tepd_dither_ref(32, 32, f)
        q = ref.tepd_quantize_ref(c, dit, bits)
        acc += q * q  # back to linear (gamma 2.0)
    err = np.mean(acc / n - c)
    assert abs(err) < 2e-3


def test_bilinear_matches_numpy_interp(rng):
    img = _img(rng, 16, 24)
    con = _con((16, 24), (32, 48))
    out = ref.bilinear_ref(img, (32, 48), con)
    assert out.shape == (3, 32, 48)
    assert np.isfinite(out).all()
    assert out.min() >= img.min() - 1e-6 and out.max() <= img.max() + 1e-6
