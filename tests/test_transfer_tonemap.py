"""Color transfer functions and tonemappers."""

import numpy as np
import jax.numpy as jnp
import pytest

from fsr_tpu.core import tonemap, transfer


@pytest.fixture
def lin(rng):
    return jnp.asarray(rng.uniform(0, 1, (4096,)).astype(np.float32))


def _srgb_ref(x):
    return np.where(x <= 0.0031308, x * 12.92, 1.055 * x ** (1 / 2.4) - 0.055)


def test_srgb_roundtrip_and_spec(lin):
    enc = np.asarray(transfer.to_srgb(lin))
    x = np.asarray(lin)
    np.testing.assert_allclose(enc, _srgb_ref(x), atol=2e-6)
    back = np.asarray(transfer.from_srgb(jnp.asarray(enc)))
    np.testing.assert_allclose(back, x, atol=3e-6)


def test_709_roundtrip(lin):
    enc = transfer.to_709(lin)
    back = np.asarray(transfer.from_709(enc))
    np.testing.assert_allclose(back, np.asarray(lin), atol=1e-5)


def test_pq_roundtrip():
    x = jnp.asarray(np.geomspace(1e-4, 1.0, 512, dtype=np.float32))
    enc = transfer.to_pq(x)
    back = np.asarray(transfer.from_pq(enc))
    np.testing.assert_allclose(back, np.asarray(x), rtol=2e-3)


def test_two_three_gamma(lin):
    np.testing.assert_allclose(
        np.asarray(transfer.from_two(transfer.to_two(lin))), np.asarray(lin), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(transfer.from_three(transfer.to_three(lin))), np.asarray(lin), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(transfer.from_gamma(transfer.to_gamma(lin, 1 / 2.2), 2.2)),
        np.asarray(lin), atol=1e-5,
    )


def test_pq_approximations():
    # The bit tricks approximate 4th/8th roots (PQ ~ x^(1/8)); compare each
    # against the true root: lo ~ few %, med (one Newton step) ~ sub-%.
    x = np.linspace(0.01, 1.0, 256, dtype=np.float32)
    xj = jnp.asarray(x)
    lo4 = np.asarray(transfer.prx_lo_gamma2_to_pq(xj))
    np.testing.assert_allclose(lo4, x ** 0.25, rtol=0.045)
    med4 = np.asarray(transfer.prx_med_gamma2_to_pq(xj))
    np.testing.assert_allclose(med4, x ** 0.25, rtol=3e-3)
    lo8 = np.asarray(transfer.prx_lo_linear_to_pq(xj))
    np.testing.assert_allclose(lo8, x ** 0.125, rtol=0.05)
    med8 = np.asarray(transfer.prx_med_linear_to_pq(xj))
    np.testing.assert_allclose(med8, x ** 0.125, rtol=8e-3)
    # exact-power inverses round-trip the med forms tightly
    np.testing.assert_allclose(
        np.asarray(transfer.prx_pq_to_gamma2(jnp.asarray(med4))), x, rtol=1.5e-2)


@pytest.mark.parametrize("name", ["amd", "dx11dsk", "reinhard", "uncharted2", "aces", "none"])
def test_tonemappers_basic(rng, name):
    hdr = jnp.asarray(rng.uniform(0, 8.0, (3, 16, 16)).astype(np.float32))
    out = np.asarray(tonemap.tonemap(hdr, exposure=1.0, tonemapper=name))
    assert out.shape == (3, 16, 16)
    assert np.isfinite(out).all()
    if name != "none":
        assert out.min() >= -1e-6 and out.max() <= 1.0 + 1e-6
        # Monotone-ish: brighter input should not produce darker output (check
        # on a gray ramp).
        ramp = jnp.asarray(
            np.linspace(0.01, 8.0, 64, dtype=np.float32)[None, None, :].repeat(3, 0)
        )
        r = np.asarray(tonemap.tonemap(ramp, tonemapper=name))[0, 0]
        assert (np.diff(r) >= -1e-4).all()


def test_tonemap_pass_hdr10(rng):
    hdr = jnp.asarray(rng.uniform(0, 4.0, (3, 16, 16)).astype(np.float32))
    out = np.asarray(tonemap.tonemap_pass(hdr, tonemapper="aces", hdr10_dither_frame=2))
    # Quantized to the 10-bit gamma-2.0 lattice.
    lat = np.round(out * 1023.0) / 1023.0
    np.testing.assert_allclose(out, lat, atol=1e-6)


def test_unknown_tonemapper():
    with pytest.raises(ValueError):
        tonemap.tonemap(jnp.zeros((3, 4, 4)), tonemapper="bogus")
