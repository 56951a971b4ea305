"""XLA ops layer vs the frozen NumPy oracle (the 1/255 fidelity contract)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fsr_tpu.core.constants import EasuConstants, RcasConstants
from fsr_tpu.ops import easu as easu_ops
from fsr_tpu.ops import rcas as rcas_ops
from fsr_tpu.ops import extras
from fsr_tpu.reference import scalar as ref

BUDGET = 1.0 / 255.0


def _con(in_hw, out_hw):
    return EasuConstants.create((in_hw[1], in_hw[0]), None, (out_hw[1], out_hw[0]))


def _img(rng, h, w, c=3):
    return rng.uniform(0.0, 1.0, (c, h, w)).astype(np.float32)


SIZES = [
    ((54, 96), (108, 192)),   # 2.0x (performance)
    ((72, 128), (108, 192)),  # 1.5x (quality)
    ((64, 114), (108, 192)),  # ~1.7x (balanced, ragged ratio)
    ((84, 148), (108, 192)),  # ~1.3x (ultra quality, ragged ratio)
    ((108, 192), (108, 192)), # 1.0x
    ((50, 50), (100, 100)),
]


@pytest.mark.parametrize("in_hw,out_hw", SIZES)
def test_easu_f32_bit_parity(rng, in_hw, out_hw):
    img = _img(rng, *in_hw)
    con = _con(in_hw, out_hw)
    want = ref.easu_ref(img, out_hw, con)
    got = np.asarray(easu_ops.easu(jnp.asarray(img), out_hw, con))
    # Same float32 ops in the same order: XLA may fuse/FMA-contract, allow
    # a few ulps but far inside the fidelity budget.
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=0)


def test_easu_f16_mixed_statistics(rng):
    """fp16 storage quantizes the luma that feeds the (chaotic) direction
    estimate, so worst-case noise images see isolated large deviations even
    for a perfect implementation; the contract is statistical.  White noise
    is the adversarial case — natural content is far inside these bounds."""
    in_hw, out_hw = (54, 96), (108, 192)
    img = _img(rng, *in_hw)
    con = _con(in_hw, out_hw)
    want32 = ref.easu_ref(img, out_hw, con)
    got = np.asarray(easu_ops.easu(jnp.asarray(img), out_hw, con, compute_dtype=jnp.float16)).astype(np.float32)
    d = np.abs(got - want32)
    assert np.median(d) <= BUDGET / 8
    assert np.percentile(d, 99) <= 5 * BUDGET
    assert (d > BUDGET).mean() <= 0.04
    # Dering clamp still bounds everything by the local neighborhood.
    assert d.max() <= 0.25


def test_easu_f16_mixed_beats_strict(rng):
    """The mixed mode (fp32 direction pipeline) must not be less faithful to
    the fp32 oracle than strict FsrEasuH emulation on typical content."""
    in_hw, out_hw = (54, 96), (108, 192)
    img = _img(rng, *in_hw)
    con = _con(in_hw, out_hw)
    want32 = ref.easu_ref(img, out_hw, con)
    mixed = np.asarray(easu_ops.easu(jnp.asarray(img), out_hw, con, compute_dtype=jnp.float16)).astype(np.float32)
    strict = np.asarray(
        easu_ops.easu(jnp.asarray(img), out_hw, con, compute_dtype=jnp.float16, precision="strict")
    ).astype(np.float32)
    assert np.median(np.abs(mixed - want32)) <= np.median(np.abs(strict - want32))


def test_easu_f16_strict_matches_h_oracle(rng):
    in_hw, out_hw = (54, 96), (108, 192)
    img = _img(rng, *in_hw)
    con = _con(in_hw, out_hw)
    want16 = ref.easu_ref_f16(img, out_hw, con).astype(np.float32)
    got = np.asarray(
        easu_ops.easu(jnp.asarray(img), out_hw, con, compute_dtype=jnp.float16, precision="strict")
    ).astype(np.float32)
    d = np.abs(got - want16)
    # Same algorithm, same order: agreement to ~1 fp16 ulp except at
    # direction-flip pixels (fp16 arithmetic is chaotic there).
    assert np.median(d) <= 0.001
    assert np.percentile(d, 99.9) <= 0.005
    assert (d > BUDGET).mean() <= 0.002


def test_easu_bf16_statistics(rng):
    in_hw, out_hw = (54, 96), (108, 192)
    img = _img(rng, *in_hw)
    con = _con(in_hw, out_hw)
    want32 = ref.easu_ref(img, out_hw, con)
    got = np.asarray(
        easu_ops.easu(jnp.asarray(img), out_hw, con, compute_dtype=jnp.bfloat16).astype(jnp.float32)
    )
    d = np.abs(got - want32)
    assert np.median(d) <= BUDGET
    assert np.percentile(d, 99) <= 5 * BUDGET
    assert d.max() <= 0.25


def test_easu_batched(rng):
    in_hw, out_hw = (32, 48), (64, 96)
    imgs = rng.uniform(0, 1, (2, 3, *in_hw)).astype(np.float32)
    con = _con(in_hw, out_hw)
    got = np.asarray(easu_ops.easu(jnp.asarray(imgs), out_hw, con))
    assert got.shape == (2, 3, *out_hw)
    for i in range(2):
        want = ref.easu_ref(imgs[i], out_hw, con)
        np.testing.assert_allclose(got[i], want, atol=2e-5, rtol=0)


@pytest.mark.parametrize("denoise", [False, True])
def test_rcas_f32_parity(rng, denoise):
    img = _img(rng, 40, 64)
    rc = RcasConstants(0.25)
    want = ref.rcas_ref(img, rc, denoise=denoise)
    got = np.asarray(rcas_ops.rcas(jnp.asarray(img), rc, denoise=denoise))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=0)


def test_rcas_isolated_pixel_matches_oracle(rng):
    img = np.zeros((3, 9, 9), np.float32)
    img[:, 4, 4] = 0.5
    rc = RcasConstants(0.0)
    want = ref.rcas_ref(img, rc)
    got = np.asarray(rcas_ops.rcas(jnp.asarray(img), rc))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=0)


def test_rcas_alpha_passthrough(rng):
    img = rng.uniform(0, 1, (4, 16, 16)).astype(np.float32)
    rc = RcasConstants(0.25)
    got = np.asarray(rcas_ops.rcas(jnp.asarray(img), rc))
    np.testing.assert_array_equal(got[3], img[3])


def test_rcas_f16(rng):
    img = _img(rng, 24, 24)
    rc = RcasConstants(0.25)
    want = ref.rcas_ref(img, rc, dtype=np.float16).astype(np.float32)
    got = np.asarray(
        rcas_ops.rcas(jnp.asarray(img), rc, compute_dtype=jnp.float16)
    ).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=0)


def test_extras_match_oracle(rng):
    hdr = rng.uniform(0, 100.0, (3, 16, 16)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(extras.srtm(jnp.asarray(hdr))), ref.srtm_ref(hdr), atol=1e-6)
    sdr = ref.srtm_ref(hdr)
    np.testing.assert_allclose(
        np.asarray(extras.srtm_inv(jnp.asarray(sdr))), ref.srtm_inv_ref(sdr), rtol=1e-6
    )
    c = rng.uniform(0, 1, (3, 16, 16)).astype(np.float32)
    g = rng.uniform(-0.5, 0.5, (3, 16, 16)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(extras.lfga(jnp.asarray(c), jnp.asarray(g), 0.7)),
        ref.lfga_ref(c, g, 0.7),
        atol=1e-7,
    )
    dit_got = np.asarray(extras.tepd_dither((16, 16), 3))
    np.testing.assert_allclose(dit_got, ref.tepd_dither_ref(16, 16, 3), atol=1e-6)
    for bits in (8, 10):
        q_got = np.asarray(extras.tepd_quantize(jnp.asarray(c), jnp.asarray(dit_got), bits=bits))
        np.testing.assert_allclose(q_got, ref.tepd_quantize_ref(c, dit_got, bits), atol=1e-6)


def test_bilinear_matches_oracle(rng):
    in_hw, out_hw = (30, 44), (63, 88)
    img = _img(rng, *in_hw)
    con = _con(in_hw, out_hw)
    got = np.asarray(easu_ops.bilinear(jnp.asarray(img), out_hw, con))
    np.testing.assert_allclose(got, ref.bilinear_ref(img, out_hw, con), atol=1e-5)
