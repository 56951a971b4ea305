"""Top-level API behavior (CPU; kernel dispatch gating, layouts, DRS)."""

import numpy as np
import jax.numpy as jnp
import pytest

import fsr_tpu
from fsr_tpu import api
from fsr_tpu.core.constants import EasuConstants, RcasConstants
from fsr_tpu.ops import easu as easu_ops, rcas as rcas_ops
from fsr_tpu.reference import scalar as ref


def _img(rng, h, w, c=3):
    return rng.uniform(0.0, 1.0, (c, h, w)).astype(np.float32)


def test_out_size_scale_preset_equivalence(rng):
    img = jnp.asarray(_img(rng, 32, 48))
    a = fsr_tpu.upscale(img, out_size=(64, 96))
    b = fsr_tpu.upscale(img, scale=2.0)
    c = fsr_tpu.upscale(img, preset="performance")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_upscale_matches_oracle_end_to_end(rng):
    img = _img(rng, 40, 64)
    out = np.asarray(fsr_tpu.upscale(jnp.asarray(img), scale=2.0, sharpness=0.5))
    con = EasuConstants.create((64, 40), None, (128, 80))
    want = ref.rcas_ref(ref.easu_ref(img, (80, 128), con), RcasConstants(0.5))
    np.testing.assert_allclose(out, want, atol=2e-5)


def test_hwc_layout_roundtrip(rng):
    img = _img(rng, 24, 36)
    chw = np.asarray(fsr_tpu.upscale(jnp.asarray(img), scale=2.0))
    hwc = np.asarray(
        fsr_tpu.upscale(jnp.asarray(np.moveaxis(img, 0, -1)), scale=2.0, layout="HWC")
    )
    np.testing.assert_array_equal(chw, np.moveaxis(hwc, -1, 0))


def test_no_rcas_equals_easu(rng):
    img = _img(rng, 24, 36)
    out = np.asarray(fsr_tpu.upscale(jnp.asarray(img), scale=2.0, apply_rcas=False))
    con = EasuConstants.create((36, 24), None, (72, 48))
    want = np.asarray(easu_ops.easu(jnp.asarray(img), (48, 72), con))
    np.testing.assert_array_equal(out, want)


def test_drs_viewport_offset(rng):
    # Render 24x36 into a 32x48 container at offset (4, 6); upscale 2x.
    container = _img(rng, 32, 48)
    out = np.asarray(
        fsr_tpu.upscale(
            jnp.asarray(container),
            out_size=(48, 72),
            input_viewport=(24, 36),
            input_offset=(4, 6),
        )
    )
    con = EasuConstants.create((36, 24), (48, 32), (72, 48), (6, 4))
    want = np.asarray(
        rcas_ops.rcas(
            easu_ops.easu(jnp.asarray(container), (48, 72), con), RcasConstants(0.25)
        )
    )
    np.testing.assert_array_equal(out, want)


def test_pallas_impl_raises_off_tpu(rng):
    img = jnp.asarray(_img(rng, 32, 48))
    import jax

    if jax.devices()[0].platform == "cpu":
        with pytest.raises(ValueError, match="pallas"):
            fsr_tpu.upscale(img, scale=2.0, impl="pallas")


def test_alpha_passthrough_xla(rng):
    img = _img(rng, 24, 36, c=4)
    out = np.asarray(fsr_tpu.upscale(jnp.asarray(img), scale=2.0, impl="xla"))
    assert out.shape == (4, 48, 72)
    # RGB matches the 3-channel result; alpha is bilinear (same as the
    # kernel path, so impl="auto" is backend-independent) and not sharpened.
    want_rgb = np.asarray(fsr_tpu.upscale(jnp.asarray(img[:3]), scale=2.0, impl="xla"))
    np.testing.assert_allclose(out[:3], want_rgb, atol=1e-6)
    from fsr_tpu.core.constants import EasuConstants
    from fsr_tpu.ops import easu as easu_ops

    con = EasuConstants.create((36, 24), None, (72, 48))
    want_a = np.asarray(easu_ops.bilinear(jnp.asarray(img[3:4]), (48, 72), con))
    np.testing.assert_allclose(out[3:4], want_a, atol=1e-6)


def test_bad_args(rng):
    img = jnp.asarray(_img(rng, 16, 16))
    with pytest.raises(ValueError):
        fsr_tpu.upscale(img)
    with pytest.raises(ValueError):
        fsr_tpu.upscale(img, preset="nope")
    with pytest.raises(ValueError):
        fsr_tpu.upscale(img, scale=2.0, layout="XYZ")


def test_preset_table_values():
    from fsr_tpu.core.presets import PRESETS, recommended_mip_bias, render_resolution

    assert PRESETS["performance"].scale == 2.0
    assert PRESETS["ultra_quality"].mip_bias == -0.38
    assert render_resolution((2160, 3840), 1.5) == (1440, 2560)
    assert render_resolution((2160, 3840), 1.3) == (1661, 2953)  # trunc, like the sample
    assert abs(recommended_mip_bias(2.0) + 1.0) < 1e-9


def test_sharpen_standalone(rng):
    img = _img(rng, 24, 36)
    out = np.asarray(fsr_tpu.sharpen(jnp.asarray(img), sharpness=0.5))
    want = np.asarray(rcas_ops.rcas(jnp.asarray(img), RcasConstants(0.5)))
    np.testing.assert_array_equal(out, want)
    hwc = np.asarray(
        fsr_tpu.sharpen(jnp.asarray(np.moveaxis(img, 0, -1)), sharpness=0.5, layout="HWC")
    )
    np.testing.assert_array_equal(np.moveaxis(hwc, -1, 0), out)


def test_sharpen_rgba_alpha_passthrough(rng):
    """RCAS at identical size copies alpha verbatim (the
    FSR_RCAS_PASSTHROUGH_ALPHA rule, ffx_fsr1.h:688-705): RGB matches the
    3-channel sharpen, alpha is untouched — on every backend."""
    img = _img(rng, 24, 36)
    alpha = rng.uniform(0, 1, (1, 24, 36)).astype(np.float32)
    rgba = jnp.asarray(np.concatenate([img, alpha], axis=0))
    out = np.asarray(fsr_tpu.sharpen(rgba, sharpness=0.5))
    assert out.shape == (4, 24, 36)
    np.testing.assert_array_equal(
        out[:3], np.asarray(fsr_tpu.sharpen(jnp.asarray(img), sharpness=0.5))
    )
    np.testing.assert_array_equal(out[3:], alpha)
