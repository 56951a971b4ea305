"""Differentiability of the XLA upscale path.

The bit-trick approximations (core/approx.py) carry custom JVPs — the
derivative of the ideal function each trick approximates — so `jax.grad`
/ `jax.jvp` flow through `ops.easu`/`ops.rcas`/`api.upscale` (impl="xla")
and FSR can sit inside learned training pipelines (e.g. as a perceptual
downstream of a super-res model).  Forward values stay bit-identical (the
primal is the exact trick; verified by the parity suites)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fsr_tpu.core import approx
from fsr_tpu.core.constants import EasuConstants, RcasConstants
from fsr_tpu.ops import easu as easu_ops
from fsr_tpu.ops import rcas as rcas_ops


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def test_approx_jvps_are_ideal_derivatives():
    """Tangents are d/da of the ideal functions, evaluated exactly."""
    a = jnp.float32(2.0)
    for fn, want in (
        (approx.prx_lo_rcp, -1.0 / 4.0),       # d(1/a)       = -1/a^2
        (approx.prx_med_rcp, -1.0 / 4.0),
        (approx.prx_lo_rsq, -0.5 * 2.0 ** -1.5),  # d(a^-1/2)
        (approx.prx_lo_sqrt, 0.5 * 2.0 ** -0.5),  # d(a^1/2)
    ):
        _, tangent = jax.jvp(fn, (a,), (jnp.float32(1.0),))
        np.testing.assert_allclose(float(tangent), want, rtol=1e-6)


def test_grad_flows_through_easu_rcas(rng):
    img = jnp.asarray(rng.uniform(0.1, 0.9, (3, 24, 32)).astype(np.float32))
    con = EasuConstants.create((32, 24), None, (64, 48))
    rcon = RcasConstants(0.25)

    def loss(x):
        up = easu_ops.easu(x, (48, 64), con)
        return jnp.sum(rcas_ops.rcas(up, rcon) ** 2)

    g = jax.grad(loss)(img)
    assert g.shape == img.shape
    gn = np.asarray(g)
    assert np.isfinite(gn).all()
    assert np.abs(gn).max() > 0.0


def test_shift_equivariance_directional_derivative(rng):
    """EASU+RCAS are shift-equivariant (tap weights depend only on
    differences), so the directional derivative along the all-ones
    direction is ~1 per output element.  The JVP mixes ideal derivatives
    with approximate primal values, hence the loose-ish tolerance."""
    img = jnp.asarray(rng.uniform(0.2, 0.8, (3, 24, 32)).astype(np.float32))
    con = EasuConstants.create((32, 24), None, (64, 48))
    rcon = RcasConstants(0.25)

    def f(x):
        return jnp.sum(rcas_ops.rcas(easu_ops.easu(x, (48, 64), con), rcon))

    _, dd = jax.jvp(f, (img,), (jnp.ones_like(img),))
    # The low-precision tricks are up to ~4% off (APrxLoRcp), and the JVP
    # mixes their approximate primal values into exact-derivative products,
    # so the equivariance identity holds to a few percent, not exactly.
    np.testing.assert_allclose(float(dd), 3 * 48 * 64, rtol=5e-2)


def test_grad_through_api_upscale(rng):
    import fsr_tpu

    img = jnp.asarray(rng.uniform(0.1, 0.9, (3, 20, 26)).astype(np.float32))

    def loss(x):
        return jnp.sum(fsr_tpu.upscale(x, scale=1.5, impl="xla"))

    g = jax.jit(jax.grad(loss))(img)
    assert g.shape == img.shape and np.isfinite(np.asarray(g)).all()


@pytest.fixture
def kernel_interpret(monkeypatch):
    """Force the Pallas kernel path off-hardware (interpret mode)."""
    from fsr_tpu.kernels import dispatch, easu_gather, fused, pad

    monkeypatch.setattr(dispatch, "_on_tpu", lambda: True)
    fused.INTERPRET = True
    easu_gather.INTERPRET = True
    pad.INTERPRET = True
    yield
    fused.INTERPRET = False
    easu_gather.INTERPRET = False
    pad.INTERPRET = False


def test_grad_through_fused_kernel_path(rng, kernel_interpret):
    """upscale on the kernel path: forward = the fused Pallas kernel,
    backward = the XLA twin's VJP (fsr_tpu.autodiff).  The gradient must
    equal the impl="xla" gradient exactly (it IS that VJP), and the
    forward must equal the kernel forward."""
    import fsr_tpu

    img = jnp.asarray(rng.uniform(0.1, 0.9, (3, 64, 160)).astype(np.float32))

    # Linear loss: the incoming cotangent is ones on both paths, so the
    # kernel-path gradient IS the XLA VJP — bit-equal.
    def loss(x, impl):
        return jnp.sum(fsr_tpu.upscale(x, scale=2.0, impl=impl))

    v_k, g_k = jax.value_and_grad(lambda x: loss(x, "pallas"))(img)
    v_x, g_x = jax.value_and_grad(lambda x: loss(x, "xla"))(img)
    np.testing.assert_array_equal(np.asarray(g_k), np.asarray(g_x))
    # Forward is the kernel's (≈ XLA within the fidelity budget, not equal).
    np.testing.assert_allclose(float(v_k), float(v_x), rtol=1e-4)
    assert np.abs(np.asarray(g_k)).max() > 0.0

    # Non-linear loss: the cotangent arriving at the custom_vjp boundary is
    # 2*out, which differs between forwards by the fidelity budget — the
    # gradients agree to that tolerance, not bitwise.
    gq_k = jax.grad(lambda x: jnp.sum(
        fsr_tpu.upscale(x, scale=2.0, impl="pallas") ** 2))(img)
    gq_x = jax.grad(lambda x: jnp.sum(
        fsr_tpu.upscale(x, scale=2.0, impl="xla") ** 2))(img)
    np.testing.assert_allclose(np.asarray(gq_k), np.asarray(gq_x),
                               rtol=5e-3, atol=5e-4)


def test_grad_through_gather_kernel_path(rng, kernel_interpret):
    """Non-integer ratio (gather kernel family) is differentiable too."""
    import fsr_tpu

    img = jnp.asarray(rng.uniform(0.1, 0.9, (3, 64, 160)).astype(np.float32))

    def loss(x, impl):
        return jnp.sum(fsr_tpu.upscale(x, scale=1.5, impl=impl))

    g_k = jax.grad(lambda x: loss(x, "pallas"))(img)
    g_x = jax.grad(lambda x: loss(x, "xla"))(img)
    np.testing.assert_array_equal(np.asarray(g_k), np.asarray(g_x))


def test_grad_kernel_path_under_jit_with_traced_frame(rng, kernel_interpret):
    """Traced auxiliaries (frame index) ride as custom_vjp operands; the
    whole thing jits and differentiates.  Grain exercises the planar-grain
    aux plumbing and the LFGA term of the backward."""
    import fsr_tpu
    from fsr_tpu.kernels.epilogue import Epilogue

    img = jnp.asarray(rng.uniform(0.1, 0.9, (3, 64, 160)).astype(np.float32))
    grain = jnp.asarray(
        rng.uniform(-0.5, 0.5, (3, 128, 320)).astype(np.float32))
    epi = Epilogue(transform="none", grain_amount=0.35)

    @jax.jit
    def loss(x, frame):
        out = fsr_tpu.upscale(x, scale=2.0, impl="pallas", epilogue=epi,
                              frame=frame, grain=grain)
        return jnp.sum(out)

    g = jax.grad(loss)(img, jnp.int32(3))
    assert g.shape == img.shape and np.isfinite(np.asarray(g)).all()
    # The twin includes LFGA: gradient differs from the grainless one.
    g0 = jax.grad(lambda x: jnp.sum(
        fsr_tpu.upscale(x, scale=2.0, impl="pallas")))(img)
    assert np.abs(np.asarray(g) - np.asarray(g0)).max() > 0.0


def test_grad_through_sharpen_kernel_path(rng, monkeypatch, kernel_interpret):
    import fsr_tpu
    from fsr_tpu.kernels import rcas_pallas

    rcas_pallas.INTERPRET = True
    real_devices = jax.devices

    class _Dev:
        platform = "tpu"

    monkeypatch.setattr(jax, "devices", lambda *a: [_Dev()])
    try:
        img = jnp.asarray(
            rng.uniform(0.1, 0.9, (3, 64, 160)).astype(np.float32))
        g_k = jax.grad(lambda x: jnp.sum(
            fsr_tpu.sharpen(x, impl="pallas")))(img)
    finally:
        rcas_pallas.INTERPRET = False
        monkeypatch.setattr(jax, "devices", real_devices)
    g_x = jax.grad(lambda x: jnp.sum(
        fsr_tpu.sharpen(x, impl="xla")))(img)
    np.testing.assert_array_equal(np.asarray(g_k), np.asarray(g_x))


def test_bilinear_grad_matches_finite_difference(rng):
    """The bilinear fallback is piecewise-linear: its gradient must match
    finite differences tightly away from weight kinks."""
    img = rng.uniform(0.1, 0.9, (3, 12, 16)).astype(np.float32)
    con = EasuConstants.create((16, 12), None, (32, 24))

    def loss(x):
        return jnp.sum(easu_ops.bilinear(x, (24, 32), con) ** 2)

    g = np.asarray(jax.grad(loss)(jnp.asarray(img)))
    eps = 1e-3
    for (c, i, j) in [(0, 5, 7), (1, 0, 0), (2, 11, 15)]:
        up, dn = img.copy(), img.copy()
        up[c, i, j] += eps
        dn[c, i, j] -= eps
        fd = (float(loss(jnp.asarray(up))) - float(loss(jnp.asarray(dn)))) / (2 * eps)
        np.testing.assert_allclose(g[c, i, j], fd, rtol=2e-2, atol=1e-3)
