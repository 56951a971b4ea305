"""Bit-trick approximations: JAX impls match the NumPy oracle bit-for-bit."""

import numpy as np
import jax.numpy as jnp
import pytest

from fsr_tpu.core import approx
from fsr_tpu.reference import scalar as ref


@pytest.fixture
def samples32(rng):
    # Positive range incl. tiny/huge values (approximations assume positive).
    x = np.concatenate(
        [
            rng.uniform(1e-6, 1.0, 4096),
            rng.uniform(1.0, 65504.0, 4096),
            [1.0, 0.5, 2.0, 1.0 / 3.0, 1e-4, 3.14159],
        ]
    ).astype(np.float32)
    return x


@pytest.mark.parametrize(
    "jfn,nfn",
    [
        (approx.prx_lo_rcp, ref.prx_lo_rcp_f32),
        (approx.prx_med_rcp, ref.prx_med_rcp_f32),
        (approx.prx_lo_rsq, ref.prx_lo_rsq_f32),
        (approx.prx_lo_sqrt, ref.prx_lo_sqrt_f32),
    ],
)
def test_f32_bit_exact(jfn, nfn, samples32):
    got = np.asarray(jfn(jnp.asarray(samples32)))
    want = nfn(samples32)
    np.testing.assert_array_equal(got.view(np.uint32), want.view(np.uint32))


@pytest.mark.parametrize(
    "jfn,nfn",
    [
        (approx.prx_lo_rcp, ref.prx_lo_rcp_f16),
        (approx.prx_lo_rsq, ref.prx_lo_rsq_f16),
        (approx.prx_lo_sqrt, ref.prx_lo_sqrt_f16),
    ],
)
def test_f16_bit_exact(jfn, nfn, samples32):
    # The fp16 tricks are specified for {smallest normal .. 16384}
    # (ffx_a.h half-approximation comments); above that the rcp trick forms
    # NaN bit patterns whose payloads XLA canonicalizes.
    x16 = samples32[samples32 <= 16384.0].astype(np.float16)
    got = np.asarray(jfn(jnp.asarray(x16)))
    want = nfn(x16)
    np.testing.assert_array_equal(got.view(np.uint16), want.view(np.uint16))


def test_f16_med_rcp_close(samples32):
    # med_rcp includes an fp16 FMA chain; allow 1 ulp from the oracle.
    x16 = samples32.astype(np.float16)
    got = np.asarray(approx.prx_med_rcp(jnp.asarray(x16))).astype(np.float32)
    want = ref.prx_med_rcp_f16(x16).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-3)


def test_accuracy_vs_true():
    x = np.linspace(0.01, 100.0, 10000, dtype=np.float32)
    rel = lambda a, b: np.max(np.abs(a - b) / np.abs(b))
    assert rel(ref.prx_lo_rcp_f32(x), 1.0 / x) < 0.062
    assert rel(ref.prx_med_rcp_f32(x), 1.0 / x) < 0.004
    assert rel(ref.prx_lo_rsq_f32(x), 1.0 / np.sqrt(x)) < 0.047
    assert rel(ref.prx_lo_sqrt_f32(x), np.sqrt(x)) < 0.042


def test_parabolic_sin_cos():
    # {-1..1} represents {0..2pi}; output {-1/4..1/4} represents {-1..1}.
    x = np.linspace(-1.0, 1.0, 257, dtype=np.float32)
    got = np.asarray(approx.p_sin(jnp.asarray(x))) * 4.0
    want = np.sin((x + 1.0) * np.pi)  # input -1 -> angle 0? map: x in {-1..1} ~ {0..2pi}
    # The parabola approximates sin with the convention sin(pi*x) = -4*APSin(x)
    want2 = -np.sin(np.pi * x)
    assert np.max(np.abs(got - want2)) < 0.06
    gc = np.asarray(approx.p_cos(jnp.asarray(x))) * 4.0
    assert np.max(np.abs(gc - (-np.cos(np.pi * x)))) < 0.06


def test_fis_sortable_roundtrip(rng):
    x = np.concatenate([
        rng.uniform(-1e6, 1e6, 4096), [0.0, -0.0, 1.0, -1.0, 3.4e38, -3.4e38]
    ]).astype(np.float32)
    u = np.asarray(approx.fis_to_u32(jnp.asarray(x)))
    back = np.asarray(approx.fis_from_u32(jnp.asarray(u)))
    np.testing.assert_array_equal(back.view(np.uint32), x.view(np.uint32))
    # Order preservation: sorting the uints sorts the floats.
    order_f = np.argsort(x, kind="stable")
    order_u = np.argsort(u, kind="stable")
    np.testing.assert_array_equal(x[order_f], x[order_u])
