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
