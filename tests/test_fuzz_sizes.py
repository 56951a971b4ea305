"""Size fuzzing: random (input, output) shapes through every path.

Catches tile-planning, halo, padding, and ragged-edge bugs that fixed-size
tests miss.  Seeded (deterministic); interpret mode for the kernels.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fsr_tpu.core.constants import EasuConstants, RcasConstants
from fsr_tpu.kernels import easu_gather, fused, rcas_pallas
from fsr_tpu.ops import easu as easu_ops, rcas as rcas_ops


@pytest.fixture(autouse=True)
def _interpret():
    fused.INTERPRET = True
    easu_gather.INTERPRET = True
    rcas_pallas.INTERPRET = True
    yield
    fused.INTERPRET = False
    easu_gather.INTERPRET = False
    rcas_pallas.INTERPRET = False


def _con(in_hw, out_hw):
    return EasuConstants.create((in_hw[1], in_hw[0]), None, (out_hw[1], out_hw[0]))


def _cases(seed, n):
    rng = np.random.default_rng(seed)
    cases = []
    for _ in range(n):
        hin = int(rng.integers(16, 90))
        win = int(rng.integers(48, 200))
        scale = float(rng.uniform(1.05, 2.0))
        hout = int(round(hin * scale))
        wout = int(round(win * scale))
        cases.append(((hin, win), (hout, wout)))
    # plus exact 2x of odd/awkward sizes
    for hin, win in ((17, 67), (23, 129), (9, 200)):
        cases.append(((hin, win), (2 * hin, 2 * win)))
    return cases


@pytest.mark.parametrize("in_hw,out_hw", _cases(7, 8))
def test_fuzz_dispatchable_kernels_match_xla(rng, in_hw, out_hw):
    img = rng.uniform(0, 1, (3, *in_hw)).astype(np.float32)
    con = _con(in_hw, out_hw)
    rcon = RcasConstants(0.25)
    want = np.asarray(
        rcas_ops.rcas(easu_ops.easu(jnp.asarray(img), out_hw, con), rcon)
    )
    ran = []
    if fused.supported((3, *in_hw), out_hw, con, jnp.float32):
        got = np.asarray(fused.upscale_fused(jnp.asarray(img), out_hw, con, rcon))
        np.testing.assert_allclose(got, want, atol=6e-5, rtol=0)
        ran.append("fused")
    if easu_gather.supported((3, *in_hw), out_hw, con, jnp.float32):
        ge = easu_gather.easu_gather(jnp.asarray(img), out_hw, con)
        got = np.asarray(rcas_pallas.rcas_fused(ge, rcon))
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=0)
        ran.append("gather")
    # The XLA path always works; at least record what was exercised.
    assert want.shape == (3, *out_hw)
    del ran


@pytest.mark.parametrize("in_hw,out_hw", _cases(13, 5))
def test_fuzz_uint8_roundtrip(rng, in_hw, out_hw):
    """u8 in/out must be bit-identical to decode -> float kernel -> encode
    on every shape each kernel claims to support."""
    from fsr_tpu.utils import image as im

    img8 = (rng.uniform(0, 1, (3, *in_hw)) * 255).astype(np.uint8)
    con = _con(in_hw, out_hw)
    rcon = RcasConstants(0.25)
    dec = jnp.asarray(im.from_uint8(img8))
    if fused.supported((3, *in_hw), out_hw, con, jnp.float32,
                       out_dtype=jnp.uint8):
        want = im.to_uint8(np.asarray(
            fused.upscale_fused(dec, out_hw, con, rcon)))
        got = np.asarray(fused.upscale_fused(
            jnp.asarray(img8), out_hw, con, rcon, out_dtype=jnp.uint8))
        np.testing.assert_array_equal(got, want)
    if easu_gather.supported((3, *in_hw), out_hw, con, jnp.float32,
                             out_dtype=jnp.uint8):
        want = im.to_uint8(np.asarray(easu_gather.easu_gather(
            dec, out_hw, con, rcon, apply_rcas=True)))
        got = np.asarray(easu_gather.easu_gather(
            jnp.asarray(img8), out_hw, con, rcon, apply_rcas=True,
            out_dtype=jnp.uint8))
        np.testing.assert_array_equal(got, want)
