"""edge_pad kernel vs jnp.pad(mode="edge") ground truth."""

import jax.numpy as jnp
import numpy as np
import pytest

from fsr_tpu.kernels import pad as padk


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(padk, "INTERPRET", True)


CASES = [
    ((3, 136, 256), (3, 5, 3, 61), jnp.float32),
    ((3, 136, 256), (3, 5, 3, 61), jnp.bfloat16),
    ((2, 3, 144, 128), (2, 7, 1, 40), jnp.float32),
    ((3, 136, 256), (0, 0, 0, 64), jnp.float32),
    ((3, 136, 256), (8, 8, 2, 2), jnp.float16),
]


@pytest.mark.parametrize("shape,pads,dt", CASES)
def test_edge_pad_matches_jnp_pad(shape, pads, dt):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))
    got = np.asarray(padk.edge_pad(x, pads, dt))
    want = np.asarray(padk._xla_pad(x, pads, dt))
    assert got.shape == want.shape
    assert np.array_equal(got, want)


def test_edge_pad_fallback_shapes():
    """Odd heights / narrow widths route to the XLA fallback, same result."""
    rng = np.random.default_rng(1)
    for shape in [(3, 100, 256), (3, 135, 256), (3, 136, 96), (3, 7, 256)]:
        x = jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))
        got = np.asarray(padk.edge_pad(x, (3, 5, 3, 17), jnp.float32))
        want = np.asarray(padk._xla_pad(x, (3, 5, 3, 17), jnp.float32))
        assert np.array_equal(got, want)
