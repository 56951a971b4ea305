"""Sharded execution on a virtual 8-device CPU mesh (conftest sets it up)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from fsr_tpu.core.constants import EasuConstants, RcasConstants
from fsr_tpu.ops import easu as easu_ops, rcas as rcas_ops
from fsr_tpu.parallel import sharding, spatial


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    return sharding.make_mesh(8, ("batch",))


def _reference(img, out_hw, sharp=0.25):
    con = EasuConstants.create(
        (img.shape[-1], img.shape[-2]), None, (out_hw[1], out_hw[0])
    )
    out = easu_ops.easu(jnp.asarray(img), out_hw, con)
    return np.asarray(rcas_ops.rcas(out, RcasConstants(sharp)))


def test_batch_sharded_matches_single(rng, mesh8):
    imgs = rng.uniform(0, 1, (8, 3, 32, 48)).astype(np.float32)
    out = sharding.upscale_batch_sharded(
        jnp.asarray(imgs), mesh8, scale=2.0, sharpness=0.25, impl="xla"
    )
    out = np.asarray(out)
    assert out.shape == (8, 3, 64, 96)
    for i in range(8):
        np.testing.assert_allclose(out[i], _reference(imgs[i], (64, 96)), atol=1e-6)


def test_batch_sharding_layout(mesh8):
    imgs = jnp.zeros((8, 3, 16, 16), jnp.float32)
    placed = sharding.shard_batch(imgs, mesh8)
    assert placed.sharding.spec == P("batch", None, None, None)


@pytest.mark.parametrize("n_sp", [2, 4, 8])
def test_spatial_sharded_matches_single(rng, n_sp):
    mesh = sharding.make_mesh(n_sp, ("sp",))
    in_hw, out_hw = (64, 96), (128, 192)
    img = rng.uniform(0, 1, (3, *in_hw)).astype(np.float32)
    out = spatial.upscale_spatial_sharded(jnp.asarray(img), out_hw, mesh, axis="sp")
    want = _reference(img, out_hw)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)


def test_spatial_sharded_batched(rng):
    mesh = sharding.make_mesh(4, ("sp",))
    in_hw, out_hw = (32, 64), (64, 128)
    imgs = rng.uniform(0, 1, (2, 3, *in_hw)).astype(np.float32)
    out = np.asarray(
        spatial.upscale_spatial_sharded(jnp.asarray(imgs), out_hw, mesh, axis="sp")
    )
    for i in range(2):
        np.testing.assert_allclose(out[i], _reference(imgs[i], out_hw), atol=1e-6)


def test_spatial_shardable_gating():
    assert spatial.spatial_shardable((64, 96), (128, 192), 4)
    assert not spatial.spatial_shardable((60, 96), (128, 192), 4)  # H mismatch
    assert not spatial.spatial_shardable((64, 96), (96, 144), 4)  # 1.5x: no phase
    assert not spatial.spatial_shardable((66, 96), (132, 192), 4)  # 66 % 4 != 0


def test_spatial_plus_batch_mesh(rng):
    # 2-D mesh: batch dp x spatial sp, composed via nested specs.
    mesh = sharding.make_mesh(8, ("dp", "sp"), shape=(2, 4))
    in_hw, out_hw = (32, 64), (64, 128)
    imgs = rng.uniform(0, 1, (4, 3, *in_hw)).astype(np.float32)

    out = spatial.upscale_spatial_sharded(
        jnp.asarray(imgs), out_hw, mesh, axis="sp", batch_axis="dp"
    )
    out = np.asarray(out)
    for i in range(4):
        np.testing.assert_allclose(out[i], _reference(imgs[i], out_hw), atol=1e-6)


def test_spatial_sharded_kernel_path_interpret(rng, monkeypatch):
    """Force the Pallas-kernel-per-shard route (interpret mode) on the CPU
    mesh and check it matches the unsharded reference, including the
    global-coordinate RCAS border clamps on the edge shards."""
    from fsr_tpu.kernels import fused

    monkeypatch.setattr(fused, "INTERPRET", True)
    monkeypatch.setattr(spatial, "_kernel_path", lambda mesh: True)
    mesh = sharding.make_mesh(4, ("sp",))
    in_hw, out_hw = (64, 128), (128, 256)
    img = rng.uniform(0, 1, (3, *in_hw)).astype(np.float32)
    out = spatial.upscale_spatial_sharded(jnp.asarray(img), out_hw, mesh, axis="sp")
    want = _reference(img, out_hw)
    np.testing.assert_allclose(np.asarray(out), want, atol=5e-4)
