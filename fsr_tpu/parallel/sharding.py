"""Mesh/batch sharding for video and dataset-preprocessing throughput.

The reference is a single-GPU per-frame effect (SURVEY.md section 2.5); the
TPU-native scaling axes are:

- data parallelism over frames (this module): a batch of frames sharded
  across chips over ICI; upscaling is embarrassingly parallel so XLA inserts
  no collectives — throughput scales linearly with slice size.
- spatial parallelism over image rows (fsr_tpu.parallel.spatial): one frame
  split across chips with ppermute halo exchange, for frames too large for
  one chip or latency-critical single-frame pipelines.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "upscale_batch_sharded"]


def make_mesh(
    n_devices: Optional[int] = None, axis_names: Tuple[str, ...] = ("batch",),
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """Build a device mesh over the first n_devices (default: all)."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if shape is None:
        shape = (n_devices,) + (1,) * (len(axis_names) - 1)
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, axis_names)


def shard_batch(images: jnp.ndarray, mesh: Mesh, axis: str = "batch") -> jnp.ndarray:
    """Place a (B, 3, H, W) batch with B sharded across `axis`."""
    spec = P(axis, *(None,) * (images.ndim - 1))
    return jax.device_put(images, NamedSharding(mesh, spec))


def upscale_batch_sharded(
    images: jnp.ndarray,
    mesh: Mesh,
    axis: str = "batch",
    **upscale_kwargs,
) -> jnp.ndarray:
    """Upscale a batch of frames, batch-sharded across the mesh.

    images: (B, 3, H, W) with B divisible by the mesh axis size.  Equivalent
    to fsr_tpu.upscale, but executed under shard_map so each chip runs the
    full kernel path (Pallas on TPU meshes) on its local frames; no
    collectives are required.  XLA cannot partition an opaque kernel call on
    its own, which is why this is a shard_map and not bare jit+shardings.
    """
    from jax.experimental.shard_map import shard_map

    from fsr_tpu import api

    spec = NamedSharding(mesh, P(axis, None, None, None))
    images = jax.device_put(images, spec)
    pspec = P(axis, None, None, None)
    fn = jax.jit(
        shard_map(
            lambda x: api.upscale(x, **upscale_kwargs),
            mesh=mesh, in_specs=pspec, out_specs=pspec, check_rep=False,
        )
    )
    return fn(images)
