"""Edge-replicating pad as a single-pass Pallas kernel.

Both stencil kernels edge-pad their input (the CLAMP sampler semantics of
the reference, FSR_Filter.cpp:49-50) and convert it to the storage dtype
before tiling.  XLA lowers jnp.pad(mode="edge") to one concatenate pass per
axis plus a separate convert — three full-buffer passes (~0.1-0.2 ms per 4K
frame).  This kernel fuses all of it into one read/one write at DMA speed:
per output row-strip it DMAs a clamped input window, realigns rows with one
dynamic sublane roll, widens columns with one lane roll, and fixes the
replicated borders with masked selects.

Used on the compiled TPU path; callers fall back to jnp.pad when the image
is too short to window (H < strip + 8).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False


def kernel_path_ok(h: int, w: int) -> bool:
    """True when the Pallas pad kernel can window this image: Mosaic DMA
    needs provably 8-aligned sublane offsets and 128-multiple lane
    extents, so 8 | h and 128 | w (and enough rows to window)."""
    ts = 128
    while ts + 8 > h and ts > 8:
        ts -= 8
    return not (ts + 8 > h or h % 8 or w < 128 or w % 128)


def _xla_pad(image, pads, out_dtype):
    pt, pb, pl_, pr = pads
    return jnp.pad(
        image.astype(out_dtype),
        ((0, 0),) * (image.ndim - 2) + ((pt, pb), (pl_, pr)),
        mode="edge",
    )


@functools.partial(jax.jit, static_argnames=("pads", "out_dtype"))
def edge_pad(image: jnp.ndarray, pads: Tuple[int, int, int, int], out_dtype):
    """Edge-pad the last two axes of (..., C, H, W) and convert dtype.

    pads: (top, bottom, left, right), all >= 0.  Bit-identical to
    jnp.pad(image.astype(out_dtype), ..., mode="edge") — the convert
    happens before replication either way since replication just copies.
    """
    pt, pb, pl_, pr = pads
    *lead, h, w = image.shape
    hout, wout = h + pt + pb, w + pl_ + pr

    if jax.default_backend() != "tpu" and not INTERPRET:
        return _xla_pad(image, pads, out_dtype)
    ts = 128
    while ts + 8 > h and ts > 8:
        ts -= 8
    # Row DMA offsets must be provably 8-aligned into the tiled HBM memref,
    # so the kernel path needs 8 | h (otherwise the bottom rows cannot be
    # windowed), and full-width row DMAs need 128 | w; the main configs
    # (1080/1440/2160-row, 1920/2560-wide inputs) qualify.  (Gating logic
    # mirrored by kernel_path_ok for callers that pick a pad strategy.)
    if not kernel_path_ok(h, w) or image.ndim < 3:
        return _xla_pad(image, pads, out_dtype)

    nc = image.shape[-3]
    img = image.reshape((-1, nc) + image.shape[-2:])
    nb = img.shape[0]
    win_r = ts + 8
    nstrips = pl.cdiv(hout, ts)

    # Per-strip aligned clamped window starts: window [a, a + win_r) covers
    # source rows clip(t*ts - pt .. t*ts + ts-1 - pt, 0, h-1).
    starts = np.zeros(nstrips, np.int32)
    for t in range(nstrips):
        starts[t] = min(max((t * ts - pt) // 8 * 8, 0), h - win_r)

    def kernel(a_ref, src_ref, out_ref, tin, sem):
        bi = pl.program_id(0)
        t = pl.program_id(1)
        a = pl.multiple_of(a_ref[t], 8)
        dma = pltpu.make_async_copy(
            src_ref.at[bi, :, pl.ds(a, win_r), :], tin, sem)
        dma.start()
        dma.wait()

        x = tin[:, :, :]
        # Mosaic's dynamic rotate handles 32-bit vectors only: widen
        # sub-32-bit storage (bf16/f16/u8) for the realignment, exactly
        # (bf16/f16 -> f32 and u8 -> i32 are value-preserving), and cast
        # back at the store.
        if jnp.dtype(img.dtype).itemsize < 4:
            wide = (jnp.int32 if jnp.issubdtype(img.dtype, jnp.integer)
                    else jnp.float32)
            x = x.astype(wide)
        # Rows: out row r holds source row clip(t*ts + r - pt, 0, h-1) - a;
        # one roll realigns the window, masked selects replicate the edges.
        u = t * ts - pt - a  # may be negative only in the top strip
        x = pltpu.roll(x, jnp.remainder(-u, win_r), axis=1)[:, :ts, :]
        riota = jax.lax.broadcasted_iota(jnp.int32, (1, ts, 1), 1)
        grow = t * ts + riota - pt
        top = tin[:, 0:1, :].astype(x.dtype)
        # bot is only read when the strip extends past the image bottom,
        # and those strips have a clipped to h - win_r, putting source row
        # h-1 statically at window row win_r-1 (a dynamic h-1-a load would
        # need unprovable sublane alignment).
        bot = tin[:, win_r - 1:win_r, :].astype(x.dtype)
        x = jnp.where(grow < 0, top, x)
        x = jnp.where(grow > h - 1, bot, x)
        # Columns: widen, roll left-pad into place, replicate edges.
        if wout > w:
            x = jnp.concatenate(
                [x, jnp.zeros((nc, ts, wout - w), x.dtype)], axis=2)
        if pl_:
            x = pltpu.roll(x, pl_, axis=2)
        liota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, wout), 2)
        if pl_:
            x = jnp.where(liota < pl_, x[:, :, pl_:pl_ + 1], x)
        if pr:
            x = jnp.where(liota >= pl_ + w,
                          x[:, :, pl_ + w - 1:pl_ + w], x)
        out_ref[0, :, :, :] = x.astype(out_dtype)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb, nstrips),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (1, nc, ts, wout), lambda bi, t, *_: (bi, 0, t, 0)),
            scratch_shapes=[
                pltpu.VMEM((nc, win_r, w), img.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (nb, nc, hout, wout), jnp.dtype(out_dtype)),
        interpret=INTERPRET,
    )(jnp.asarray(starts), img)
    return out.reshape(tuple(lead) + (hout, wout))
