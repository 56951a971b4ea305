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
    # Non-uniform 60->128 rows has no phase structure but general-shards now.
    assert spatial.spatial_shardable((60, 96), (128, 192), 4)
    assert not spatial.spatial_shardable((62, 96), (128, 192), 4)  # 62 % 4
    # 1.5x has no exact phase structure but rides the general row-plan path.
    assert spatial.spatial_shardable((64, 96), (96, 144), 2)
    assert not spatial.spatial_shardable((66, 96), (132, 192), 4)  # 66 % 4 != 0
    # General path needs an 8-row halo per strip: 64/16 = 4 < 8.
    assert not spatial.spatial_shardable((64, 96), (96, 144), 16)


@pytest.mark.parametrize(
    "in_hw,out_hw,n_sp",
    [
        ((96, 144), (144, 216), 4),   # 1.5x quality preset ratio
        ((80, 130), (136, 221), 2),   # 1.7x balanced preset ratio
        ((90, 130), (117, 169), 3),   # 1.3x ultra-quality preset ratio
    ],
)
def test_spatial_sharded_general_xla(rng, in_hw, out_hw, n_sp):
    """Arbitrary-ratio row sharding (XLA path): every shard consumes the
    global host-exact coordinate plan, so taps/fractions are identical and
    results match the unsharded path to XLA fusion (FMA) noise — ulps, far
    below the 1/255 budget.  (The kernel path is bit-exact; see
    test_spatial_sharded_general_kernel_interpret.)"""
    mesh = sharding.make_mesh(n_sp, ("sp",))
    img = rng.uniform(0, 1, (3, *in_hw)).astype(np.float32)
    out = spatial.upscale_spatial_sharded(jnp.asarray(img), out_hw, mesh, axis="sp")
    want = _reference(img, out_hw)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)


def test_spatial_sharded_general_easu_only(rng):
    mesh = sharding.make_mesh(4, ("sp",))
    in_hw, out_hw = (96, 144), (144, 216)
    img = rng.uniform(0, 1, (3, *in_hw)).astype(np.float32)
    out = spatial.upscale_spatial_sharded(
        jnp.asarray(img), out_hw, mesh, axis="sp", apply_rcas=False
    )
    con = EasuConstants.create(
        (in_hw[1], in_hw[0]), None, (out_hw[1], out_hw[0])
    )
    want = np.asarray(easu_ops.easu(jnp.asarray(img), out_hw, con))
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((96, 256), (144, 384)),   # 1.5x: hybrid X-phase kernel mode
        ((80, 272), (136, 462)),   # ~1.7x: col-gather kernel mode
    ],
)
def test_spatial_sharded_general_kernel_interpret(rng, monkeypatch, in_hw, out_hw):
    """Force the gather-kernel-per-shard route (interpret mode) on the CPU
    mesh: shard seams must be bit-exact vs the unsharded gather kernel,
    which is what runs on real TPU shards."""
    from fsr_tpu.kernels import easu_gather as eg

    monkeypatch.setattr(eg, "INTERPRET", True)
    monkeypatch.setattr(spatial, "_kernel_path", lambda mesh: True)
    n_sp = 4
    mesh = sharding.make_mesh(n_sp, ("sp",))
    img = rng.uniform(0, 1, (3, *in_hw)).astype(np.float32)
    out = spatial.upscale_spatial_sharded(jnp.asarray(img), out_hw, mesh, axis="sp")
    con = EasuConstants.create(
        (in_hw[1], in_hw[0]), None, (out_hw[1], out_hw[0])
    )
    want = eg.easu_gather(
        jnp.asarray(img), out_hw, con, RcasConstants(0.25), apply_rcas=True
    )
    out, want = np.asarray(out), np.asarray(want)
    assert np.array_equal(out, want)
    # Explicit seam check: rows around every shard boundary agree.
    hl = out_hw[0] // n_sp
    for k in range(1, n_sp):
        np.testing.assert_array_equal(
            out[..., hl * k - 2 : hl * k + 2, :],
            want[..., hl * k - 2 : hl * k + 2, :],
        )


def test_dither_origin_offsets():
    """Dither positions with origin=(r0, c0) equal the global positions
    sliced at that offset — the sharded-epilogue contract."""
    from fsr_tpu.ops import extras

    full = np.asarray(extras.tepd_dither((64, 96), 7))
    part = np.asarray(
        extras.tepd_dither((16, 40), 7, origin=(jnp.int32(24), jnp.int32(8)))
    )
    np.testing.assert_array_equal(part, full[24:40, 8:48])

    rng = np.random.default_rng(3)
    tex = rng.uniform(0, 1, (2, 128, 128)).astype(np.float32)
    fullt = np.asarray(extras.texture_dither((256, 300), 1, tex))
    partt = np.asarray(
        extras.texture_dither((64, 300), 1, tex, origin=(jnp.int32(192), 0))
    )
    np.testing.assert_array_equal(partt, fullt[192:256])


def test_spatial_sharded_epilogue_kernel_interpret(rng, monkeypatch):
    """Fused epilogue (grain + TEPD 10-bit dither) under general-ratio
    sharding, kernel path: bit-exact vs the unsharded gather kernel —
    the per-shard row offsets feed the global-coordinate hash and the
    grain row-shards with the output."""
    from fsr_tpu.kernels import easu_gather as eg
    from fsr_tpu.kernels.epilogue import Epilogue

    monkeypatch.setattr(eg, "INTERPRET", True)
    monkeypatch.setattr(spatial, "_kernel_path", lambda mesh: True)
    n_sp = 4
    mesh = sharding.make_mesh(n_sp, ("sp",))
    in_hw, out_hw = (48, 256), (72, 384)
    img = jnp.asarray(rng.uniform(0, 1, (3, *in_hw)).astype(np.float32))
    grain = jnp.asarray(
        rng.uniform(-0.5, 0.5, (3, *out_hw)).astype(np.float32)
    )
    epi = Epilogue(transform="gamma2", grain_amount=0.3, dither_bits=10)
    out = spatial.upscale_spatial_sharded(
        img, out_hw, mesh, axis="sp", epilogue=epi, frame=5, grain=grain
    )
    con = EasuConstants.create(
        (in_hw[1], in_hw[0]), None, (out_hw[1], out_hw[0])
    )
    want = eg.easu_gather(
        img, out_hw, con, RcasConstants(0.25), apply_rcas=True,
        epilogue=epi, frame=5, grain=grain,
    )
    assert np.array_equal(np.asarray(out), np.asarray(want))


def test_spatial_sharded_texture_dither_kernel_interpret(rng, monkeypatch):
    """Blue-noise texture dither under sharding (the sample's HDR10 output
    path, FSR_Tonemapping.hlsl:86-88): the 128-row page roll folds in the
    shard row offset."""
    from fsr_tpu.kernels import easu_gather as eg
    from fsr_tpu.kernels.epilogue import Epilogue

    monkeypatch.setattr(eg, "INTERPRET", True)
    monkeypatch.setattr(spatial, "_kernel_path", lambda mesh: True)
    mesh = sharding.make_mesh(4, ("sp",))
    in_hw, out_hw = (96, 256), (144, 384)
    img = jnp.asarray(rng.uniform(0, 1, (3, *in_hw)).astype(np.float32))
    page = jnp.asarray(rng.uniform(0, 1, (128, 128)).astype(np.float32))
    epi = Epilogue(dither_bits=10, dither_texture=True)
    out = spatial.upscale_spatial_sharded(
        img, out_hw, mesh, axis="sp", epilogue=epi, dither_page=page
    )
    con = EasuConstants.create(
        (in_hw[1], in_hw[0]), None, (out_hw[1], out_hw[0])
    )
    want = eg.easu_gather(
        img, out_hw, con, RcasConstants(0.25), apply_rcas=True,
        epilogue=epi, dither_page=page,
    )
    assert np.array_equal(np.asarray(out), np.asarray(want))


def test_spatial_sharded_epilogue_xla(rng):
    """XLA-path sharded epilogue (grain + transform, no dither knife
    edges): matches the unsharded XLA chain."""
    from fsr_tpu.kernels.epilogue import Epilogue
    from fsr_tpu import api

    mesh = sharding.make_mesh(2, ("sp",))
    in_hw, out_hw = (48, 96), (72, 144)
    img = jnp.asarray(rng.uniform(0, 1, (3, *in_hw)).astype(np.float32))
    grain = jnp.asarray(
        rng.uniform(-0.5, 0.5, (3, *out_hw)).astype(np.float32)
    )
    epi = Epilogue(transform="gamma2", grain_amount=0.25)
    out = spatial.upscale_spatial_sharded(
        img, out_hw, mesh, axis="sp", epilogue=epi, grain=grain
    )
    want = api.upscale(
        img, out_size=out_hw, impl="xla", epilogue=epi, grain=grain
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), atol=2e-6
    )


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


def test_spatial_sharded_exact_phase_fused_epilogue(rng, monkeypatch):
    """Exact-phase (2x) sharding with the grain + blue-noise dither
    epilogue FUSED through the phase-decomposed kernel (the reference
    fuses TEPD inline regardless of tiling, FSR_Tonemapping.hlsl:86-88):
    the shard bakes its row offset into the phase-planar operands — grain
    planarized from the LOCAL halo'd strip, the 128-row dither page
    pre-rolled by the global row offset (planar_offset_ok) — and must be
    bit-exact vs the unsharded fused kernel."""
    from fsr_tpu.kernels import fused
    from fsr_tpu.kernels.epilogue import Epilogue

    monkeypatch.setattr(fused, "INTERPRET", True)
    monkeypatch.setattr(spatial, "_kernel_path", lambda mesh: True)
    mesh = sharding.make_mesh(4, ("sp",))
    in_hw, out_hw = (64, 128), (128, 256)
    img = jnp.asarray(rng.uniform(0, 1, (3, *in_hw)).astype(np.float32))
    grain = jnp.asarray(
        rng.uniform(-0.5, 0.5, (3, *out_hw)).astype(np.float32)
    )
    page = jnp.asarray(rng.uniform(0, 1, (128, 128)).astype(np.float32))
    epi = Epilogue(grain_amount=0.3, dither_bits=10, dither_texture=True)
    out = spatial.upscale_spatial_sharded(
        img, out_hw, mesh, axis="sp", epilogue=epi, frame=2, grain=grain,
        dither_page=page,
    )
    con = EasuConstants.create(
        (in_hw[1], in_hw[0]), None, (out_hw[1], out_hw[0])
    )
    want = fused.upscale_fused(
        img, out_hw, con, RcasConstants(0.25), epilogue=epi, frame=2,
        grain_planar=fused.planarize_grain(grain, out_hw, con),
        dither_page=page,
    )
    # The sharded strips compile as different graphs than the unsharded
    # frame, and XLA's context-dependent FMA contraction moves the RCAS
    # resolve by ~1 ulp — which at a TEPD quantization tie flips the
    # output by one code.  Contract: codes within one 1/1023 step
    # everywhere, ties flipping on < 0.1% of pixels.
    o, v = np.asarray(out), np.asarray(want)
    step = np.float32(1.0 / 1023.0)
    assert np.abs(o - v).max() <= step + 1e-6
    assert (o != v).mean() < 1e-3


def test_spatial_sharded_exact_phase_fused_grain_hash_dither(
    rng, monkeypatch
):
    """Same exact-phase fused-epilogue route with the golden-ratio hash
    dither (global coordinates via row_offset) and gamma2 transform."""
    from fsr_tpu.kernels import fused
    from fsr_tpu.kernels.epilogue import Epilogue

    monkeypatch.setattr(fused, "INTERPRET", True)
    monkeypatch.setattr(spatial, "_kernel_path", lambda mesh: True)
    mesh = sharding.make_mesh(4, ("sp",))
    in_hw, out_hw = (64, 128), (128, 256)
    img = jnp.asarray(rng.uniform(0, 1, (3, *in_hw)).astype(np.float32))
    grain = jnp.asarray(
        rng.uniform(-0.5, 0.5, (3, *out_hw)).astype(np.float32)
    )
    epi = Epilogue(transform="gamma2", grain_amount=0.25, dither_bits=8)
    out = spatial.upscale_spatial_sharded(
        img, out_hw, mesh, axis="sp", epilogue=epi, frame=7, grain=grain
    )
    con = EasuConstants.create(
        (in_hw[1], in_hw[0]), None, (out_hw[1], out_hw[0])
    )
    want = fused.upscale_fused(
        img, out_hw, con, RcasConstants(0.25), epilogue=epi, frame=7,
        grain_planar=fused.planarize_grain(grain, out_hw, con),
    )
    # Same contract as the texture-dither case: one 1/255 step max
    # (cross-graph FMA contraction can flip a quantization tie), with
    # flips on < 0.1% of pixels.
    o, v = np.asarray(out), np.asarray(want)
    step = np.float32(1.0 / 255.0)
    assert np.abs(o - v).max() <= step + 1e-6
    assert (o != v).mean() < 1e-3


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


def test_spatial_sharded_rgba(rng, monkeypatch):
    """RGBA under row sharding: kernel path (interpret) matches the
    unsharded gather kernel bit-for-bit; alpha is bilinear."""
    from fsr_tpu.kernels import easu_gather as eg

    monkeypatch.setattr(eg, "INTERPRET", True)
    monkeypatch.setattr(spatial, "_kernel_path", lambda mesh: True)
    mesh = sharding.make_mesh(4, ("sp",))
    in_hw, out_hw = (80, 272), (136, 462)  # 1.7x col-gather mode
    img = jnp.asarray(rng.uniform(0, 1, (4, *in_hw)).astype(np.float32))
    out = spatial.upscale_spatial_sharded(img, out_hw, mesh, axis="sp")
    con = EasuConstants.create(
        (in_hw[1], in_hw[0]), None, (out_hw[1], out_hw[0])
    )
    want = eg.easu_gather(
        img, out_hw, con, RcasConstants(0.25), apply_rcas=True
    )
    assert np.array_equal(np.asarray(out), np.asarray(want))


def test_spatial_sharded_rgba_xla(rng):
    from fsr_tpu import api

    mesh = sharding.make_mesh(4, ("sp",))
    in_hw, out_hw = (96, 144), (144, 216)
    img = jnp.asarray(rng.uniform(0, 1, (4, *in_hw)).astype(np.float32))
    out = spatial.upscale_spatial_sharded(img, out_hw, mesh, axis="sp")
    want = api.upscale(img, out_size=out_hw, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-6)


def test_spatial_sharded_u8_io_kernel_interpret(rng, monkeypatch):
    """Byte pipeline under sharding: u8 strips through the halo exchange,
    in-kernel decode + UNORM encode; bit-exact vs the unsharded kernel."""
    from fsr_tpu.kernels import easu_gather as eg

    monkeypatch.setattr(eg, "INTERPRET", True)
    monkeypatch.setattr(spatial, "_kernel_path", lambda mesh: True)
    mesh = sharding.make_mesh(4, ("sp",))
    # hl = 24 == tj: whole-strip tiles satisfy the u8 32-row granule rule.
    in_hw, out_hw = (64, 256), (96, 384)  # 1.5x hybrid
    img = jnp.asarray(
        (rng.random((3, *in_hw)) * 255).astype(np.uint8)
    )
    out = spatial.upscale_spatial_sharded(
        img, out_hw, mesh, axis="sp", out_dtype=jnp.uint8
    )
    assert out.dtype == jnp.uint8
    con = EasuConstants.create(
        (in_hw[1], in_hw[0]), None, (out_hw[1], out_hw[0])
    )
    want = eg.easu_gather(
        img, out_hw, con, RcasConstants(0.25), apply_rcas=True,
        out_dtype=jnp.uint8,
    )
    assert np.array_equal(np.asarray(out), np.asarray(want))


def test_spatial_sharded_u16_out_xla(rng):
    mesh = sharding.make_mesh(4, ("sp",))
    in_hw, out_hw = (96, 144), (144, 216)
    img = jnp.asarray(rng.uniform(0, 1, (3, *in_hw)).astype(np.float32))
    out = spatial.upscale_spatial_sharded(
        img, out_hw, mesh, axis="sp", out_dtype=jnp.uint16
    )
    assert out.dtype == jnp.uint16
    from fsr_tpu.kernels.epilogue import encode_unorm10

    want = encode_unorm10(jnp.asarray(_reference(img, out_hw)))
    # Codes are integers; FMA noise can flip a knife-edge code by 1.
    d = np.abs(np.asarray(out).astype(np.int32) - np.asarray(want).astype(np.int32))
    assert d.max() <= 1 and (d != 0).mean() < 1e-3


def test_spatial_sharded_fuzz_ratios(rng):
    """Randomized (ratio, shard-count) sweep of the general path's plan
    builder: odd sizes, ragged tiles, coordinate drift — every config
    must match the unsharded XLA chain."""
    cases = 0
    for _ in range(12):
        n = int(rng.choice([2, 3, 4, 6, 8]))
        hin = int(n * rng.integers(8, 30))
        win = int(rng.integers(40, 160))
        s = float(rng.uniform(1.05, 2.0))
        hout = int(-(-int(hin * s) // n) * n)
        wout = int(win * s)
        if not spatial.spatial_shardable((hin, win), (hout, wout), n):
            continue
        mesh = sharding.make_mesh(n, ("sp",))
        img = rng.uniform(0, 1, (3, hin, win)).astype(np.float32)
        out = spatial.upscale_spatial_sharded(
            jnp.asarray(img), (hout, wout), mesh, axis="sp"
        )
        want = _reference(img, (hout, wout))
        np.testing.assert_allclose(
            np.asarray(out), want, atol=3e-6,
            err_msg=f"in={hin}x{win} out={hout}x{wout} n={n}",
        )
        cases += 1
    assert cases >= 6, f"only {cases} valid fuzz cases generated"


def test_pipeline_mesh_full_chain(rng):
    """UpscalePipeline(mesh=...) runs the full chain row-sharded: matches
    the single-device pipeline (XLA paths on the CPU mesh)."""
    from fsr_tpu import api

    mesh = sharding.make_mesh(4, ("sp",))
    in_hw, out_hw = (96, 144), (144, 216)
    hdr = rng.uniform(0, 4.0, (3, *in_hw)).astype(np.float32)
    grain = rng.uniform(-0.5, 0.5, (3, *out_hw)).astype(np.float32)
    kw = dict(
        out_size=out_hw, hdr_srtm=True, grain_amount=0.25, dither_bits=10
    )
    sharded = api.UpscalePipeline(mesh=mesh, **kw)
    single = api.UpscalePipeline(impl="xla", **kw)
    got = np.asarray(sharded(jnp.asarray(hdr), grain=jnp.asarray(grain), frame=3))
    want = np.asarray(single(jnp.asarray(hdr), grain=jnp.asarray(grain), frame=3))
    # Both run dithered-quantized codes; FMA noise can flip knife-edge
    # codes (1/1023 steps) at isolated pixels.
    d = np.abs(got - want)
    assert (d > 1.5 / 1023).mean() == 0 and (d != 0).mean() < 2e-3
