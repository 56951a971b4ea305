"""Fused output epilogue (kernels/epilogue.py): kernel-vs-XLA parity.

The reference ships SRTM/LFGA/TEPD as inline shader helpers designed to be
fused into the caller's passes (ffx_fsr1.h:990-1199); here they fuse into
the stencil kernels' writeback.  These tests run the kernels in interpret
mode and compare against the identical chain built from fsr_tpu.ops.extras.

The TEPD comparison allows isolated knife-edge flips: a one-ulp difference
in the dither threshold flips the quantization step of a pixel sitting
exactly on the boundary, changing it by one (squared) step — the allowed
mismatch is a tiny pixel count, each within one step.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import fsr_tpu
from fsr_tpu.core.constants import EasuConstants, RcasConstants
from fsr_tpu.kernels import easu_gather, fused, pad
from fsr_tpu.kernels.epilogue import Epilogue
from fsr_tpu.ops import extras as xtr


@pytest.fixture(autouse=True)
def _interpret():
    fused.INTERPRET = True
    easu_gather.INTERPRET = True
    pad.INTERPRET = True
    yield
    fused.INTERPRET = False
    easu_gather.INTERPRET = False
    pad.INTERPRET = False


def _con(in_hw, out_hw):
    return EasuConstants.create((in_hw[1], in_hw[0]), None, (out_hw[1], out_hw[0]))


def _extras_chain(x, epi, grain, frame):
    if epi.transform == "srtm_inv":
        x = xtr.srtm_inv(x)
    elif epi.transform == "gamma2":
        x = x * x
    if epi.needs_grain:
        x = xtr.lfga(x, jnp.asarray(grain), epi.grain_amount)
    if epi.dither_bits is not None:
        x = xtr.tepd_quantize(
            x, xtr.tepd_dither(x.shape[-2:], frame), bits=epi.dither_bits
        )
    return np.asarray(x)


def _check(got, want, epi, max_flips=4):
    d = np.abs(got - want)
    if epi.dither_bits is None:
        # rtol covers srtm_inv's HDR range with the kernel's fast rcp
        # (interpret-mode pl.reciprocal is crude; hardware is ~1e-7 rel,
        # verified by tools/verify_on_tpu.py).
        np.testing.assert_allclose(got, want, atol=2e-6, rtol=3e-5)
        return
    # Allow isolated knife-edge dither flips of at most one squared step.
    step = 1.0 / (255.0 if epi.dither_bits == 8 else 1023.0)
    bad = d > 2e-6
    assert bad.sum() <= max_flips, f"{bad.sum()} dither mismatches"
    assert d.max() <= 2.05 * step, f"dither mismatch beyond one step: {d.max()}"


EPILOGUES = [
    Epilogue(transform="gamma2"),
    Epilogue(transform="srtm_inv"),
    Epilogue(grain_amount=0.3),
    Epilogue(dither_bits=10),
    Epilogue(transform="gamma2", grain_amount=0.25, dither_bits=8),
]


@pytest.mark.parametrize("epi", EPILOGUES)
def test_fused_2x_epilogue(rng, epi):
    in_hw, out_hw = (40, 144), (80, 288)
    img = rng.uniform(0, 1, (3, *in_hw)).astype(np.float32)
    con, rcon = _con(in_hw, out_hw), RcasConstants(0.25)
    grain = rng.uniform(-0.5, 0.5, (3, *out_hw)).astype(np.float32)
    gp = fused.planarize_grain(grain, out_hw, con) if epi.needs_grain else None
    got = np.asarray(fused.upscale_fused(
        jnp.asarray(img), out_hw, con, rcon,
        epilogue=epi, frame=3, grain_planar=gp,
    ))
    base = fused.upscale_fused(jnp.asarray(img), out_hw, con, rcon)
    want = _extras_chain(base, epi, grain, 3)
    _check(got, want, epi)


def test_fused_2x_epilogue_easu_only(rng):
    in_hw, out_hw = (40, 144), (80, 288)
    img = rng.uniform(0, 1, (3, *in_hw)).astype(np.float32)
    con = _con(in_hw, out_hw)
    epi = Epilogue(transform="gamma2", dither_bits=10)
    got = np.asarray(fused.upscale_fused(
        jnp.asarray(img), out_hw, con, RcasConstants(0.0),
        apply_rcas=False, epilogue=epi, frame=1,
    ))
    base = fused.upscale_fused(
        jnp.asarray(img), out_hw, con, RcasConstants(0.0), apply_rcas=False
    )
    want = _extras_chain(base, epi, None, 1)
    _check(got, want, epi)


@pytest.mark.parametrize(
    "epi",
    [Epilogue(transform="gamma2", grain_amount=0.25, dither_bits=8),
     Epilogue(transform="srtm_inv")],
)
def test_gather_epilogue(rng, epi):
    in_hw, out_hw = (48, 160), (72, 240)  # 1.5x, matmul row/col selection
    img = rng.uniform(0, 1, (3, *in_hw)).astype(np.float32)
    con, rcon = _con(in_hw, out_hw), RcasConstants(0.25)
    grain = rng.uniform(-0.5, 0.5, (3, *out_hw)).astype(np.float32)
    got = np.asarray(easu_gather.easu_gather(
        jnp.asarray(img), out_hw, con, rcon, apply_rcas=True,
        epilogue=epi, frame=2,
        grain=jnp.asarray(grain) if epi.needs_grain else None,
    ))
    base = easu_gather.easu_gather(
        jnp.asarray(img), out_hw, con, rcon, apply_rcas=True
    )
    want = _extras_chain(base, epi, grain, 2)
    _check(got, want, epi)


def test_gather_epilogue_easu_only(rng):
    in_hw, out_hw = (48, 160), (72, 240)
    img = rng.uniform(0, 1, (3, *in_hw)).astype(np.float32)
    con = _con(in_hw, out_hw)
    got = np.asarray(easu_gather.easu_gather(
        jnp.asarray(img), out_hw, con, None, apply_rcas=False,
        epilogue=Epilogue(transform="gamma2"),
    ))
    base = np.asarray(easu_gather.easu_gather(
        jnp.asarray(img), out_hw, con, None, apply_rcas=False
    ))
    np.testing.assert_allclose(got, base * base, atol=2e-6, rtol=0)


def test_fused_srtm_prologue(rng):
    in_hw, out_hw = (40, 144), (80, 288)
    hdr = rng.uniform(0, 8.0, (3, *in_hw)).astype(np.float32)
    con, rcon = _con(in_hw, out_hw), RcasConstants(0.25)
    got = np.asarray(fused.upscale_fused(
        jnp.asarray(hdr), out_hw, con, rcon, prologue="srtm"
    ))
    want = np.asarray(fused.upscale_fused(
        xtr.srtm(jnp.asarray(hdr)), out_hw, con, rcon
    ))
    # interpret-mode pl.reciprocal is crude and isolated chaotic-direction
    # pixels amplify it; hardware matches ~1e-6 (tools/verify_on_tpu.py)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=0)
    d = np.abs(got - want)
    assert (d > 6e-4).sum() <= 4


def test_gather_srtm_prologue(rng):
    in_hw, out_hw = (48, 160), (72, 240)
    hdr = rng.uniform(0, 8.0, (3, *in_hw)).astype(np.float32)
    con, rcon = _con(in_hw, out_hw), RcasConstants(0.25)
    got = np.asarray(easu_gather.easu_gather(
        jnp.asarray(hdr), out_hw, con, rcon, apply_rcas=True, prologue="srtm"
    ))
    want = np.asarray(easu_gather.easu_gather(
        xtr.srtm(jnp.asarray(hdr)), out_hw, con, rcon, apply_rcas=True
    ))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=0)
    d = np.abs(got - want)
    assert (d > 6e-4).sum() <= 4


def test_planarize_grain_roundtrip(rng):
    out_hw = (80, 288)
    con = _con((40, 144), out_hw)
    grain = rng.uniform(-0.5, 0.5, (3, *out_hw)).astype(np.float32)
    gp = np.asarray(fused.planarize_grain(grain, out_hw, con))
    qy = qx = 2
    assert gp.shape == (qy * qx, 3, out_hw[0] // qy, out_hw[1] // qx)
    for a in range(qy):
        for b in range(qx):
            np.testing.assert_array_equal(
                gp[a * qx + b], grain[:, a::qy, b::qx]
            )


def test_epilogue_validation():
    with pytest.raises(ValueError):
        Epilogue(transform="nope")
    with pytest.raises(ValueError):
        Epilogue(dither_bits=9)
    with pytest.raises(ValueError):
        Epilogue(transform="srtm_inv", dither_bits=10)
    assert Epilogue().is_noop
    assert not Epilogue(transform="gamma2").is_noop


def test_pipeline_xla_matches_manual_chain(rng):
    in_hw, out_hw = (40, 144), (80, 288)
    img = rng.uniform(0, 4.0, (3, *in_hw)).astype(np.float32)
    grain = rng.uniform(-0.5, 0.5, (3, *out_hw)).astype(np.float32)
    pipe = fsr_tpu.UpscalePipeline(
        out_hw, hdr_srtm=True, grain_amount=0.3, dither_bits=10
    )
    out = pipe(jnp.asarray(img), grain=jnp.asarray(grain), frame=5)
    x = xtr.srtm(jnp.asarray(img))
    x = fsr_tpu.upscale(x, out_size=out_hw)
    x = xtr.lfga(x, jnp.asarray(grain), 0.3)
    x = xtr.tepd_quantize(x, xtr.tepd_dither(out_hw, 5), bits=10)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_pipeline_hdr_out_roundtrip(rng):
    in_hw, out_hw = (40, 144), (80, 288)
    img = rng.uniform(0, 8.0, (3, *in_hw)).astype(np.float32)
    pipe = fsr_tpu.UpscalePipeline(out_hw, hdr_srtm=True, hdr_out=True)
    out = pipe(jnp.asarray(img))
    x = xtr.srtm(jnp.asarray(img))
    x = fsr_tpu.upscale(x, out_size=out_hw)
    x = xtr.srtm_inv(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5, rtol=0)


def test_pipeline_grain_cache(rng, monkeypatch):
    from fsr_tpu.kernels import dispatch

    monkeypatch.setattr(dispatch, "_on_tpu", lambda: True)
    in_hw, out_hw = (40, 144), (80, 288)
    grain = jnp.asarray(rng.uniform(-0.5, 0.5, (3, *out_hw)).astype(np.float32))
    pipe = fsr_tpu.UpscalePipeline(out_hw, grain_amount=0.2)
    gp1 = pipe._planar_grain(grain, in_hw)
    assert gp1 is not None and len(pipe._grain_cache) == 1
    assert pipe._planar_grain(grain, in_hw) is gp1  # identity cache hit
    # a different texture gets its own entry; the first stays valid
    grain2 = jnp.asarray(rng.uniform(-0.5, 0.5, (3, *out_hw)).astype(np.float32))
    gp2 = pipe._planar_grain(grain2, in_hw)
    assert gp2 is not gp1 and len(pipe._grain_cache) == 2
    assert pipe._planar_grain(grain, in_hw) is gp1


def test_pipeline_grain_cache_off_tpu(rng):
    # Off-TPU the planar layout has no consumer: no eager transpose.
    in_hw, out_hw = (40, 144), (80, 288)
    grain = jnp.asarray(rng.uniform(-0.5, 0.5, (3, *out_hw)).astype(np.float32))
    pipe = fsr_tpu.UpscalePipeline(out_hw, grain_amount=0.2)
    assert pipe._planar_grain(grain, in_hw) is None
    assert pipe._grain_cache == []


def test_fused_texture_dither(rng):
    in_hw, out_hw = (40, 144), (80, 288)
    img = rng.uniform(0, 1, (3, *in_hw)).astype(np.float32)
    con, rcon = _con(in_hw, out_hw), RcasConstants(0.25)
    page = rng.uniform(0, 1, (128, 128)).astype(np.float32)
    epi = Epilogue(dither_bits=10, dither_texture=True)
    got = np.asarray(fused.upscale_fused(
        jnp.asarray(img), out_hw, con, rcon, epilogue=epi,
        dither_page=jnp.asarray(page),
    ))
    base = fused.upscale_fused(jnp.asarray(img), out_hw, con, rcon)
    want = np.asarray(xtr.tepd_quantize(
        base, xtr.texture_dither(out_hw, 0, jnp.asarray(page)), bits=10))
    d = np.abs(got - want)
    step = 1.0 / 1023.0
    assert (d > 2e-6).sum() <= 4 and d.max() <= 2.05 * step


def test_gather_texture_dither(rng):
    in_hw, out_hw = (48, 160), (72, 240)
    img = rng.uniform(0, 1, (3, *in_hw)).astype(np.float32)
    con, rcon = _con(in_hw, out_hw), RcasConstants(0.25)
    page = rng.uniform(0, 1, (128, 128)).astype(np.float32)
    epi = Epilogue(dither_bits=8, dither_texture=True)
    got = np.asarray(easu_gather.easu_gather(
        jnp.asarray(img), out_hw, con, rcon, apply_rcas=True, epilogue=epi,
        dither_page=jnp.asarray(page),
    ))
    base = easu_gather.easu_gather(
        jnp.asarray(img), out_hw, con, rcon, apply_rcas=True)
    want = np.asarray(xtr.tepd_quantize(
        base, xtr.texture_dither(out_hw, 0, jnp.asarray(page)), bits=8))
    d = np.abs(got - want)
    step = 1.0 / 255.0
    assert (d > 2e-6).sum() <= 4 and d.max() <= 2.05 * step


def test_pipeline_texture_dither_pages(rng):
    # multi-page temporal blue noise: page selected by frame (fused path
    # gating exercised on CPU via the XLA twin inside upscale()).
    in_hw, out_hw = (40, 144), (80, 288)
    img = rng.uniform(0, 1, (3, *in_hw)).astype(np.float32)
    tex = rng.uniform(0, 1, (4, 128, 128)).astype(np.float32)
    pipe = fsr_tpu.UpscalePipeline(out_hw, dither_bits=10,
                                   dither_texture=tex)
    out = np.asarray(pipe(jnp.asarray(img), frame=6))
    x = fsr_tpu.upscale(jnp.asarray(img), out_size=out_hw)
    want = np.asarray(xtr.tepd_quantize(
        x, xtr.texture_dither(out_hw, 6, jnp.asarray(tex)), bits=10))
    d = np.abs(out - want)
    assert (d > 2e-6).sum() <= 4 and d.max() <= 2.05 / 1023.0
