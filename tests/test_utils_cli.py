"""Image utils, the CLI demo app, and the pipeline API."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from fsr_tpu.utils import image as im


def test_uint8_codec_d3d_rule():
    x = np.array([0.0, 1.0, 0.4999 / 255, 0.5001 / 255, 2.0, -1.0, np.nan], np.float32)
    got = im.to_uint8(x)
    np.testing.assert_array_equal(got, [0, 255, 0, 1, 255, 0, 0])
    np.testing.assert_allclose(im.from_uint8(np.array([255])), [1.0])


def test_uint10_codec():
    x = np.array([0.0, 1.0, 0.5], np.float32)
    np.testing.assert_array_equal(im.to_uint10(x), [0, 1023, 512])


def test_psnr():
    a = np.zeros((3, 8, 8), np.float32)
    assert im.psnr(a, a) == float("inf")
    b = a + 0.1
    assert abs(im.psnr(a, b) - 20.0) < 1e-3


def test_layout_roundtrip(rng):
    x = rng.uniform(size=(3, 5, 7)).astype(np.float32)
    np.testing.assert_array_equal(im.hwc_to_chw(im.chw_to_hwc(x)), x)


def test_magnify_and_side_by_side(rng):
    x = rng.uniform(size=(3, 64, 64)).astype(np.float32)
    z = im.magnify(x, (32, 32), size=8, zoom=4)
    assert z.shape == (3, 32, 32)
    np.testing.assert_array_equal(z[:, ::4, ::4], x[:, 28:36, 28:36])
    s = im.side_by_side(x, x, pad=2)
    assert s.shape == (3, 64, 130)


def test_image_io_roundtrip(tmp_path, rng):
    x = rng.uniform(size=(3, 16, 24)).astype(np.float32)
    p = str(tmp_path / "img.png")
    im.save_image(p, x)
    back = im.load_image(p)
    assert back.shape == (3, 16, 24)
    assert np.max(np.abs(back - x)) <= 0.5 / 255 + 1e-6
    pn = str(tmp_path / "img.npy")
    im.save_image(pn, x)
    np.testing.assert_array_equal(im.load_image(pn), x)


def test_cli_end_to_end(tmp_path, rng):
    from fsr_tpu import cli

    src = rng.uniform(0, 1, (3, 32, 48)).astype(np.float32)
    inp = str(tmp_path / "in.png")
    outp = str(tmp_path / "out.png")
    cmp_p = str(tmp_path / "cmp.png")
    csv = str(tmp_path / "r.csv")
    im.save_image(inp, src)
    rc = cli.main([inp, outp, "--scale", "2.0", "--impl", "xla",
                   "--benchmark", "2", "--results", csv, "--compare", cmp_p])
    assert rc == 0
    out = im.load_image(outp)
    assert out.shape == (3, 64, 96)
    assert os.path.exists(cmp_p)
    lines = open(csv).read().strip().splitlines()
    assert lines[0] == "frame,ms" and len(lines) == 3

    # Magnified A/B: the strip is two zoomed 32x32 crops + separator.
    mag_p = str(tmp_path / "mag.png")
    rc = cli.main([inp, mag_p, "--scale", "2.0", "--impl", "xla",
                   "--compare", mag_p, "--magnify", "32", "48", "4"])
    assert rc == 0
    mag = im.load_image(mag_p)
    assert mag.shape == (3, 128, 2 * 128 + 4)


def test_cli_pipeline_flags(tmp_path, rng):
    from fsr_tpu import cli

    src = rng.uniform(0, 1, (3, 32, 48)).astype(np.float32)
    inp = str(tmp_path / "in.png")
    outp = str(tmp_path / "out.png")
    im.save_image(inp, src)
    rc = cli.main([inp, outp, "--scale", "2.0", "--impl", "xla",
                   "--grain", "0.2", "--dither-bits", "8", "--frame", "3"])
    assert rc == 0
    out = im.load_image(outp)
    assert out.shape == (3, 64, 96)
    assert np.isfinite(out).all() and out.min() >= 0.0 and out.max() <= 1.0
    rc = cli.main([inp, str(tmp_path / "hdr.png"), "--scale", "2.0",
                   "--impl", "xla", "--hdr"])
    assert rc == 0


def test_cli_config_merge(tmp_path, rng):
    from fsr_tpu import cli

    src = rng.uniform(0, 1, (3, 20, 20)).astype(np.float32)
    inp = str(tmp_path / "in.png")
    outp = str(tmp_path / "out.png")
    cfg = str(tmp_path / "cfg.json")
    im.save_image(inp, src)
    with open(cfg, "w") as f:
        json.dump({"scale": 2.0, "no_rcas": True, "impl": "xla"}, f)
    rc = cli.main([inp, outp, "--config", cfg])
    assert rc == 0
    assert im.load_image(outp).shape == (3, 40, 40)


def test_cli_modes(tmp_path, rng):
    from fsr_tpu import cli

    src = rng.uniform(0, 1, (3, 16, 16)).astype(np.float32)
    inp = str(tmp_path / "in.png")
    im.save_image(inp, src)
    for mode, shape in [("bilinear", (3, 32, 32)), ("native", (3, 16, 16))]:
        outp = str(tmp_path / f"{mode}.png")
        assert cli.main([inp, outp, "--scale", "2.0", "--mode", mode]) == 0
        assert im.load_image(outp).shape == shape


def test_pipeline_class(rng):
    import fsr_tpu

    pipe = fsr_tpu.UpscalePipeline(
        (64, 96), hdr_srtm=True, grain_amount=0.2, dither_bits=8, impl="xla"
    )
    hdr = jnp.asarray(rng.uniform(0, 10.0, (3, 32, 48)).astype(np.float32))
    grain = jnp.asarray(rng.uniform(-0.5, 0.5, (3, 64, 96)).astype(np.float32))
    out = np.asarray(pipe(hdr, grain=grain, frame=1))
    assert out.shape == (3, 64, 96)
    lat = np.round(out * 255.0) / 255.0
    np.testing.assert_allclose(out, lat, atol=1e-6)


def test_pipeline_hdr_out_roundtrip(rng):
    """hdr_srtm + hdr_out pairs SRTM with SRTM^-1 (ffx_fsr1.h:1039-1041):
    the pipeline returns HDR-range values, and matches doing it by hand."""
    import fsr_tpu
    from fsr_tpu.ops import extras

    pipe = fsr_tpu.UpscalePipeline((64, 96), hdr_srtm=True, hdr_out=True, impl="xla")
    hdr = jnp.asarray(rng.uniform(0, 10.0, (3, 32, 48)).astype(np.float32))
    out = np.asarray(pipe(hdr))
    want = np.asarray(
        extras.srtm_inv(
            fsr_tpu.upscale(extras.srtm(hdr), out_size=(64, 96), impl="xla")
        )
    )
    np.testing.assert_allclose(out, want, atol=1e-6)
    assert out.max() > 1.5  # actually back in HDR range


def test_pipeline_gamma2_out(rng):
    """gamma2_out squares the output (FSR_Pass.hlsl:78-79, Sample.x == 1)."""
    import fsr_tpu

    base = fsr_tpu.UpscalePipeline((64, 96), impl="xla")
    sq = fsr_tpu.UpscalePipeline((64, 96), gamma2_out=True, impl="xla")
    img = jnp.asarray(rng.uniform(0, 1, (3, 32, 48)).astype(np.float32))
    a = np.asarray(base(img))
    b = np.asarray(sq(img))
    np.testing.assert_allclose(b, a * a, atol=1e-6)


def test_pipeline_option_validation():
    import fsr_tpu

    with pytest.raises(ValueError):
        fsr_tpu.UpscalePipeline((64, 96), hdr_out=True)  # needs hdr_srtm
    with pytest.raises(ValueError):
        fsr_tpu.UpscalePipeline((64, 96), hdr_srtm=True, hdr_out=True, gamma2_out=True)
    with pytest.raises(ValueError):
        fsr_tpu.UpscalePipeline((64, 96), hdr_srtm=True, hdr_out=True, dither_bits=8)


def test_blue_noise_texture_dither(rng):
    """Blue-noise generation + user-texture dithering in the pipeline."""
    import fsr_tpu
    from fsr_tpu.ops import extras
    from fsr_tpu.utils import noise

    tex = noise.temporal_blue_noise(pages=2, shape=(32, 32), seed=1)
    assert tex.shape == (2, 32, 32)
    # Complete threshold ramp: every rank appears exactly once per page.
    for p in range(2):
        assert len(np.unique(tex[p])) == 32 * 32
        assert 0.0 <= tex[p].min() and tex[p].max() < 1.0
    assert not np.array_equal(tex[0], tex[1])
    # Blue noise is evenly spread: the darkest 1/16 of each page has no two
    # samples adjacent (white noise almost surely would).
    thr = np.sort(tex[0].ravel())[64]
    pts = tex[0] < thr
    clustered = (pts[:-1, :] & pts[1:, :]).sum() + (pts[:, :-1] & pts[:, 1:]).sum()
    assert clustered == 0

    # Page selection + tiling in texture_dither.
    dit = np.asarray(extras.texture_dither((48, 70), 3, jnp.asarray(tex)))
    assert dit.shape == (48, 70)
    np.testing.assert_array_equal(dit[:32, :32], tex[1])   # frame 3 % 2 pages
    np.testing.assert_array_equal(dit[32:, :32], tex[1][:16])

    # End to end through the pipeline.
    pipe = fsr_tpu.UpscalePipeline(
        (64, 96), dither_bits=8, dither_texture=tex, impl="xla"
    )
    img = jnp.asarray(rng.uniform(0, 1, (3, 32, 48)).astype(np.float32))
    out = np.asarray(pipe(img, frame=5))
    lat = np.round(out * 255.0) / 255.0
    np.testing.assert_allclose(out, lat, atol=1e-6)


def test_sharpen_border_zero(rng):
    """border='zero' reproduces the sample's out-of-bounds imageLoad zeros."""
    import fsr_tpu
    from fsr_tpu.core.constants import RcasConstants
    from fsr_tpu.ops import rcas as rcas_ops

    img = jnp.asarray(rng.uniform(0.2, 1, (3, 24, 36)).astype(np.float32))
    out = np.asarray(fsr_tpu.sharpen(img, border="zero", impl="xla"))
    want = np.asarray(rcas_ops.rcas(img, RcasConstants(0.25), border="zero"))
    np.testing.assert_allclose(out, want, atol=1e-6)
    # and it differs from clamp exactly on the border ring
    clamp = np.asarray(fsr_tpu.sharpen(img, impl="xla"))
    assert not np.allclose(out[:, 0, :], clamp[:, 0, :])
    np.testing.assert_allclose(out[:, 2:-2, 2:-2], clamp[:, 2:-2, 2:-2], atol=1e-6)


def test_sample_app_benchmark_flythrough(tmp_path):
    """FSRSample-analog app: keyframed benchmark loop writes per-frame CSV
    rows and keyframe screenshots (FSRSample.json BenchmarkSettings)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    import sample_app

    csv_p = str(tmp_path / "bench.csv")
    shot = str(tmp_path / "shot")
    cfg = sample_app.merge_config(
        sample_app.DEFAULT_CONFIG,
        {
            "globals": {"width": 128, "height": 64, "preset": "performance"},
            "scenes": [{"BenchmarkSettings": {
                "fps": 2, "warmUpFrames": 1,
                "resultsFilename": csv_p, "screenShotName": shot,
            }}],
        },
    )
    # list merge keeps the base scene's keyframes
    assert "keyFrames" in cfg["scenes"][0]["BenchmarkSettings"]
    app = sample_app.SampleApp(cfg)
    assert app.render_hw == (32, 64)  # display / 2.0, truncated
    rows = sample_app.run_benchmark(app, cfg["scenes"][0]["BenchmarkSettings"])
    assert len(rows) == 5  # 2 s * 2 fps + 1
    lines = open(csv_p).read().strip().splitlines()
    assert lines[0] == "frame,time,ms,screenshot" and len(lines) == 6
    assert os.path.exists(shot + "_0.png") and os.path.exists(shot + "_1.png")
    # screenshots land on the screenShot-flagged keyframes (t=0 and t=2)
    assert rows[0]["screenshot"] == "shot_0.png"
    assert rows[-1]["screenshot"] == "shot_1.png"


def test_sample_app_camera_interp():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    import sample_app

    kfs = [
        {"time": 0.0, "cy": 0.0, "cx": 0.0, "zoom": 1.0},
        {"time": 2.0, "cy": 1.0, "cx": 2.0, "zoom": 3.0},
    ]
    mid = sample_app.camera_at(kfs, 1.0)
    assert abs(mid["cy"] - 0.5) < 1e-9 and abs(mid["zoom"] - 2.0) < 1e-9
    assert sample_app.camera_at(kfs, -1.0)["zoom"] == 1.0
    assert sample_app.camera_at(kfs, 9.0)["zoom"] == 3.0


def test_sample_app_hdr_mode_chain(tmp_path):
    """HDR globals: tonemap+TEPD10 feeds FSR's gamma2 (Sample.x==1) chain;
    output is linear and in range."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    import sample_app

    cfg = sample_app.merge_config(
        sample_app.DEFAULT_CONFIG,
        {"globals": {"width": 128, "height": 64, "hdr": True,
                     "preset": "quality"}},
    )
    app = sample_app.SampleApp(cfg)
    cam = {"cy": 0.5, "cx": 0.5, "zoom": 1.0}
    out = np.asarray(app.render_frame(cam, 0.0, 3), np.float32)
    assert out.shape == (3, 64, 128)
    assert np.isfinite(out).all() and out.min() >= 0.0 and out.max() <= 1.0
