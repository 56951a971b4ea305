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
