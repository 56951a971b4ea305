"""Objective quality study: FSR vs bilinear on a downscale->upscale loop.

For each test image: box-downsample by 2x, upscale back with {bilinear,
EASU, EASU+RCAS}, report PSNR against the original.  This mirrors how
spatial upscalers are evaluated (the reference's claims are visual; this
adds numbers).  Writes/refreshes the table in docs/QUALITY.md when run with
--write.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_images(hw=(512, 512)):
    h, w = hw
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    imgs = {}
    # Zone-plate-ish radial chirp: the classic aliasing/ringing stressor.
    r2 = ((x - w / 2) ** 2 + (y - h / 2) ** 2) / (w * h)
    zone = 0.5 + 0.5 * np.cos(r2 * 4000.0)
    imgs["zoneplate"] = np.stack([zone, zone, zone])
    # Text-like structure: thin strokes and hard edges.
    strokes = (
        ((x.astype(np.int32) // 7 + y.astype(np.int32) // 13) % 5 == 0)
        | ((np.sin(x / 2.3) * np.cos(y / 3.1)) > 0.85)
    ).astype(np.float32)
    imgs["strokes"] = np.stack([strokes, strokes * 0.8 + 0.1, 1.0 - strokes * 0.7])
    # Natural-ish: smooth shading + oriented edges + mild noise.
    rng = np.random.default_rng(0)
    base = 0.5 + 0.35 * np.sin(x / 37.0 + np.sin(y / 23.0) * 2.0)
    edges = np.clip(np.sign(np.sin((x + 2 * y) / 9.0)) * 0.18 + base, 0, 1)
    nat = np.clip(edges + rng.normal(0, 0.01, (h, w)), 0, 1).astype(np.float32)
    imgs["natural"] = np.stack([nat, np.clip(nat * 0.9 + 0.05, 0, 1), np.clip(nat ** 1.2, 0, 1)])
    return {k: v.astype(np.float32) for k, v in imgs.items()}


def box_down2(img):
    c, h, w = img.shape
    return img.reshape(c, h // 2, 2, w // 2, 2).mean(axis=(2, 4))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true", help="update docs/QUALITY.md")
    args = ap.parse_args()

    import jax.numpy as jnp

    import fsr_tpu
    from fsr_tpu.core.constants import EasuConstants
    from fsr_tpu.ops import easu as easu_ops
    from fsr_tpu.utils.image import psnr

    rows = []
    for name, ref_img in test_images().items():
        low = box_down2(ref_img)
        hw = ref_img.shape[-2:]
        con = EasuConstants.create((low.shape[-1], low.shape[-2]), None, (hw[1], hw[0]))
        bil = np.asarray(easu_ops.bilinear(jnp.asarray(low), hw, con))
        easu = np.asarray(
            fsr_tpu.upscale(jnp.asarray(low), out_size=hw, apply_rcas=False)
        )
        fsr = np.asarray(
            fsr_tpu.upscale(jnp.asarray(low), out_size=hw, sharpness=0.25)
        )
        rows.append(
            (name, psnr(bil, ref_img), psnr(easu, ref_img), psnr(fsr, ref_img))
        )
        print(f"{name:10s}: bilinear {rows[-1][1]:6.2f} dB | EASU {rows[-1][2]:6.2f} dB "
              f"| EASU+RCAS {rows[-1][3]:6.2f} dB")

    if args.write:
        table = ["| image | bilinear | EASU | EASU+RCAS |", "|---|---|---|---|"]
        for name, b, e, f in rows:
            table.append(f"| {name} | {b:.2f} dB | {e:.2f} dB | {f:.2f} dB |")
        body = (
            "# Quality study\n\n"
            "PSNR of a 2x downscale->upscale loop against the original\n"
            "(tools/quality_study.py; box downsample, f32 path).  EASU's\n"
            "edge-adaptive kernel beats bilinear on structured content; RCAS\n"
            "trades a little PSNR for perceived sharpness by design (it\n"
            "amplifies contrast rather than reconstructing signal).\n\n"
            + "\n".join(table) + "\n"
        )
        out = os.path.join(os.path.dirname(__file__), "..", "docs", "QUALITY.md")
        with open(out, "w") as fobj:
            fobj.write(body)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
