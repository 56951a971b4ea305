"""Constant setup parity.

The strongest check compiles the reference's own A_CPU path (FsrEasuCon /
FsrRcasCon from /root/reference, read-only) into a tiny C program and
compares the packed uint32 constant blocks bit-for-bit with ours.  Skipped
when the reference tree or a C compiler is unavailable.
"""

import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from fsr_tpu.core.constants import EasuConstants, RcasConstants

CONFIGS = [
    # (vp_w, vp_h, in_w, in_h, out_w, out_h)
    (960, 540, 960, 540, 1920, 1080),
    (1920, 1080, 1920, 1080, 3840, 2160),
    (2560, 1440, 2560, 1440, 3840, 2160),
    (2954, 1662, 2954, 1662, 3840, 2160),
    (2259, 1270, 2259, 1270, 3840, 2160),
    (1280, 720, 1920, 1080, 2560, 1440),  # DRS: viewport smaller than container
]

SHARPNESS = [0.0, 0.25, 0.5, 1.0, 2.0, 0.125]

REF = "/root/reference/ffx-fsr"


def test_easu_constants_values():
    con = EasuConstants.create((1920, 1080), None, (3840, 2160))
    assert con.scale == (np.float32(0.5), np.float32(0.5))
    assert con.offset == (np.float32(-0.25), np.float32(-0.25))
    np.testing.assert_allclose(con.inv_size, (1 / 1920, 1 / 1080), rtol=1e-7)


def test_easu_offset_drs():
    con = EasuConstants.create((1280, 720), (1920, 1080), (2560, 1440), (64, 32))
    ox, oy = con.offset
    assert ox == np.float32(0.5 * 1280 / 2560 - 0.5 + 64)
    assert oy == np.float32(0.5 * 720 / 1440 - 0.5 + 32)


def test_rcas_constants():
    rc = RcasConstants(0.25)
    assert rc.sharpness == np.float32(np.exp2(np.float32(-0.25)))
    u = rc.as_uint4()
    assert u[0] == rc.sharpness.view(np.uint32)
    h = np.uint16(u[1] & 0xFFFF).view(np.float16)
    assert abs(float(h) - float(rc.sharpness)) < 1e-3


@pytest.fixture(scope="module")
def ref_dump():
    """Compile the reference A_CPU constant setup and dump packed uint32s."""
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    cc = shutil.which("cc") or shutil.which("gcc") or shutil.which("g++")
    if cc is None:
        pytest.skip("no C compiler")
    prog = r"""
#include <stdio.h>
#include <stdint.h>
#include <string.h>
#include <math.h>
#define A_CPU 1
#include "ffx_a.h"
#include "ffx_fsr1.h"
int main(int argc, char** argv) {
  float a[6]; AU1 s;
  for (int i = 0; i < 6; i++) sscanf(argv[1 + i], "%f", &a[i]);
  AU1 c0[4], c1[4], c2[4], c3[4], rc[4];
  FsrEasuCon(c0, c1, c2, c3, a[0], a[1], a[2], a[3], a[4], a[5]);
  float sharp; sscanf(argv[7], "%f", &sharp);
  FsrRcasCon(rc, sharp);
  for (int i = 0; i < 4; i++) printf("%u ", c0[i]);
  for (int i = 0; i < 4; i++) printf("%u ", c1[i]);
  for (int i = 0; i < 4; i++) printf("%u ", c2[i]);
  for (int i = 0; i < 4; i++) printf("%u ", c3[i]);
  for (int i = 0; i < 4; i++) printf("%u ", rc[i]);
  return 0;
}
"""
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "dump.c")
        exe = os.path.join(td, "dump")
        with open(src, "w") as f:
            f.write(prog)
        r = subprocess.run(
            [cc, src, "-I", REF, "-O0", "-o", exe, "-lm"],
            capture_output=True, text=True,
        )
        if r.returncode != 0:
            pytest.skip(f"reference A_CPU compile failed: {r.stderr[:400]}")

        def run(cfg, sharp):
            args = [exe] + [str(float(v)) for v in cfg] + [str(float(sharp))]
            out = subprocess.run(args, capture_output=True, text=True, check=True)
            vals = np.array([int(t) for t in out.stdout.split()], dtype=np.uint32)
            return vals[:16].reshape(4, 4), vals[16:20]

        yield run


@pytest.mark.parametrize("cfg", CONFIGS)
def test_easu_con_bit_parity_with_reference(ref_dump, cfg):
    vp_w, vp_h, in_w, in_h, out_w, out_h = cfg
    want, _ = ref_dump(cfg, 0.0)
    got = EasuConstants.create((vp_w, vp_h), (in_w, in_h), (out_w, out_h)).as_uint4()
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("sharp", SHARPNESS)
def test_rcas_con_bit_parity_with_reference(ref_dump, sharp):
    _, want = ref_dump(CONFIGS[0], sharp)
    got = RcasConstants(sharp).as_uint4()
    np.testing.assert_array_equal(got, want)
