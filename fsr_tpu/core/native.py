"""ctypes binding to the native host layer (csrc/libfsr_host.so).

The reference's constant setup is native C compiled into the host app
(A_CPU path); this module exposes our equivalent C implementation for
C/C++ embedders and cross-checks.  Builds on demand via make when the
shared library is missing; falls back to None when no toolchain exists
(the pure-Python constants in fsr_tpu.core.constants are always available
and bit-identical).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.abspath(os.path.join(_CSRC, "libfsr_host.so"))
    if not os.path.exists(path):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_CSRC)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    u32p = ctypes.POINTER(ctypes.c_uint32)
    f = ctypes.c_float
    lib.fsr_easu_con.argtypes = [u32p] + [f] * 6
    lib.fsr_easu_con.restype = None
    lib.fsr_easu_con_offset.argtypes = [u32p] + [f] * 8
    lib.fsr_easu_con_offset.restype = None
    lib.fsr_rcas_con.argtypes = [u32p, f]
    lib.fsr_rcas_con.restype = None
    lib.fsr_f32_to_f16_bits.argtypes = [f]
    lib.fsr_f32_to_f16_bits.restype = ctypes.c_uint16
    _LIB = lib
    return lib


def available() -> bool:
    return load() is not None


def easu_con(
    viewport: Tuple[float, float],
    input_size: Tuple[float, float],
    output_size: Tuple[float, float],
    input_offset: Tuple[float, float] = (0.0, 0.0),
) -> np.ndarray:
    """Native con0..con3 block (4x4 uint32), reference bit layout."""
    lib = load()
    if lib is None:
        raise RuntimeError("native host library unavailable")
    con = (ctypes.c_uint32 * 16)()
    if input_offset == (0.0, 0.0):
        lib.fsr_easu_con(con, viewport[0], viewport[1],
                         input_size[0], input_size[1],
                         output_size[0], output_size[1])
    else:
        lib.fsr_easu_con_offset(con, viewport[0], viewport[1],
                                input_size[0], input_size[1],
                                output_size[0], output_size[1],
                                input_offset[0], input_offset[1])
    return np.ctypeslib.as_array(con).reshape(4, 4).copy()


def rcas_con(sharpness_stops: float) -> np.ndarray:
    lib = load()
    if lib is None:
        raise RuntimeError("native host library unavailable")
    con = (ctypes.c_uint32 * 4)()
    lib.fsr_rcas_con(con, sharpness_stops)
    return np.ctypeslib.as_array(con).copy()


def f32_to_f16_bits(x: float) -> int:
    lib = load()
    if lib is None:
        raise RuntimeError("native host library unavailable")
    return int(lib.fsr_f32_to_f16_bits(x))
