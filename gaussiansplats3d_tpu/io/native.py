"""ctypes bindings for the native ingest library (native/ingest.cpp).

Builds `libgsingest.so` on first use with g++ (cached next to the source);
every decoder gracefully falls back to the NumPy implementation when the
toolchain or library is unavailable (set ``GS_NATIVE=0`` to force the
fallback).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "ingest.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "build", "libgsingest.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    os.makedirs(os.path.dirname(_LIB), exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-pthread", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def get_lib():
    """The loaded library, or None when native ingest is unavailable."""
    global _lib, _tried
    if os.environ.get("GS_NATIVE", "1") == "0":
        return None
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        i8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.gs_parse_splat.restype = ctypes.c_int
        lib.gs_parse_splat.argtypes = [i8p, ctypes.c_int64, f32p, f32p,
                                       f32p, f32p]
        lib.gs_parse_ply_inria_v1.restype = ctypes.c_int
        lib.gs_parse_ply_inria_v1.argtypes = [
            i8p, ctypes.c_int64, ctypes.c_int64, i32p, i32p,
            ctypes.c_int32, ctypes.c_int32, f32p, f32p, f32p, f32p, f32p]
        lib.gs_parse_ksplat_section.restype = ctypes.c_int
        lib.gs_parse_ksplat_section.argtypes = [
            i8p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, i32p,
            f32p, ctypes.c_float, ctypes.c_int32, ctypes.c_float,
            ctypes.c_float, f32p, f32p, f32p, f32p, f32p]
        _lib = lib
        return _lib


def _u8(buf: bytes | np.ndarray):
    arr = np.frombuffer(buf, np.uint8) if isinstance(buf, (bytes, bytearray)) \
        else np.ascontiguousarray(buf, np.uint8)
    return arr, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32_out(shape):
    a = np.empty(shape, np.float32)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32(arr):
    a = np.ascontiguousarray(arr, np.int32)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def parse_splat_native(data: bytes):
    """Returns (means, scales, quats, colors) or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(data) // 32
    keep, dp = _u8(data)
    means, mp = _f32_out((n, 3))
    scales, sp = _f32_out((n, 3))
    quats, qp = _f32_out((n, 4))
    colors, cp = _f32_out((n, 4))
    rc = lib.gs_parse_splat(dp, len(data), mp, sp, qp, cp)
    if rc < 0:
        return None
    del keep
    return means, scales, quats, colors


def parse_ply_inria_v1_native(vertex_data: bytes, n: int, stride: int,
                              field_offsets, sh_offsets, k_out: int,
                              coeffs_per_channel: int):
    lib = get_lib()
    if lib is None:
        return None
    keep, dp = _u8(vertex_data)
    fo, fop = _i32(field_offsets)
    so, sop = _i32(sh_offsets if len(sh_offsets) else [0])
    means, mp = _f32_out((n, 3))
    scales, sp = _f32_out((n, 3))
    quats, qp = _f32_out((n, 4))
    colors, cp = _f32_out((n, 4))
    sh, shp = _f32_out((n, k_out, 3))
    rc = lib.gs_parse_ply_inria_v1(dp, n, stride, fop, sop, k_out,
                                   coeffs_per_channel, mp, sp, qp, cp, shp)
    if rc < 0:
        return None
    del keep, fo, so
    return means, scales, quats, colors, sh


def parse_ksplat_section_native(rows: bytes, n: int, level: int,
                                sh_degree: int, bucket_of, bucket_centers,
                                scale_factor: float, scale_range: int,
                                min_sh: float, max_sh: float):
    lib = get_lib()
    if lib is None:
        return None
    k_out = {0: 0, 1: 3, 2: 8}[sh_degree]
    keep, dp = _u8(rows)
    bo, bop = _i32(bucket_of if len(bucket_of) else [0])
    bc = np.ascontiguousarray(bucket_centers, np.float32)
    bcp = bc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) if bc.size else \
        ctypes.cast(None, ctypes.POINTER(ctypes.c_float))
    means, mp = _f32_out((n, 3))
    scales, sp = _f32_out((n, 3))
    quats, qp = _f32_out((n, 4))
    colors, cp = _f32_out((n, 4))
    sh, shp = _f32_out((n, k_out, 3))
    rc = lib.gs_parse_ksplat_section(
        dp, n, level, sh_degree, bop, bcp, scale_factor, scale_range,
        min_sh, max_sh, mp, sp, qp, cp, shp)
    if rc < 0:
        return None
    del keep, bo, bc
    return means, scales, quats, colors, sh
