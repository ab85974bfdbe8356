"""ctypes bridge to the native C++ BN254 kernels (native/bn254.cpp).

Builds the shared library on first use (g++ is in the base image). Used as
the host-side accelerator for Groth16 setup's fixed-base scalar muls and as
a cross-check oracle for the TPU MSM. Falls back to the pure-Python path if
the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO, "native", "bn254.cpp")
_LIB = os.path.join(_REPO, "native", "libbn254.so")

_lib = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
        check=True, capture_output=True,
    )


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        _build()
    lib = ctypes.CDLL(_LIB)
    for name in ("g1_fixed_base_mul_batch", "g2_fixed_base_mul_batch",
                 "g1_mul_batch"):
        getattr(lib, name).argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint64),
        ] if name != "g1_mul_batch" else [
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_size_t, ctypes.POINTER(ctypes.c_uint64),
        ]
    for name in ("g1_msm", "g2_msm", "g2_mul_batch"):
        getattr(lib, name).argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_size_t, ctypes.POINTER(ctypes.c_uint64),
        ]
    _lib = lib
    return lib


def _scalars_to_u64(ks) -> np.ndarray:
    out = np.zeros((len(ks), 4), dtype=np.uint64)
    for i, k in enumerate(ks):
        k = int(k)
        for j in range(4):
            out[i, j] = (k >> (64 * j)) & 0xFFFFFFFFFFFFFFFF
    return out


def _aff_to_u64(pts) -> np.ndarray:
    out = np.zeros((len(pts), 8), dtype=np.uint64)
    for i, p in enumerate(pts):
        if p is None:
            continue
        x, y = int(p[0]), int(p[1])
        for j in range(4):
            out[i, j] = (x >> (64 * j)) & 0xFFFFFFFFFFFFFFFF
            out[i, 4 + j] = (y >> (64 * j)) & 0xFFFFFFFFFFFFFFFF
    return out


def _u64_to_aff(arr) -> list:
    pts = []
    for row in arr:
        x = sum(int(row[j]) << (64 * j) for j in range(4))
        y = sum(int(row[4 + j]) << (64 * j) for j in range(4))
        pts.append(None if x == 0 and y == 0 else (x, y))
    return pts


def _u64_to_g2(arr) -> list:
    pts = []
    for row in arr:
        c = [sum(int(row[4 * k + j]) << (64 * j) for j in range(4)) for k in range(4)]
        if all(v == 0 for v in c):
            pts.append(None)
        else:
            pts.append(((c[0], c[1]), (c[2], c[3])))
    return pts


def g1_gen_mul_batch(ks) -> list:
    """[k_i]G1 for many scalars (fixed-base windowed, native)."""
    lib = get_lib()
    sc = _scalars_to_u64(ks)
    out = np.zeros((len(ks), 8), dtype=np.uint64)
    lib.g1_fixed_base_mul_batch(
        sc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), len(ks),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return _u64_to_aff(out)


def g2_gen_mul_batch(ks) -> list:
    lib = get_lib()
    sc = _scalars_to_u64(ks)
    out = np.zeros((len(ks), 16), dtype=np.uint64)
    lib.g2_fixed_base_mul_batch(
        sc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), len(ks),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return _u64_to_g2(out)


def g1_mul_batch(ks, points) -> list:
    """[k_i]P_i elementwise (native)."""
    lib = get_lib()
    sc = _scalars_to_u64(ks)
    pts = _aff_to_u64(points)
    out = np.zeros((len(ks), 8), dtype=np.uint64)
    lib.g1_mul_batch(
        sc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), len(ks),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return _u64_to_aff(out)


def g1_msm(ks, points):
    """Single Pippenger MSM (native)."""
    lib = get_lib()
    sc = _scalars_to_u64(ks)
    pts = _aff_to_u64(points)
    out = np.zeros((8,), dtype=np.uint64)
    lib.g1_msm(
        sc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), len(ks),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return _u64_to_aff(out[None])[0]


def _g2_to_u64(pts) -> np.ndarray:
    out = np.zeros((len(pts), 16), dtype=np.uint64)
    for i, p in enumerate(pts):
        if p is None:
            continue
        (x0, x1), (y0, y1) = p
        for k, v in enumerate((x0, x1, y0, y1)):
            v = int(v)
            for j in range(4):
                out[i, 4 * k + j] = (v >> (64 * j)) & 0xFFFFFFFFFFFFFFFF
    return out


def g2_mul_batch(ks, points) -> list:
    lib = get_lib()
    sc = _scalars_to_u64(ks)
    pts = _g2_to_u64(points)
    out = np.zeros((len(ks), 16), dtype=np.uint64)
    lib.g2_mul_batch(
        sc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), len(ks),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return _u64_to_g2(out)


def g2_msm(ks, points):
    lib = get_lib()
    sc = _scalars_to_u64(ks)
    pts = _g2_to_u64(points)
    out = np.zeros((16,), dtype=np.uint64)
    lib.g2_msm(
        sc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), len(ks),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return _u64_to_g2(out[None])[0]
