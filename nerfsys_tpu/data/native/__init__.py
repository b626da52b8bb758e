"""Native (C++) host data-loader kernels, built on demand via g++ + ctypes.

The reference leans on a ProcessPoolExecutor to parallelize per-image ray
precompute (/root/reference/adaptive_nerf/data/ram_rays_dataset.py:170-191);
this module replaces that hot loop with a multithreaded C++ kernel
(ray_kernels.cpp) exposed through ctypes. Everything degrades gracefully:
if no compiler is available the callers fall back to the numpy path.
"""
from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_HERE = Path(__file__).parent
_BUILD = _HERE / "_build"
_SRC = _HERE / "ray_kernels.cpp"

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _compile() -> Optional[Path]:
    so = _BUILD / "libray_kernels.so"
    if so.exists() and so.stat().st_mtime >= _SRC.stat().st_mtime:
        return so
    _BUILD.mkdir(exist_ok=True)
    cmd = [
        "g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-pthread",
        str(_SRC), "-o", str(so),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        print(f"[native] build failed ({e}); using numpy fallback")
        return None
    return so


def get_lib():
    """The loaded shared library, or None when unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        so = _compile()
        if so is None:
            _lib_failed = True
            return None
        lib = ctypes.CDLL(str(so))
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.nerfsys_compute_rays.restype = ctypes.c_longlong
        lib.nerfsys_compute_rays.argtypes = [
            ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, f32p, f32p, ctypes.c_float, ctypes.c_float,
            f32p, u8p, ctypes.c_int,
        ]
        lib.nerfsys_compact_rays.restype = ctypes.c_longlong
        lib.nerfsys_compact_rays.argtypes = [
            f32p, u8p, u8p, u8p, ctypes.c_longlong, f32p, f32p,
        ]
        i64p = ctypes.POINTER(ctypes.c_longlong)
        lib.nerfsys_route_rays.restype = None
        lib.nerfsys_route_rays.argtypes = [
            f32p, ctypes.c_longlong, f32p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, ctypes.c_int, i64p, ctypes.c_int,
        ]
        lib.nerfsys_dda_route.restype = None
        lib.nerfsys_dda_route.argtypes = [
            f32p, ctypes.c_longlong, f32p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, i64p, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8p(a: Optional[np.ndarray]):
    if a is None:
        return ctypes.POINTER(ctypes.c_uint8)()
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def compute_rays_native(
    H: int,
    W: int,
    intrinsics,  # (fx, fy, cx, cy)
    c2w: np.ndarray,  # (3, 4)
    aabb: Optional[np.ndarray] = None,  # (2, 3)
    near: Optional[float] = None,
    far: Optional[float] = None,
    center_pixels: bool = True,
    n_threads: int = 0,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """-> (rays (H*W, 8) float32, valid (H*W,) bool), or None w/o the lib.

    Semantics identical to np_ray_directions + np_get_rays + np_clamp_rays
    (invalid rays carry near/far = +inf).
    """
    lib = get_lib()
    if lib is None:
        return None
    fx, fy, cx, cy = [float(v) for v in intrinsics[:4]]
    c2w = np.ascontiguousarray(c2w, dtype=np.float32)
    aabb_arr = (
        np.ascontiguousarray(aabb, dtype=np.float32).reshape(6)
        if aabb is not None
        else None
    )
    rays = np.empty((H * W, 8), np.float32)
    valid = np.empty((H * W,), np.uint8)
    lib.nerfsys_compute_rays(
        H, W, fx, fy, cx, cy, 1 if center_pixels else 0,
        _f32p(c2w), _f32p(aabb_arr) if aabb_arr is not None else
        ctypes.POINTER(ctypes.c_float)(),
        -1.0 if near is None else float(near),
        -1.0 if far is None else float(far),
        _f32p(rays), _u8p(valid), int(n_threads),
    )
    return rays, valid.astype(bool)


def compact_rays_native(
    rays: np.ndarray,  # (N, 8) float32
    valid: np.ndarray,  # (N,) bool/uint8
    keep: Optional[np.ndarray],  # (N,) bool/uint8 or None
    rgb_u8: np.ndarray,  # (N, 3) uint8
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """-> (rays (M, 8), rgb (M, 3) float in [0,1]) rows passing valid&keep."""
    lib = get_lib()
    if lib is None:
        return None
    n = rays.shape[0]
    rays = np.ascontiguousarray(rays, np.float32)
    valid8 = np.ascontiguousarray(valid, np.uint8)
    keep8 = np.ascontiguousarray(keep, np.uint8) if keep is not None else None
    rgb_u8 = np.ascontiguousarray(rgb_u8, np.uint8)
    out_rays = np.empty((n, 8), np.float32)
    out_rgb = np.empty((n, 3), np.float32)
    m = lib.nerfsys_compact_rays(
        _f32p(rays), _u8p(valid8), _u8p(keep8), _u8p(rgb_u8), n,
        _f32p(out_rays), _f32p(out_rgb),
    )
    return out_rays[:m].copy(), out_rgb[:m].copy()


def route_rays_native(
    rays: np.ndarray,  # (N, 8) float32
    aabb: np.ndarray,  # (2, 3)
    cells: Tuple[int, int, int],
    ts: np.ndarray,  # (P,) sample fractions
    n_threads: int = 0,
) -> Optional[np.ndarray]:
    """Max-overlap micro-cell per ray, (N,) int64 with -1 = miss."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "nerfsys_route_rays"):
        return None
    rays = np.ascontiguousarray(rays, np.float32)
    aabb6 = np.ascontiguousarray(aabb, np.float32).reshape(6)
    ts = np.ascontiguousarray(ts, np.float32)
    out = np.empty((rays.shape[0],), np.int64)
    lib.nerfsys_route_rays(
        _f32p(rays), rays.shape[0], _f32p(aabb6),
        int(cells[0]), int(cells[1]), int(cells[2]),
        _f32p(ts), ts.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        int(n_threads),
    )
    return out


def dda_route_native(
    rays: np.ndarray,  # (N, 8) float32
    aabb: np.ndarray,  # (2, 3) region box
    cells: Tuple[int, int, int],
    max_steps: int = 64,
    n_threads: int = 0,
) -> Optional[np.ndarray]:
    """Exact DDA max-overlap cell per ray (reference TaskDataset routing,
    task_dataset.py:242-351 + weak-overlap filter :589-599); (N,) int64,
    -1 = miss/filtered. None when the native lib is unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "nerfsys_dda_route"):
        return None
    rays = np.ascontiguousarray(rays, np.float32)
    aabb6 = np.ascontiguousarray(aabb, np.float32).reshape(6)
    out = np.empty((rays.shape[0],), np.int64)
    lib.nerfsys_dda_route(
        _f32p(rays), rays.shape[0], _f32p(aabb6),
        int(cells[0]), int(cells[1]), int(cells[2]), int(max_steps),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        int(n_threads),
    )
    return out
