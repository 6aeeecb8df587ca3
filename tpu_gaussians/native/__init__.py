"""ctypes bindings to the native CPU rasterizer (native/src/rasterizer.cpp).

Builds the shared library on demand with cmake+ninja (or direct g++
fallback) and exposes `render_native(...)`, the forward-only CPU render
path — the framework's analog of the reference's
gaussian_renderer.render_gaussians pybind module (bindings.cpp:27-101),
with the same input contract (float32, (N,3)/(N,)/(4,4)) enforced here in
Python and an RGBA8 (H,W,4) numpy result.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB: Optional[ctypes.CDLL] = None


class NativeBuildError(RuntimeError):
    pass


def _lib_path() -> Path:
    return _NATIVE_DIR / "build" / "libgs_rasterizer.so"


def build(force: bool = False) -> Path:
    """Build the native library (cmake+ninja, g++ fallback)."""
    lib = _lib_path()
    if lib.exists() and not force:
        return lib
    build_dir = _NATIVE_DIR / "build"
    build_dir.mkdir(exist_ok=True)
    try:
        subprocess.run(
            ["cmake", "-S", str(_NATIVE_DIR), "-B", str(build_dir), "-G",
             "Ninja"],
            check=True, capture_output=True,
        )
        subprocess.run(
            ["cmake", "--build", str(build_dir)],
            check=True, capture_output=True,
        )
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        # Direct g++ fallback for the shared lib only.
        try:
            subprocess.run(
                ["g++", "-O3", "-ffast-math", "-std=c++17", "-shared", "-fPIC",
                 "-I", str(_NATIVE_DIR / "include"),
                 str(_NATIVE_DIR / "src" / "rasterizer.cpp"),
                 "-o", str(lib)],
                check=True, capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError) as e2:
            detail = getattr(e2, "stderr", b"") or b""
            raise NativeBuildError(
                f"native build failed: {detail.decode(errors='replace')}"
            ) from e2
    if not lib.exists():
        raise NativeBuildError(f"build produced no library at {lib}")
    return lib


def _load() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(str(build()))
        fp = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_ubyte)
        lib.gs_render_rgba8.restype = ctypes.c_int
        lib.gs_render_rgba8.argtypes = [fp, fp, fp, fp, ctypes.c_int,
                                        ctypes.c_int, ctypes.c_int, fp, fp,
                                        fp, ctypes.c_int, u8p]
        lib.gs_render_f32.restype = ctypes.c_int
        lib.gs_render_f32.argtypes = [fp, fp, fp, fp, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_int, fp, fp, fp,
                                      ctypes.c_int, fp, fp]
        _LIB = lib
    return _LIB


def _as_f32(name: str, a, shape) -> np.ndarray:
    a = np.ascontiguousarray(a, dtype=np.float32)
    if a.shape != shape:
        raise ValueError(f"{name} must have shape {shape}, got {a.shape}")
    return a


def render_native(
    means, scales, colors, opacities, view, proj,
    width: int = 800, height: int = 600,
    background=(0.0, 0.0, 0.0), depth_sort: bool = True,
    as_float: bool = False,
):
    """CPU forward render -> (H,W,4) uint8 RGBA, or (rgb, alpha) float32
    when as_float. colors must be pre-evaluated RGB (use ops.sh.eval_colors
    for SH models)."""
    lib = _load()
    means = np.ascontiguousarray(means, dtype=np.float32)
    if means.ndim != 2 or means.shape[1] != 3:
        raise ValueError("means must be (N,3)")
    n = means.shape[0]
    scales = _as_f32("scales", scales, (n, 3))
    colors = _as_f32("colors", colors, (n, 3))
    opacities = np.ascontiguousarray(opacities, dtype=np.float32).reshape(-1)
    if opacities.shape != (n,):
        raise ValueError(f"opacities must be ({n},)")
    view = _as_f32("view", view, (4, 4))
    proj = _as_f32("proj", proj, (4, 4))
    bg = np.ascontiguousarray(background, dtype=np.float32).reshape(3)

    fp = ctypes.POINTER(ctypes.c_float)
    ptr = lambda a: a.ctypes.data_as(fp)
    mode = 1 if depth_sort else 0

    if as_float:
        rgb = np.empty((height, width, 3), np.float32)
        alpha = np.empty((height, width), np.float32)
        rc = lib.gs_render_f32(
            ptr(means), ptr(scales), ptr(colors), ptr(opacities), n,
            width, height, ptr(view), ptr(proj), ptr(bg), mode,
            ptr(rgb), ptr(alpha),
        )
        if rc != 0:
            raise RuntimeError(f"gs_render_f32 failed with code {rc}")
        return rgb, alpha

    out = np.empty((height, width, 4), np.uint8)
    rc = lib.gs_render_rgba8(
        ptr(means), ptr(scales), ptr(colors), ptr(opacities), n,
        width, height, ptr(view), ptr(proj), ptr(bg), mode,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    if rc != 0:
        raise RuntimeError(f"gs_render_rgba8 failed with code {rc}")
    return out
