"""ctypes loader for the native preprocessing library.

Compiles ``triptych.cpp`` with g++ on first use (cached next to the
source); every entry point has a pure-numpy fallback in ``data.pipeline``,
so environments without a toolchain lose only speed, not capability.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "triptych.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "libtriptych.so")
_lock = threading.Lock()
_lib = None
_load_failed = False


def _build() -> bool:
    # compile to a temp path and rename into place: writing the final .so
    # directly would leave a corrupt-but-newer-than-source file after an
    # interrupted (or concurrent) build, permanently disabling the native
    # path until someone deletes it by hand. rename() is atomic on POSIX.
    tmp_path = f"{_LIB_PATH}.build.{os.getpid()}"
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           _SRC, "-o", tmp_path]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp_path, _LIB_PATH)
        return True
    except Exception:
        try:
            os.unlink(tmp_path)
        except OSError:
            pass
        return False


def get_lib():
    """Returns the loaded ctypes library, or None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)
        ):
            if not _build():
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _load_failed = True
            return None
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.triptych_preprocess.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p, f32p,
        ]
        lib.triptych_preprocess_batch.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, f32p, f32p, ctypes.c_int,
        ]
        lib.inference_preprocess.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def triptych_preprocess(img: np.ndarray, out_size: int):
    """uint8 (H, W[, C]) triptych -> (glared, gt) float32 (out, out)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    if h < 1 or w < 3:
        # a triptych third of width 0 would make the C++ resize read out of
        # bounds; the numpy fallback raises cleanly for the same input
        raise ValueError(f"triptych too small to split: {h}x{w}")
    c = img.shape[2] if img.ndim == 3 else 1
    glared = np.empty((out_size, out_size), np.float32)
    gt = np.empty((out_size, out_size), np.float32)
    lib.triptych_preprocess(img, h, w, c, out_size, glared, gt)
    return glared, gt


def triptych_preprocess_batch(imgs: np.ndarray, out_size: int,
                              n_threads: int | None = None):
    """uint8 (N, H, W[, C]) -> (glared, gt) float32 (N, out, out).

    ``n_threads`` defaults to (and is capped at) the visible CPU count —
    oversubscription under a cgroup CPU quota triggers heavy throttling.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    # sched_getaffinity respects container CPU pinning; os.cpu_count() is
    # the whole host and would spawn exactly the oversubscription this cap
    # exists to prevent
    try:
        cpus = len(os.sched_getaffinity(0)) or 1
    except AttributeError:  # non-Linux
        cpus = os.cpu_count() or 1
    n_threads = cpus if n_threads is None else min(n_threads, cpus)
    imgs = np.ascontiguousarray(imgs, np.uint8)
    if imgs.shape[1] < 1 or imgs.shape[2] < 3:
        raise ValueError(
            f"triptychs too small to split: {imgs.shape[1]}x{imgs.shape[2]}")
    n, h, w = imgs.shape[:3]
    c = imgs.shape[3] if imgs.ndim == 4 else 1
    glared = np.empty((n, out_size, out_size), np.float32)
    gt = np.empty((n, out_size, out_size), np.float32)
    lib.triptych_preprocess_batch(imgs, n, h, w, c, out_size, glared, gt, n_threads)
    return glared, gt


def inference_preprocess(img: np.ndarray, out_size: int) -> np.ndarray:
    """uint8 (H, W[, C]) -> float32 (out, out) grayscale in [0, 1]."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    c = img.shape[2] if img.ndim == 3 else 1
    out = np.empty((out_size, out_size), np.float32)
    lib.inference_preprocess(img, h, w, c, out_size, out)
    return out
