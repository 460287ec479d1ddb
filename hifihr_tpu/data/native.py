"""ctypes bindings for the native image pipeline (native/imgproc.cpp).

Auto-builds the shared library on first use (g++ + libjpeg, both in the
toolchain); falls back cleanly when unavailable so the pure-numpy path in
hifihr_tpu.geometry.crops keeps everything runnable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libhifihr_imgproc.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                           check=True, capture_output=True)
        except Exception:
            _lib = False
            return False
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _lib = False
        return False
    lib.decode_jpeg.restype = ctypes.c_int
    lib.decode_jpeg.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.warp_affine_batch.restype = None
    lib.warp_affine_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.warp_affine_batch_u8.restype = None
    lib.warp_affine_batch_u8.argtypes = lib.warp_affine_batch.argtypes
    _lib = lib
    return lib


def available() -> bool:
    return bool(_load())


_decode_buf = __import__("threading").local()


def decode_jpeg(data: bytes, max_h: int = 1080, max_w: int = 1920) -> np.ndarray | None:
    """JPEG bytes -> (H, W, 3) uint8, or None if native decode unavailable."""
    lib = _load()
    if not lib:
        return None
    # thread-local scratch: avoids a fresh max_h*max_w*3 allocation per call
    # (the decoded image is copied out at its true size below)
    out = getattr(_decode_buf, "arr", None)
    if out is None or out.shape[0] < max_h or out.shape[1] < max_w:
        out = np.empty((max_h, max_w, 3), np.uint8)
        _decode_buf.arr = out
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.decode_jpeg(
        data, len(data), out.ctypes.data_as(ctypes.c_void_p), max_h, max_w,
        ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0:
        return None
    # scanlines are written densely (stride = actual width)
    n = h.value * w.value * 3
    return out.ravel()[:n].reshape(h.value, w.value, 3).copy()


def warp_affine_one(
    src: np.ndarray, affine: np.ndarray, out_res: tuple[int, int],
    out_u8: bool = False,
) -> np.ndarray | None:
    """Single-image native warp: (H, W[, C]) uint8 -> (out_h, out_w[, C])
    float32 in [0,1] (or rounded uint8 with `out_u8`, keeping the sample u8
    end-to-end for a 4x smaller H2D transfer).  Used per-sample from the
    loader hot path (the numpy bilinear warp in geometry/crops.py is ~10 ms
    per 224^2 sample; this is ~0.3 ms), with the GIL released for the
    duration of the C call so loader worker threads overlap with device
    transfer."""
    squeeze = src.ndim == 2
    if squeeze:
        src = src[..., None]
    out = warp_affine_batch(
        src[None], np.asarray(affine, np.float32)[None], out_res, n_threads=1,
        out_u8=out_u8,
    )
    if out is None:
        return None
    return out[0, ..., 0] if squeeze else out[0]


def warp_affine_batch(
    srcs: np.ndarray,  # (B, H, W, C) uint8
    affines: np.ndarray,  # (B, 3, 3) float32, src -> dst pixel coords
    out_res: tuple[int, int],
    n_threads: int = 0,
    out_u8: bool = False,
) -> np.ndarray | None:
    """Batched bilinear warp; u8->f32 [0,1] fused (default) or rounded uint8
    output (`out_u8`).  None if the native lib is unavailable."""
    lib = _load()
    if not lib:
        return None
    srcs = np.ascontiguousarray(srcs, np.uint8)
    affines = np.ascontiguousarray(affines, np.float32)
    b, h, w, c = srcs.shape
    dtype = np.uint8 if out_u8 else np.float32
    out = np.empty((b, out_res[0], out_res[1], c), dtype)
    fn = lib.warp_affine_batch_u8 if out_u8 else lib.warp_affine_batch
    fn(
        srcs.ctypes.data_as(ctypes.c_void_p), b, h, w, c,
        affines.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p), out_res[0], out_res[1], n_threads,
    )
    return out
