"""Native (C++) runtime components, loaded via ctypes.

Currently: a multithreaded zlib PNG batch writer for the bulk FID image dump
(the host-side bottleneck of the 50k-images-in-10-minutes budget — PIL
single-threaded encoding costs minutes).  Builds on first use with g++;
falls back to PIL transparently if the toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "png_writer.cc")
_LIB = os.path.join(_HERE, "libpngwriter.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-pthread", _SRC, "-lz", "-o", _LIB],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_LIB)
            lib.write_png_batch.restype = ctypes.c_int
            lib.write_png_batch.argtypes = [
                ctypes.POINTER(ctypes.c_ubyte),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_char_p,
                ctypes.c_long,
                ctypes.c_int,
            ]
            _lib = lib
        except Exception:
            _build_failed = True
        return _lib


def native_available() -> bool:
    return _load() is not None


def write_png_batch(images01: np.ndarray, out_dir: str, start_index: int, threads: int = 0) -> int:
    """Write [N, H, W, 3] float [0,1] images as <out_dir>/<start_index+i>.png.

    Returns the number of images written.  Uses the C++ writer when
    available, PIL otherwise.  uint8 input is taken as already-quantized
    pixels (the device-side fast path, data/transforms.py
    inverse_transform_uint8_fn) and passed through untouched.
    """
    os.makedirs(out_dir, exist_ok=True)
    if images01.dtype == np.uint8:
        imgs = np.ascontiguousarray(images01)
    else:
        imgs = np.ascontiguousarray(
            (np.clip(images01, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
        )
    n, h, w, c = imgs.shape
    assert c == 3, "PNG batch writer expects RGB"
    lib = _load()
    prefix = (out_dir.rstrip("/") + "/").encode()
    if lib is not None:
        failed = lib.write_png_batch(
            imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            n, h, w, prefix, start_index, threads,
        )
        if failed:
            raise IOError(f"{failed} PNG writes failed under {out_dir}")
        return n
    from PIL import Image  # fallback

    for i in range(n):
        Image.fromarray(imgs[i]).save(os.path.join(out_dir, f"{start_index + i}.png"))
    return n
