"""Compile-on-first-use loader for the native packio library."""
from __future__ import annotations

import ctypes
import logging
import os.path as osp
import subprocess
import threading

logger = logging.getLogger("gaiaseg_tpu")

_HERE = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_HERE, "packio.cc")
_SO = osp.join(_HERE, "libpackio.so")
_LOCK = threading.Lock()
_LIB = None


def _compile() -> str:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", _SO, _SRC, "-lpthread"]
    logger.info("building native packio: %s", " ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def load_packio() -> ctypes.CDLL:
    """Returns the loaded library, compiling it if needed. Raises
    RuntimeError when no toolchain is available (callers fall back to the
    pure-python path)."""
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not osp.exists(_SO) or (osp.getmtime(_SO) < osp.getmtime(_SRC)):
            try:
                _compile()
            except (OSError, subprocess.CalledProcessError) as e:
                raise RuntimeError(f"packio build failed: {e}") from e
        lib = ctypes.CDLL(_SO)
        lib.packio_open.restype = ctypes.c_void_p
        lib.packio_open.argtypes = [ctypes.c_char_p]
        lib.packio_close.argtypes = [ctypes.c_void_p]
        lib.packio_len.restype = ctypes.c_int64
        lib.packio_len.argtypes = [ctypes.c_void_p]
        lib.packio_shape.restype = ctypes.c_int
        lib.packio_shape.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_int64)]
        lib.packio_read_batch.restype = ctypes.c_int
        lib.packio_read_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int]
        lib.packio_read_batch_u8.restype = ctypes.c_int
        lib.packio_read_batch_u8.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int]
        lib.packio_create.restype = ctypes.c_void_p
        lib.packio_create.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                      ctypes.c_uint32, ctypes.c_uint32,
                                      ctypes.c_uint32, ctypes.c_uint32]
        lib.packio_append.restype = ctypes.c_int
        lib.packio_append.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_uint8),
                                      ctypes.POINTER(ctypes.c_uint8),
                                      ctypes.c_uint64, ctypes.c_uint64]
        lib.packio_finish.restype = ctypes.c_int
        lib.packio_finish.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return lib
