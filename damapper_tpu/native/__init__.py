"""Native (C++) components, built on demand with the system toolchain."""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

_DIR = pathlib.Path(__file__).resolve().parent


def _build(name: str) -> pathlib.Path:
    src = _DIR / f"{name}.cpp"
    so = _DIR / f"lib{name}.so"
    if so.exists() and so.stat().st_mtime > src.stat().st_mtime:
        return so
    tmp = so.with_suffix(".so.tmp%d" % os.getpid())
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC",
         "-o", str(tmp), str(src)],
        check=True, capture_output=True)
    os.replace(tmp, so)
    return so


_chain_lib = None


def chain_lib():
    """ctypes handle to the chain sweep library (lazy build)."""
    global _chain_lib
    if _chain_lib is None:
        lib = ctypes.CDLL(str(_build("chain_sweep")))
        lib.chain_sweep.restype = ctypes.c_void_p
        lib.chain_sweep.argtypes = [
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
        lib.result_meta_len.restype = ctypes.c_int64
        lib.result_meta_len.argtypes = [ctypes.c_void_p]
        lib.result_meta.restype = ctypes.POINTER(ctypes.c_int32)
        lib.result_meta.argtypes = [ctypes.c_void_p]
        lib.result_jumps_len.restype = ctypes.c_int64
        lib.result_jumps_len.argtypes = [ctypes.c_void_p]
        lib.result_jumps.restype = ctypes.POINTER(ctypes.c_int32)
        lib.result_jumps.argtypes = [ctypes.c_void_p]
        lib.result_free.restype = None
        lib.result_free.argtypes = [ctypes.c_void_p]
        _chain_lib = lib
    return _chain_lib
