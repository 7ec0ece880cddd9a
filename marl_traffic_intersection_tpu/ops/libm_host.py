"""Vectorized host-libm trampoline for the CPU exactness paths.

The bit-exact verification modes (EnvConfig.exact_trig / exact_obs) need
the HOST libm's sinf/cosf/tanf values — the functions the compiled C++
oracle calls. On the TPU those are produced by the emulated-f64 replicas
(ops/exact_trig.py); on XLA:CPU the inlined emulation is unusable (a jit
body splits into a handful of fusions regardless of barriers, and a
multi-k-op fusion hits quadratic lazy LLVM codegen — ops/softfloat.py),
and it is also unnecessary: the real libm is right there. This module
lazily builds a tiny C shim (g++, same pattern as native/host.py) exposing
vectorized wrappers around the libm calls and provides numpy-level
callables for ``jax.pure_callback``.

Falls back to per-element ctypes calls into libm.so.6 if g++ is missing.
"""
from __future__ import annotations

import ctypes as ct
import os
import pathlib
import subprocess

import numpy as np

_HERE = pathlib.Path(__file__).resolve().parent
_BUILD = _HERE / "_build"
_SRC = _BUILD / "libm_vec.c"
_LIB_PATH = _BUILD / "libm_vec.so"

_C_SOURCE = """
#include <math.h>
void sinf_vec(const float* in, float* out, long n) {
    for (long i = 0; i < n; ++i) out[i] = sinf(in[i]);
}
void cosf_vec(const float* in, float* out, long n) {
    for (long i = 0; i < n; ++i) out[i] = cosf(in[i]);
}
void tanf_vec(const float* in, float* out, long n) {
    for (long i = 0; i < n; ++i) out[i] = tanf(in[i]);
}
void atan2f_vec(const float* y, const float* x, float* out, long n) {
    for (long i = 0; i < n; ++i) out[i] = atan2f(y[i], x[i]);
}
"""

_LIB = None
_FALLBACK = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    _BUILD.mkdir(parents=True, exist_ok=True)
    stale = (not _LIB_PATH.exists() or not _SRC.exists()
             or _SRC.read_text() != _C_SOURCE)
    if stale:
        # Build to per-pid temp paths and os.rename() into place: rename is
        # atomic, so a concurrent process can never dlopen a half-written .so
        # (parallel pytest / simultaneous eval runs share this cache dir).
        pid = os.getpid()
        tmp_src = _BUILD / f"libm_vec.{pid}.c"
        tmp_lib = _BUILD / f"libm_vec.{pid}.so"
        tmp_src.write_text(_C_SOURCE)
        try:
            subprocess.run(
                ["gcc", "-O2", "-fPIC", "-shared", str(tmp_src), "-o",
                 str(tmp_lib), "-lm"],
                check=True, capture_output=True, text=True)
            os.rename(tmp_lib, _LIB_PATH)
            os.rename(tmp_src, _SRC)
        finally:
            for t in (tmp_src, tmp_lib):
                try:
                    t.unlink()
                except FileNotFoundError:
                    pass
    lib = ct.CDLL(str(_LIB_PATH))
    p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    for name in ("sinf_vec", "cosf_vec", "tanf_vec"):
        fn = getattr(lib, name)
        fn.argtypes = [p, p, ct.c_long]
        fn.restype = None
    lib.atan2f_vec.argtypes = [p, p, p, ct.c_long]
    lib.atan2f_vec.restype = None
    _LIB = lib
    return lib


def _scalar_fallback(name):
    global _FALLBACK
    if _FALLBACK is None:
        _FALLBACK = ct.CDLL("libm.so.6")
        for nm in ("sinf", "cosf", "tanf"):
            f = getattr(_FALLBACK, nm)
            f.restype = ct.c_float
            f.argtypes = [ct.c_float]
        _FALLBACK.atan2f.restype = ct.c_float
        _FALLBACK.atan2f.argtypes = [ct.c_float, ct.c_float]
    f = getattr(_FALLBACK, name)

    def call(x):
        flat = np.ascontiguousarray(x, np.float32).ravel()
        out = np.fromiter((f(ct.c_float(float(v))) for v in flat),
                          np.float32, count=flat.size)
        return out.reshape(np.shape(x))

    return call


def _vec(name):
    def call(x):
        shape = np.shape(x)           # ascontiguousarray promotes 0-d to 1-d
        x = np.ascontiguousarray(x, np.float32)
        out = np.empty_like(x)
        try:
            lib = _load()
        except Exception:
            return _scalar_fallback(name.split("_")[0])(x).reshape(shape)
        getattr(lib, name)(x.ravel(), out.ravel(), x.size)
        return out.reshape(shape)

    return call


sinf_np = _vec("sinf_vec")
cosf_np = _vec("cosf_vec")
tanf_np = _vec("tanf_vec")


def atan2f_np(y, x):
    """Host-libm ``atan2f`` over numpy arrays (broadcasting y against x)."""
    shape = np.broadcast_shapes(np.shape(y), np.shape(x))
    yb = np.ascontiguousarray(np.broadcast_to(np.asarray(y, np.float32), shape))
    xb = np.ascontiguousarray(np.broadcast_to(np.asarray(x, np.float32), shape))
    out = np.empty(shape, np.float32)
    try:
        lib = _load()
    except Exception:
        _scalar_fallback("sinf")  # ensure _FALLBACK bound with atan2f types
        f = _FALLBACK.atan2f
        flat = np.fromiter(
            (f(ct.c_float(float(a)), ct.c_float(float(b)))
             for a, b in zip(yb.ravel(), xb.ravel())),
            np.float32, count=yb.size)
        return flat.reshape(shape)
    lib.atan2f_vec(yb.ravel(), xb.ravel(), out.ravel(), yb.size)
    return out.reshape(shape)
