"""Bisect a 1-ulp atan2f_exact device flip into its internal ops.

Evaluates every intermediate of the atanf kernel (argument reduction,
polynomial, reconstruction) plus the leading _div32 for one (y, x) input
given as f32 bit patterns, each in its own tiny jit, and prints bit
patterns. Run once with --device cpu (verified == libm) and once with
--device tpu; the first differing line names the op.

Usage:
  python scripts/atan_probe.py --y-bits 0x42317d10 --x-bits 0x41c2de20
      --device tpu
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--device" in sys.argv:
    _dev = sys.argv[sys.argv.index("--device") + 1]
else:
    _dev = "cpu"
if _dev == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from marl_traffic_intersection_tpu.ops.exact_libm import (
    _AT_EVEN, _AT_ODD, _ATANHI, _ATANLO, _c, _mul, atanf_exact)
from marl_traffic_intersection_tpu.ops.exact_trig import _div32

_F = jnp.float32


def b2f(u):
    return np.uint32(int(u, 16) if isinstance(u, str) else u).view(np.float32)


def p(name, v):
    v = np.float32(v)
    print(f"  {name:10s} = {v!r} (0x{int(v.view(np.uint32)):08x})", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--y-bits", required=True)
    ap.add_argument("--x-bits", required=True)
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    args = ap.parse_args()

    y = b2f(args.y_bits)
    x = b2f(args.x_bits)
    print(f"device={_dev} y={y!r} x={x!r}")

    j = lambda f, *a: np.float32(jax.jit(f)(*map(jnp.float32, a)))

    q = j(_div32, y, x)
    p("q=y/x", q)
    aq = np.float32(abs(q))

    # argument reduction for id==2 (0x3F97FFFF < bits <= 0x401BFFFF)
    num = j(lambda a: a - _c(0x3FC00000), aq)
    den = j(lambda a: _mul(a, _c(0x3FC00000)) + _F(1.0), aq)
    xr = j(_div32, num, den)
    p("num", num); p("den", den); p("xr", xr)

    z = j(lambda a: _mul(a, a), xr)
    w = j(lambda a: _mul(a, a), z)
    p("z", z); p("w", w)

    def poly_s1(zv, wv):
        s1 = _c(_AT_EVEN[0])
        for u in _AT_EVEN[1:]:
            s1 = _mul(s1, wv) + _c(u)
        return _mul(s1, zv)

    def poly_s2(wv):
        s2 = _c(_AT_ODD[0])
        for u in _AT_ODD[1:]:
            s2 = _mul(s2, wv) - _c(u)
        return _mul(s2, wv)

    s1 = j(poly_s1, z, w)
    s2 = j(poly_s2, w)
    p("s1", s1); p("s2", s2)

    t = j(lambda a, b, c: _mul(a + b, c), s1, s2, xr)
    p("t", t)

    hi, lo = _ATANHI[2], _ATANLO[2]          # id == 2 row (r3 branch)
    res = j(lambda tv, xv: _c(hi) - ((tv - _c(lo)) - xv), t, xr)
    p("res_mid", res)

    full = j(atanf_exact, aq)
    p("atanf", full)


if __name__ == "__main__":
    main()
