"""Verify ops/exact_libm.py bit-for-bit against this host's libm.

The oracle (tests/oracle) links the same libm.so.6, so bit-equality here is
bit-equality with what the reference executes in its reward/obs builders
(IntersectionEnv.cpp:18,22,452,455,475).

Usage:
  python scripts/verify_exact_libm.py [--n 2000000] [--device cpu|tpu]

Checks, each over env-domain coords AND exponent-diverse random bit
patterns: atan2f, atanf, hypotf, sqrtf. Prints mismatch counts (expect 0).
"""
import argparse
import ctypes
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    import jax.numpy as jnp
    import numpy as np
    from marl_traffic_intersection_tpu.ops.exact_libm import (
        atan2f_exact, atanf_exact, hypotf_exact, sqrtf_exact)

    libm = ctypes.CDLL("libm.so.6")
    for name, nargs in [("atan2f", 2), ("atanf", 1), ("hypotf", 2),
                        ("sqrtf", 1)]:
        fn = getattr(libm, name)
        fn.restype = ctypes.c_float
        fn.argtypes = [ctypes.c_float] * nargs

    rng = np.random.RandomState(args.seed)
    n = args.n
    F = np.float32

    def mixed(n):
        half = n // 2
        a = rng.uniform(-1100, 1100, half).astype(F)
        b = rng.randint(0, 2 ** 32, n - half, dtype=np.uint32).view(F)
        # magnitudes {0} ∪ [2^-90, 1e18): XLA:CPU runs FTZ/DAZ and the
        # correction machinery's error terms must stay normal (docstring)
        b = b[np.isfinite(b) & (np.abs(b) < 1e18)
              & ((b == 0) | (np.abs(b) >= np.float32(2.0 ** -90)))]
        return np.concatenate([a, b])

    def report(name, got, ref):
        got32 = np.asarray(got, F).view(np.uint32)
        ref32 = np.asarray(ref, F).view(np.uint32)
        nanboth = np.isnan(np.asarray(got, F)) & np.isnan(ref)
        bad = np.nonzero((got32 != ref32) & ~nanboth)[0]
        print(f"{name}: {len(bad)} mismatches / {len(ref32)}")
        return len(bad)

    total = 0

    ys, xs = mixed(n), mixed(n)
    k = min(len(ys), len(xs))
    ys, xs = ys[:k], xs[:k]
    # atan2f_exact domain: |y/x| within [2^-90, 2^90] (module docstring)
    with np.errstate(all="ignore"):
        ratio = np.abs(ys.astype(np.float64) / xs.astype(np.float64))
    keep = (ys == 0) | (xs == 0) | ((ratio >= 2.0 ** -90)
                                    & (ratio <= 2.0 ** 90))
    ys, xs = ys[keep], xs[keep]
    xs[:50] = 0.0
    ys[25:75] = 0.0
    xs[100:150] = 1.0
    ref = np.array([libm.atan2f(ctypes.c_float(float(a)),
                                ctypes.c_float(float(b)))
                    for a, b in zip(ys, xs)], F)
    got = jax.jit(atan2f_exact)(jnp.asarray(ys), jnp.asarray(xs))
    total += report("atan2f", got, ref)

    vs = mixed(n)
    ref = np.array([libm.atanf(ctypes.c_float(float(v))) for v in vs], F)
    got = jax.jit(atanf_exact)(jnp.asarray(vs))
    total += report("atanf", got, ref)

    a, b = mixed(n), mixed(n)
    k = min(len(a), len(b))
    a, b = a[:k], b[:k]
    # hypotf_exact's documented domain: {0} ∪ [2^-90, 2^60] magnitudes
    # (same floor as the module docstring and tests/test_exact_libm.py)
    dom = lambda v: (v == 0) | ((np.abs(v) >= 2.0 ** -90)
                                & (np.abs(v) <= 2.0 ** 60))
    keep = dom(a) & dom(b)
    a, b = a[keep], b[keep]
    a[:50] = 0.0
    b[25:75] = 0.0
    a[100:150] = b[100:150]
    ref = np.array([libm.hypotf(ctypes.c_float(float(u)),
                                ctypes.c_float(float(v)))
                    for u, v in zip(a, b)], F)
    got = hypotf_exact(jnp.asarray(a), jnp.asarray(b))  # eager: CPU-sized jits
    total += report("hypotf", got, ref)

    v = np.abs(mixed(n))
    v = v[(v == 0) | (v >= np.float32(2.0 ** -90))]    # domain floor
    ref = np.array([libm.sqrtf(ctypes.c_float(float(u))) for u in v], F)
    got = jax.jit(sqrtf_exact)(jnp.asarray(v))
    total += report("sqrtf", got, ref)

    sys.exit(1 if total else 0)


if __name__ == "__main__":
    main()
