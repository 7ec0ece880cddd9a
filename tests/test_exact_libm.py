"""ops/exact_libm.py vs the host libm (the one the oracle links): bit
equality of atan2f/atanf/hypotf/sqrtf replicas on env-domain and
exponent-diverse inputs, plus the special values the branch logic handles.

The full-scale sweep is scripts/verify_exact_libm.py (0 mismatches over
~790k samples per function on this host); these are fast CI slices.
"""
import ctypes

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marl_traffic_intersection_tpu.ops.exact_libm import (atan2f_exact,
                                                          atanf_exact,
                                                          hypotf_exact,
                                                          sqrtf_exact)

F = np.float32

_libm = ctypes.CDLL("libm.so.6")
for _name, _na in [("atan2f", 2), ("atanf", 1), ("hypotf", 2), ("sqrtf", 1)]:
    _fn = getattr(_libm, _name)
    _fn.restype = ctypes.c_float
    _fn.argtypes = [ctypes.c_float] * _na


def _mixed(rng, n):
    half = n // 2
    a = rng.uniform(-1100, 1100, half).astype(F)
    b = rng.randint(0, 2 ** 32, n - half, dtype=np.uint32).view(F)
    b = b[np.isfinite(b) & (np.abs(b) < 1e18)
          & ((b == 0) | (np.abs(b) >= F(2.0 ** -90)))]
    return np.concatenate([a, b])


def _assert_bits(name, got, ref):
    got = np.asarray(got, F)
    ok = (got.view(np.uint32) == ref.view(np.uint32)) | \
        (np.isnan(got) & np.isnan(ref))
    bad = np.nonzero(~ok)[0]
    assert len(bad) == 0, (name, bad[:5], got[bad[:5]], ref[bad[:5]])


def test_atan2f_bit_equal():
    rng = np.random.RandomState(0)
    ys, xs = _mixed(rng, 20000), _mixed(rng, 20000)
    k = min(len(ys), len(xs))
    ys, xs = ys[:k], xs[:k]
    with np.errstate(all="ignore"):
        ratio = np.abs(ys.astype(np.float64) / xs.astype(np.float64))
    keep = (ys == 0) | (xs == 0) | ((ratio >= 2.0 ** -90)
                                    & (ratio <= 2.0 ** 90))
    ys, xs = ys[keep], xs[keep]
    # special-value rows: zeros in each sign combo, the x == 1.0 fast path
    ys = np.concatenate([ys, F([0.0, -0.0, 0.0, -0.0, 1.0, -1.0, 0.5])])
    xs = np.concatenate([xs, F([3.0, 3.0, -3.0, -3.0, 1.0, 1.0, 0.0])])
    ref = np.array([_libm.atan2f(ctypes.c_float(float(a)),
                                 ctypes.c_float(float(b)))
                    for a, b in zip(ys, xs)], F)
    got = jax.jit(atan2f_exact)(jnp.asarray(ys), jnp.asarray(xs))
    _assert_bits("atan2f", got, ref)


def test_atanf_bit_equal():
    rng = np.random.RandomState(1)
    vs = _mixed(rng, 20000)
    # branch boundaries: 0.4375 / 0.6875 / 1.1875 / 2.4375 / 2^25 / 2^-29
    edges = F([0.4375, 0.6875, 1.1875, 2.4375, 2.0 ** 25, 2.0 ** -29])
    vs = np.concatenate([vs, edges, -edges, np.nextafter(edges, 0),
                         np.nextafter(edges, np.inf)])
    ref = np.array([_libm.atanf(ctypes.c_float(float(v))) for v in vs], F)
    got = jax.jit(atanf_exact)(jnp.asarray(vs))
    _assert_bits("atanf", got, ref)


@pytest.mark.slow
def test_hypotf_bit_equal():
    rng = np.random.RandomState(2)
    a, b = _mixed(rng, 4000), _mixed(rng, 4000)
    k = min(len(a), len(b))
    a, b = a[:k], b[:k]
    dom = lambda v: (v == 0) | ((np.abs(v) >= 2.0 ** -90)
                                & (np.abs(v) <= 2.0 ** 60))
    keep = dom(a) & dom(b)
    a, b = a[keep], b[keep]
    a[:20] = 0.0
    b[10:30] = 0.0
    a[40:60] = b[40:60]
    ref = np.array([_libm.hypotf(ctypes.c_float(float(u)),
                                 ctypes.c_float(float(v)))
                    for u, v in zip(a, b)], F)
    got = hypotf_exact(jnp.asarray(a), jnp.asarray(b))  # eager per-op jits
    _assert_bits("hypotf", got, ref)


def test_sqrtf_bit_equal():
    rng = np.random.RandomState(3)
    v = np.abs(_mixed(rng, 20000))
    v = v[(v == 0) | (v >= F(2.0 ** -90))]
    v = np.concatenate([v, F([0.0, 1.0, 2.0, 4.0, 0.25, np.inf])])
    ref = np.array([_libm.sqrtf(ctypes.c_float(float(u))) for u in v], F)
    got = jax.jit(sqrtf_exact)(jnp.asarray(v))
    _assert_bits("sqrtf", got, ref)
