"""Unit tests for the emulated IEEE-754 f64 (ops/softfloat.py).

The exhaustive evidence lives in scripts/verify_exact_trig.py (every f32
in the trig domain) — these are the fast CI differentials: random and
adversarially-cancelling op streams bit-compared against numpy float64 /
libm fma.
"""
import ctypes

import jax
import jax.numpy as jnp
import numpy as np

from marl_traffic_intersection_tpu.ops import softfloat as sf

_libm = ctypes.CDLL("libm.so.6")
_libm.fma.restype = ctypes.c_double
_libm.fma.argtypes = [ctypes.c_double] * 3


def _to_d(v):
    e = np.frexp(v)[1] - 1
    e = np.where(v == 0, 0, e)
    m = v / np.exp2(e.astype(np.float64))
    t0 = m.astype(np.float32)
    t1 = (m - t0.astype(np.float64)).astype(np.float32)
    t2 = (m - t0.astype(np.float64) - t1.astype(np.float64)).astype(np.float32)
    assert ((t0.astype(np.float64) + t1.astype(np.float64)
             + t2.astype(np.float64)) == m).all()
    return (jnp.asarray(t0), jnp.asarray(t1), jnp.asarray(t2),
            jnp.asarray(e, jnp.int32))


def _from_d(t):
    return (np.asarray(t[0], np.float64) + np.asarray(t[1], np.float64)
            + np.asarray(t[2], np.float64)) * np.exp2(
                np.asarray(t[3]).astype(np.float64))


def _rand(rng, n, emin, emax):
    return (rng.uniform(-1, 1, n)
            * np.exp2(rng.randint(emin, emax, n).astype(np.float64)))


def test_mul_add_fma_bitwise_vs_float64():
    rng = np.random.RandomState(0)
    n = 20000
    a = _rand(rng, n, -160, 60)
    b = _rand(rng, n, -160, 60)
    c = _rand(rng, n, -160, 60)
    da, db, dc = _to_d(a), _to_d(b), _to_d(c)
    np.testing.assert_array_equal(_from_d(sf.d_mul(da, db)), a * b)
    np.testing.assert_array_equal(_from_d(sf.d_add(da, dc)), a + c)
    want = np.array([_libm.fma(x, y, z)
                     for x, y, z in zip(a.tolist(), b.tolist(), c.tolist())])
    np.testing.assert_array_equal(_from_d(sf.d_fma(da, db, dc)), want)


def test_fma_deep_cancellation():
    """c ~ -a*b down to 100 cancelled bits — the regime that broke the
    first two renormalization attempts (see renorm docstring)."""
    rng = np.random.RandomState(1)
    n = 10000
    a = _rand(rng, n, -60, 60)
    b = _rand(rng, n, -60, 60)
    depth = rng.randint(1, 100, n)
    c = -(a * b - a * b * np.exp2(-depth.astype(np.float64))
          * rng.uniform(0.5, 1.5, n))
    want = np.array([_libm.fma(x, y, z)
                     for x, y, z in zip(a.tolist(), b.tolist(), c.tolist())])
    got = _from_d(sf.d_fma(_to_d(a), _to_d(b), _to_d(c)))
    np.testing.assert_array_equal(got, want)


def test_conversions():
    rng = np.random.RandomState(2)
    n = 20000
    a = _rand(rng, n, -100, 60)
    da = _to_d(a)
    w32 = a.astype(np.float32)
    ok = np.abs(w32) >= 1.2e-38  # subnormal results double-round (documented)
    got = np.asarray(sf.d_to_f32(da))
    np.testing.assert_array_equal(got.view(np.int32)[ok],
                                  w32.view(np.int32)[ok])
    sm = _rand(rng, n, -3, 30)
    tr = np.asarray(sf.d_trunc_i32(_to_d(sm))).astype(np.float64)
    np.testing.assert_array_equal(tr, np.trunc(sm))
