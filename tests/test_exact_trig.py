"""Bit-exactness of ops/exact_trig.py against the host libm.

These are the sampled fast checks (boundary-targeted + random); the
EXHAUSTIVE sweep over every f32 in the domain is
scripts/verify_exact_trig.py (run standalone — ~2.2e9 inputs/function).
"""
import ctypes

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marl_traffic_intersection_tpu.ops.exact_trig import (cosf_emulated,
                                                          sinf_emulated,
                                                          tanf_emulated)

_libm = ctypes.CDLL("libm.so.6")
for _n in ("sinf", "cosf", "tanf"):
    getattr(_libm, _n).restype = ctypes.c_float
    getattr(_libm, _n).argtypes = [ctypes.c_float]


def _want(name, x):
    f = getattr(_libm, name)
    return np.array([f(ctypes.c_float(v)) for v in x], np.float32)


def _sample_points(seed=0):
    rng = np.random.RandomState(seed)
    pts = [rng.uniform(-7, 7, 1500),                       # env angle range
           rng.uniform(-119, 119, 600),                    # full medium path
           (rng.uniform(-1, 1, 600)
            * np.exp2(rng.randint(-140, 4, 600))),         # tiny + subnormal
           ]
    # boundary-targeted: multiples of pi/2 +- ulps (worst-case reduction),
    # the 0.75 / 2^-12 / 120 path edges, tanf's 0.6744 and pi/4 folds
    near = []
    for k in range(1, 76):
        base = np.float32(k * np.pi / 2)
        for d in range(-6, 7):
            near.append(np.nextafter(base, np.float32(np.inf), dtype=np.float32)
                        if d == 0 else base + np.float32(d) * np.spacing(base))
    for edge in (0.75, 2.0 ** -12, 2.0 ** -13, 0.6744, np.pi / 4, 119.99):
        e = np.float32(edge)
        for d in range(-8, 9):
            near.append(e + np.float32(d) * np.spacing(e))
    pts.append(np.asarray(near, np.float32))
    x = np.concatenate([p.astype(np.float32) for p in pts])
    return np.concatenate([x, -x]).astype(np.float32)


@pytest.mark.slow
@pytest.mark.parametrize("name,fn", [("sinf", sinf_emulated),
                                     ("cosf", cosf_emulated),
                                     ("tanf", tanf_emulated)])
def test_exact_trig_bitwise_vs_libm(name, fn):
    # NOT under an outer jit: the emulated-f64 ops are individually jitted
    # (softfloat.py) — one giant fused CPU kernel executes pathologically
    x = _sample_points()
    got = np.asarray(fn(jnp.asarray(x)))
    want = _want(name, x)
    bad = got.view(np.int32) != want.view(np.int32)
    assert not bad.any(), (
        name, int(bad.sum()),
        [(float(x[j]), hex(int(got.view(np.int32)[j])),
          hex(int(want.view(np.int32)[j]))) for j in np.nonzero(bad)[0][:5]])


@pytest.mark.slow
def test_physics_step_exact_trig_identity_on_cpu():
    """On CPU, XLA's vectorized trig matches libm bit-for-bit (EXACTNESS.md),
    so the exact_trig pose integrator must be bit-identical to the default
    one — a free differential for the whole emulation stack.

    Both sides run EAGERLY: (a) the emulated-f64 ops are per-op jitted
    (softfloat.py jit note), and (b) a bare jitted physics step is not the
    env's program — with `acc` single-use, XLA's algebraic simplifier
    merges (throttle*MAX_ACC)*dt into one constant multiply (one rounding),
    which the real env step cannot do because acc is multi-use (it also
    feeds the smoothness reward). The jitted-env-vs-oracle ground truth is
    scripts/exactness_report.py.

    The platform split routes *_exact to the host libm on CPU — pin the
    EMULATED implementations here so this stays a differential for the
    emulation stack (its TPU behavior), not a libm-vs-libm identity."""
    from marl_traffic_intersection_tpu.core.physics import car_physics_step
    from marl_traffic_intersection_tpu.ops import exact_trig as et

    orig = (et.sinf_exact, et.cosf_exact, et.tanf_exact)
    et.sinf_exact, et.cosf_exact, et.tanf_exact = (
        et.sinf_emulated, et.cosf_emulated, et.tanf_emulated)

    rng = np.random.RandomState(3)
    n = 512
    args = [jnp.asarray(a, jnp.float32) for a in (
        rng.uniform(0, 750, n), rng.uniform(0, 750, n),
        rng.uniform(0, 8, n), rng.uniform(-np.pi, np.pi, n),
        rng.uniform(-0.6, 0.6, n), rng.uniform(-1, 1, n),
        rng.uniform(-1, 1, n))]
    try:
        base = car_physics_step(*args, jnp.float32(1 / 60))
        ex = car_physics_step(*args, jnp.float32(1 / 60), exact_trig=True)
    finally:
        et.sinf_exact, et.cosf_exact, et.tanf_exact = orig
    for f, g in zip(base, ex):
        np.testing.assert_array_equal(
            np.asarray(f).view(np.int32), np.asarray(g).view(np.int32))
