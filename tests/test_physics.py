"""Bicycle physics / SAT / path-index: unit + long differential trajectories."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marl_traffic_intersection_tpu.core import physics as P
from marl_traffic_intersection_tpu.core import routes as R


def _step_mine(state5, pi, path, throttle, steer, dt):
    out = P.car_physics_step(*[jnp.float32(s) for s in state5],
                             jnp.float32(throttle), jnp.float32(steer), jnp.float32(dt))
    newpi = P.update_path_index(jnp.asarray(path)[None], path.shape[0],
                                jnp.asarray([pi], jnp.int32),
                                out.x[None], out.y[None])[0]
    return np.array([out.x, out.y, out.v, out.heading, out.steering_angle], np.float32), int(newpi)


def test_zero_throttle_decay_exact():
    out = P.car_physics_step(*[jnp.float32(v) for v in (0.0, 0.0, 4.0, 0.0, 0.0)],
                             jnp.float32(0.0), jnp.float32(0.0), jnp.float32(1 / 60))
    # exact-zero throttle triggers 0.95 decay (float equality, Car.cpp:17-19)
    assert np.float32(out.v) == np.float32(np.float32(4.0) * np.float32(0.95))
    out2 = P.car_physics_step(*[jnp.float32(v) for v in (0.0, 0.0, 4.0, 0.0, 0.0)],
                              jnp.float32(1e-8), jnp.float32(0.0), jnp.float32(1 / 60))
    assert float(out2.v) > 3.99  # non-zero throttle: no decay


def test_speed_clamps_and_turn_gate():
    out = P.car_physics_step(jnp.float32(0), jnp.float32(0), jnp.float32(7.9),
                             jnp.float32(0), jnp.float32(0),
                             jnp.float32(1.0), jnp.float32(0.0), jnp.float32(1.0))
    assert float(out.v) == 8.0  # clamped to PHYSICS_MAX_SPEED
    # below 0.1 speed: no heading change even with steering
    out = P.car_physics_step(jnp.float32(0), jnp.float32(0), jnp.float32(0.0),
                             jnp.float32(1.0), jnp.float32(0.5),
                             jnp.float32(0.0), jnp.float32(1.0), jnp.float32(1 / 60))
    # heading unchanged except the unconditional wrap (matches C++ fmod chain)
    pi32 = np.float32(np.pi)
    expect = np.float32(np.fmod(np.float32(1.0) + pi32, np.float32(2.0) * pi32) - pi32)
    assert np.float32(out.heading) == expect


def test_mul_unfused_value_preserving():
    """The CPU FMA-contraction guard must be value-preserving: NaN and Inf
    propagate exactly like a plain multiply (the reference's behavior on a
    diverged state), and finite products are bit-identical. If a compiler
    upgrade learns to fold the nan-select and resumes mul+add contraction,
    the bitwise lockstep suite (EXACTNESS.md) fails loudly; this test pins
    the propagation contract itself."""
    f = jax.jit(P.mul_unfused)
    assert np.isnan(float(f(jnp.float32(np.nan), jnp.float32(2.0))))
    assert float(f(jnp.float32(np.inf), jnp.float32(2.0))) == np.inf
    assert float(f(jnp.float32(-np.inf), jnp.float32(2.0))) == -np.inf
    # inf * 0 -> nan, like the plain product
    assert np.isnan(float(f(jnp.float32(np.inf), jnp.float32(0.0))))
    # overflow to inf propagates (the old guard flushed it to 0.0)
    big = jnp.float32(3e38)
    assert float(f(big, big)) == np.inf
    # finite values: bit-identical to the plain f32 product
    rng = np.random.RandomState(0)
    a = rng.uniform(-1e3, 1e3, 4096).astype(np.float32)
    b = rng.uniform(-1e3, 1e3, 4096).astype(np.float32)
    got = np.asarray(f(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(got.view(np.int32), (a * b).view(np.int32))


def test_mul_unfused_blocks_contraction_under_jit():
    """The contraction CANARY: under jit, ``c + mul_unfused(a, b)`` must
    round the product and the sum separately — i.e. match numpy's two-step
    f32 result on a batch large enough that LLVM's vectorizer would emit
    FMAs if the guard were folded. A value-identity guard (e.g.
    ``where(isnan(p), nan, p)``) gets folded by LLVM and FAILS this test;
    the shipped guard's untaken branch computes a value LLVM cannot prove
    equal, so the select survives and contraction stays blocked."""
    rng = np.random.RandomState(11)
    a = rng.uniform(-8, 8, 200_000).astype(np.float32)
    b = rng.uniform(-1, 1, 200_000).astype(np.float32)
    c = rng.uniform(-8, 8, 200_000).astype(np.float32)

    f = jax.jit(lambda a, b, c: c + P.mul_unfused(a, b))
    got = np.asarray(f(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)))
    want = c + (a * b)  # numpy: separately-rounded mul then add (no FMA)
    np.testing.assert_array_equal(got.view(np.int32), want.view(np.int32))


def test_sat_basic():
    c = P.car_corners(jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0))
    assert c.shape == (4, 2)
    a = P.sat_overlap(
        P.car_corners(jnp.float32(0), jnp.float32(0), jnp.float32(0)), jnp.float32(0),
        P.car_corners(jnp.float32(40), jnp.float32(0), jnp.float32(0)), jnp.float32(0))
    assert bool(a)  # 54-long cars 40 apart overlap
    b = P.sat_overlap(
        P.car_corners(jnp.float32(0), jnp.float32(0), jnp.float32(0)), jnp.float32(0),
        P.car_corners(jnp.float32(60), jnp.float32(0), jnp.float32(0)), jnp.float32(0))
    assert not bool(b)


@pytest.mark.oracle
def test_single_update_vs_oracle():
    from .oracle import oracle as O

    rng = np.random.RandomState(3)
    for _ in range(300):
        s = np.array([rng.uniform(0, 750), rng.uniform(0, 750), rng.uniform(0, 8),
                      rng.uniform(-np.pi, np.pi), rng.uniform(-0.6, 0.6)], np.float32)
        thr = np.float32(rng.choice([0.0, 1.0, -1.0, rng.uniform(-1, 1)]))
        st = np.float32(rng.uniform(-1, 1))
        ref, _ = O.car_update(s.copy(), float(thr), float(st), 1 / 60)
        out = P.car_physics_step(*[jnp.float32(v) for v in s], thr, st, jnp.float32(1 / 60))
        mine = np.array([out.x, out.y, out.v, out.heading, out.steering_angle], np.float32)
        np.testing.assert_allclose(mine, ref, rtol=0, atol=3e-5)


@pytest.mark.oracle
@pytest.mark.slow
def test_trajectory_2000_steps_vs_oracle():
    """Closed-loop 2000-step trajectories on straight/left/right routes with a
    scripted controller; positions must track the oracle within tight bounds
    and path indices must match exactly at every step."""
    from .oracle import oracle as O

    table = R.build_route_table(3)
    for start, end in [("IN_6", "OUT_2"), ("IN_1", "OUT_7"), ("IN_1", "OUT_10")]:
        rid = table.route_id(start, end)
        path = table.paths[rid]
        s = np.array([table.spawn_xy[rid, 0], table.spawn_xy[rid, 1], 0.0,
                      table.spawn_heading[rid], 0.0], np.float32)
        ref_s, ref_pi = s.copy(), 0
        my_s, my_pi = s.copy(), 0
        rng = np.random.RandomState(4)
        max_pos_err = 0.0
        for t in range(2000):
            thr = np.float32(rng.choice([0.0, 0.3, 1.0, -0.5]))
            st = np.float32(np.clip(rng.normal(0, 0.3), -1, 1))
            ref_s, ref_pi = O.car_update(ref_s, float(thr), float(st), 1 / 60,
                                         path=path, path_index=ref_pi)
            my_s, my_pi = _step_mine(my_s, my_pi, path, thr, st, 1 / 60)
            err = np.abs(my_s[:2] - ref_s[:2]).max()
            max_pos_err = max(max_pos_err, float(err))
            assert my_pi == ref_pi, (start, end, t, my_pi, ref_pi)
            assert err < 1e-2, (start, end, t, err)
            # keep closed-loop states identical to stop drift accumulation
            # from trig ulp differences: hard-sync is NOT done — full closed loop
        assert max_pos_err < 1e-2
