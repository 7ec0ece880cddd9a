"""Object-level reference-API compatibility layer (compat.py) tests.

Covers the migration surface of the reference pybind11 classes
(cpp/bindings.cpp:11-95): State/Car/RewardConfig/StepResult/Lidar can be
constructed standalone and agree with the functional kernels bit for bit.
"""
import jax
import jax.numpy as jnp
import numpy as np

from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
from marl_traffic_intersection_tpu.compat import (
    Car,
    Lidar,
    RewardConfig,
    State,
    StepResult,
)
from marl_traffic_intersection_tpu.core.physics import car_physics_step


def test_reference_api_constructs():
    """Every class of the reference module surface can be instantiated bare,
    like MARLEnv.State()/Car()/RewardConfig()/StepResult()/Lidar()."""
    s = State()
    assert (s.x, s.y, s.v, s.heading) == (0.0, 0.0, 0.0, 0.0)
    car = Car()
    assert car.alive and car.length == 54.0 and car.width == 24.0
    rc = RewardConfig()
    assert (rc.k_prog, rc.v_min_ms, rc.k_stuck, rc.k_cv, rc.k_co, rc.k_succ,
            rc.k_sm, rc.alpha) == (10.0, 1.0, -0.01, -10.0, -5.0, 10.0, -0.02, 0.2)
    sr = StepResult()
    assert sr.step == 0 and not sr.terminated
    ld = Lidar()
    assert ld.rays == 72 and ld.max_dist == 250.0
    assert len(ld.distances) == 72 and len(ld.rel_angles) == 72


def test_car_update_bitwise_matches_kernel():
    """500 random control steps: the mutable Car must track the functional
    car_physics_step float for float (same quirks: per-call steering lag,
    exact-zero decay, dt only on speed)."""
    rng = np.random.RandomState(0)
    car = Car()
    car.state = State(x=100.0, y=700.0, v=0.0, heading=1.25)

    x = jnp.float32(100.0)
    y = jnp.float32(700.0)
    v = jnp.float32(0.0)
    heading = jnp.float32(1.25)
    steering = jnp.float32(0.0)
    for t in range(500):
        th = float(rng.choice([0.0, 0.5, 1.0, -0.5, 0.123]))
        st = float(np.clip(rng.normal(0, 0.5), -1, 1))
        car.update(th, st, 1.0 / 60.0)
        out = car_physics_step(x, y, v, heading, steering,
                               jnp.float32(th), jnp.float32(st),
                               jnp.float32(1.0 / 60.0))
        x, y, v, heading, steering = out.x, out.y, out.v, out.heading, \
            out.steering_angle
        assert np.float32(car.state.x) == np.asarray(x), t
        assert np.float32(car.state.y) == np.asarray(y), t
        assert np.float32(car.state.v) == np.asarray(v), t
        assert np.float32(car.state.heading) == np.asarray(heading), t
        assert np.float32(car.steering_angle) == np.asarray(steering), t


def test_car_collision_and_corners():
    a = Car()
    a.state = State(x=100.0, y=100.0, heading=0.0)
    b = Car()
    b.state = State(x=140.0, y=100.0, heading=0.5)
    c = Car()
    c.state = State(x=400.0, y=400.0, heading=0.0)
    assert a.check_collision(b) and b.check_collision(a)
    assert not a.check_collision(c)
    corners = a.corners()
    assert corners.shape == (4, 2)
    np.testing.assert_allclose(corners.mean(axis=0), [100.0, 100.0], atol=1e-4)


def test_car_path_following_matches_env():
    """Car loaded from an EnvState slot + manual update/update_path_index must
    reproduce the env's own next pose and path index (config-1 mid-route)."""
    env = IntersectionEnv(EnvConfig(num_agents=1))
    state, _ = env.reset(jax.random.PRNGKey(0),
                         env.table.route_ids([("IN_6", "OUT_2")]))
    step = jax.jit(env.step)
    acts = jnp.asarray([[0.7, 0.05]], np.float32)
    for _ in range(30):
        state, _ = step(state, acts)

    car = Car.from_env_state(state, 0, paths=env.table.paths)
    car.update(0.7, 0.05, 1.0 / 60.0)
    car.update_path_index()

    state2, _ = step(state, acts)
    assert np.float32(car.state.x) == np.asarray(state2.ego.x)[0]
    assert np.float32(car.state.y) == np.asarray(state2.ego.y)[0]
    assert np.float32(car.state.heading) == np.asarray(state2.ego.heading)[0]
    assert car.path_index == int(np.asarray(state2.ego.path_index)[0])


def test_standalone_lidar_senses_road_and_cars():
    me = Car()
    me.state = State(x=375.0, y=375.0, heading=0.0)  # intersection center
    ld = Lidar()  # reference defaults: 72 rays
    ld.update(me, [me])  # self excluded by epsilon compare
    d0 = np.asarray(ld.distances)
    assert (d0 <= 250.0).all() and (d0 > 0).all()
    # a car dead ahead must shorten the forward rays
    other = Car()
    other.state = State(x=475.0, y=375.0, heading=0.0)
    ld.update(me, [me, other])
    d1 = np.asarray(ld.distances)
    fwd = ld.rel_angles.index(min(ld.rel_angles, key=abs))
    assert d1[fwd] < d0[fwd]
    assert d1[fwd] <= 100.0
    norm = ld.normalized()
    assert abs(norm[fwd] - d1[fwd] / 250.0) < 1e-6


def test_env_sensor_variant_is_96_rays():
    ld = Lidar.env_sensor()
    assert ld.rays == 96 and ld.fov_deg == 360.0 and ld.max_dist == 250.0
