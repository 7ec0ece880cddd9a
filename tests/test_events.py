"""GLFW-style event surface parity (envs/events.py; bindings.cpp:80-82).

Drives the reference harness's polling idiom (`env.env.poll_events()` /
`.key_pressed(k)` / `.window_should_close()` — test.py:110-145) headlessly
via the injection API.
"""
import numpy as np

from marl_traffic_intersection_tpu.envs.events import (KEY_DOWN, KEY_ESCAPE,
                                                       KEY_UP, EventSurface)
from marl_traffic_intersection_tpu.envs.gym import GymIntersectionEnv


def test_surface_press_poll_release():
    s = EventSurface()
    assert not s.key_pressed(KEY_UP)
    s.inject_press(KEY_UP)
    # not visible until polled (glfwPollEvents semantics)
    assert not s.key_pressed(KEY_UP)
    s.poll_events()
    assert s.key_pressed(KEY_UP)
    # held across polls until released
    s.poll_events()
    assert s.key_pressed(KEY_UP)
    s.inject_release(KEY_UP)
    s.poll_events()
    assert not s.key_pressed(KEY_UP)


def test_surface_close_and_printable_keys():
    s = EventSurface()
    assert not s.window_should_close()
    s.request_close()
    assert s.window_should_close()
    s.inject_press(ord("R"))
    s.poll_events()
    assert s.key_pressed(ord("R"))
    assert not s.key_pressed(ord("L"))


def test_reference_harness_idiom_on_gym_env():
    """The exact access pattern of the reference's test.py drive loop."""
    env = GymIntersectionEnv({"num_agents": 1})
    env.env.inject_press(KEY_UP)
    env.env.poll_events()
    assert not env.env.window_should_close()
    throttle = 0.3 if env.env.key_pressed(KEY_UP) else \
        -0.5 if env.env.key_pressed(KEY_DOWN) else 0.0
    assert throttle == 0.3
    obs, rew, term, trunc, info = env.step(
        np.array([throttle, 0.0], np.float32))
    assert obs.shape == (1, 127)   # multi-agent return shape (env.py:188-208)
    env.env.inject_press(KEY_ESCAPE)
    env.env.poll_events()
    assert env.env.key_pressed(KEY_ESCAPE)


def test_raw_attribute_surface():
    """The raw binding's live-attribute idiom (cpp/bindings.cpp:66-70):
    `env.env.cars` / `.traffic_cars` / `.lidars` / `.step_count`."""
    env = GymIntersectionEnv({"num_agents": 2, "ego_routes":
                              [("IN_6", "OUT_2"), ("IN_1", "OUT_7")]})
    assert env.env.step_count == 0
    cars = env.env.cars
    assert len(cars) == 2
    # spawn pose matches the route table's IN point + first-segment heading
    t = env._core.table
    rid = t.route_id("IN_6", "OUT_2")
    assert cars[0].state.x == float(t.spawn_xy[rid, 0])
    assert cars[0].state.y == float(t.spawn_xy[rid, 1])
    assert cars[0].state.heading == float(t.spawn_heading[rid])
    assert cars[0].alive and cars[0].path_index == 0
    assert len(cars[0].path) == 160
    # no traffic in this config
    assert env.env.traffic_cars == []
    # 96-ray env sensor config with live distances (reset = all-max init,
    # IntersectionEnv.cpp:117)
    lidars = env.env.lidars
    assert len(lidars) == 2 and lidars[0].rays == 96
    assert lidars[0].max_dist == 250.0
    assert all(d == 250.0 for d in lidars[0].distances)
    env.step(np.full((2, 2), 0.5, np.float32))
    assert env.env.step_count == 1
    # post-step attributes re-materialize from the stepped state
    assert env.env.cars[0].state.v > 0.0
    assert any(d < 250.0 for d in env.env.lidars[0].distances)


def test_raw_attribute_surface_traffic():
    """traffic_cars materializes alive NPCs in spawn order."""
    env = GymIntersectionEnv({"traffic_flow": True, "traffic_density": 50.0,
                              "seed": 3})
    for _ in range(60):
        env.step(np.array([0.0, 0.0], np.float32))
    tc = env.env.traffic_cars
    assert len(tc) >= 1
    for c in tc:
        assert c.alive
        assert len(c.path) == 160
