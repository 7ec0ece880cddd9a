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
