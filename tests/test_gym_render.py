"""Gym wrapper API-parity tests + headless renderer test."""
import numpy as np
import pytest

from marl_traffic_intersection_tpu.envs.gym import GymIntersectionEnv


def test_gym_multi_agent_api():
    env = GymIntersectionEnv({"num_agents": 3, "num_lanes": 3})
    obs, info = env.reset()
    assert obs.shape == (3, 127)
    obs, rew, term, trunc, info = env.step(np.zeros((3, 2), np.float32))
    assert obs.shape == (3, 127) and rew.shape == (3,)
    assert set(info) == {"step", "rewards", "collisions", "agents_alive",
                         "terminated", "truncated", "done", "status"}
    assert info["step"] == 1 and info["agents_alive"] == 3
    assert info["status"] == ["ALIVE"] * 3
    assert isinstance(info["rewards"], list)


def test_gym_traffic_single_agent_shapes():
    env = GymIntersectionEnv({"traffic_flow": True, "traffic_density": 5.0,
                              "num_agents": 1})
    obs, info = env.reset()
    assert obs.shape == (127,)  # single-agent return-shape switch (env.py:159-161)
    obs, rew, term, trunc, info = env.step(np.array([0.5, 0.0], np.float32))
    assert obs.shape == (127,)
    assert isinstance(rew, float)
    assert isinstance(info["rewards"], float)


def test_gym_action_shape_validation():
    env = GymIntersectionEnv({"num_agents": 2})
    with pytest.raises(ValueError):
        env.step(np.zeros((3,), np.float32))


def test_gym_reward_config_plumbing():
    env = GymIntersectionEnv({
        "num_agents": 1,
        "reward_config": {"stuck_penalty": -1.0, "progress_scale": 0.0,
                          "action_smoothness_scale": 0.0},
    })
    env.reset()
    obs, rew, *_ = env.step(np.zeros((1, 2), np.float32))
    assert abs(float(rew[0]) - (-1.0)) < 1e-6  # stationary -> stuck penalty only


def test_renderer_headless_frame():
    env = GymIntersectionEnv({"num_agents": 2, "render_mode": "rgb_array",
                              "show_lidar": True})
    env.reset()
    env.step(np.zeros((2, 2), np.float32))
    frame = env.render()
    assert frame.shape == (750, 750, 3) and frame.dtype == np.uint8
    # road must be drawn (gray pixels present), cars colored
    assert (frame[375, 375] == np.array([60, 60, 60])).all() or frame[375, 375].std() < 60
    # HUD overlay (step/agents/traffic/speed, Renderer.cpp:344-373) is on by
    # default and must change pixels in the top-left text region
    no_hud = env._renderer.render(env._state, show_hud=False)
    assert (frame[:60, :160] != no_hud[:60, :160]).any()
    env.close()


def test_gym_native_backend():
    """backend='native' drives the C++ host engine with the same API + info."""
    from marl_traffic_intersection_tpu.native import native_available
    if not native_available():
        pytest.skip("native engine unavailable")
    envs = {}
    for backend in ("jax", "native"):
        env = GymIntersectionEnv({"num_agents": 2, "backend": backend,
                                  "render_mode": "rgb_array"})
        obs, _ = env.reset()
        for _ in range(50):
            obs, rew, term, trunc, info = env.step(
                np.full((2, 2), 0.4, np.float32))
        envs[backend] = (obs, rew, info)
        frame = env.render()
        assert frame.shape == (750, 750, 3)
    oj, rj, ij = envs["jax"]
    on, rn, im = envs["native"]
    np.testing.assert_allclose(oj[:, :31], on[:, :31], atol=5e-5, rtol=0)
    np.testing.assert_allclose(rj, rn, atol=1e-4, rtol=0)
    assert ij["status"] == im["status"]
