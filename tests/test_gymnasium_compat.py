"""Strict Gymnasium adapters: checker compliance + vector autoreset.

The reference's env.py is Gym-*style* but not Gymnasium-registrable (no
spaces, bespoke return tuples). These tests pin the compat layer that makes
the TPU env usable with external tooling.
"""
import numpy as np
import pytest

gymnasium = pytest.importorskip("gymnasium")

from marl_traffic_intersection_tpu.envs.gymnasium_compat import (
    GymnasiumIntersectionEnv, GymnasiumVectorEnv)


def test_env_checker_passes():
    env = GymnasiumIntersectionEnv({"max_steps": 64})
    from gymnasium.utils.env_checker import check_env
    check_env(env, skip_render_check=True)


def test_single_env_episode():
    env = GymnasiumIntersectionEnv(
        {"max_steps": 50, "ego_routes": [("IN_6", "OUT_2")]})
    obs, info = env.reset(seed=3)
    assert obs.shape == (127,) and obs.dtype == np.float32
    for _ in range(50):
        obs, rew, term, trunc, info = env.step(
            np.array([0.5, 0.0], np.float32))
        assert obs.shape == (127,) and isinstance(rew, float)
        assert "status" in info
        if term or trunc:
            break
    assert term or trunc  # max_steps=50 guarantees truncation at worst


def test_multi_agent_rejected():
    with pytest.raises(ValueError, match="single-agent"):
        GymnasiumIntersectionEnv({"num_agents": 3})
    with pytest.raises(ValueError, match="single-agent"):
        GymnasiumVectorEnv(4, {"num_agents": 2})


def test_render_rgb_array():
    env = GymnasiumIntersectionEnv({"max_steps": 16}, render_mode="rgb_array")
    env.reset(seed=0)
    frame = env.render()
    assert frame.ndim == 3 and frame.shape[-1] == 3


def test_vector_env_shapes_and_autoreset():
    venv = GymnasiumVectorEnv(8, {"max_steps": 12}, seed=0)
    obs, info = venv.reset()
    assert obs.shape == (8, 127)
    assert venv.observation_space.shape == (8, 127)
    assert venv.action_space.shape == (8, 2)
    saw_trunc = False
    for t in range(16):
        acts = np.zeros((8, 2), np.float32)
        obs, rew, term, trunc, info = venv.step(acts)
        assert obs.shape == (8, 127) and rew.shape == (8,)
        assert term.shape == (8,) and trunc.shape == (8,)
        saw_trunc |= bool(trunc.any())
    # max_steps=12 < 16 steps: every env must have truncated (and been
    # auto-reset in the same fused step: obs stays valid afterwards)
    assert saw_trunc
    assert np.isfinite(obs).all()


def test_vector_env_gymnasium_wrapper_compat():
    """The adapter composes with stock gymnasium vector wrappers."""
    venv = GymnasiumVectorEnv(4, {"max_steps": 16}, seed=1)
    wrapped = gymnasium.wrappers.vector.RecordEpisodeStatistics(venv)
    obs, info = wrapped.reset()
    for _ in range(4):
        obs, rew, term, trunc, info = wrapped.step(
            np.zeros((4, 2), np.float32))
    assert obs.shape == (4, 127)


def test_vector_env_same_step_final_obs():
    """SAME_STEP contract: finished episodes put their TERMINAL observation
    in infos['final_obs'] (the returned obs is the post-reset one), with the
    SyncVectorEnv-style object-array + boolean-mask layout."""
    venv = GymnasiumVectorEnv(4, {"max_steps": 6}, seed=2)
    obs, info = venv.reset()
    final_seen = False
    for t in range(8):
        prev_obs = obs
        obs, rew, term, trunc, infos = venv.step(np.zeros((4, 2), np.float32))
        done = term | trunc
        if done.any():
            final_seen = True
            assert set(infos) >= {"final_obs", "_final_obs",
                                  "final_info", "_final_info"}
            np.testing.assert_array_equal(infos["_final_obs"], done)
            for i in range(4):
                if done[i]:
                    fo = infos["final_obs"][i]
                    assert fo.shape == (127,)
                    # terminal obs of the OLD episode, not the fresh reset:
                    # step count advanced, so it differs from the reset obs
                    assert not np.array_equal(fo, obs[i])
                else:
                    assert infos["final_obs"][i] is None
        else:
            assert infos == {}
    assert final_seen  # max_steps=6 < 8 steps: must have truncated
