"""Property fuzz: invariants under random action streams.

The lockstep suite proves equality with the reference on specific configs;
these tests sweep random batched rollouts and assert the state/obs invariants
that must hold for ANY action stream — the cheap canary for numeric blowups
(NaN/Inf), mask corruption, or out-of-domain statuses that a targeted test
might not visit.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
from marl_traffic_intersection_tpu.core.constants import (
    LIDAR_MAX_DIST, PATH_LEN, PHYSICS_MAX_SPEED)
from marl_traffic_intersection_tpu.envs.vector import VectorEnv


def _rollout(cfg: EnvConfig, num_envs: int, steps: int, seed: int):
    env = IntersectionEnv(cfg)
    venv = VectorEnv(env, num_envs=num_envs)
    state, obs = jax.jit(venv.reset)(jax.random.PRNGKey(seed))

    def body(carry, _):
        state, obs, key = carry
        key, ka = jax.random.split(key)
        act = jax.random.uniform(
            ka, (num_envs, cfg.num_agents, 2), jnp.float32, -1.0, 1.0)
        state, out = venv.step(state, act)
        return (state, out.obs, key), (out.status, out.reward)

    (state, obs, _), (statuses, rewards) = jax.lax.scan(
        body, (state, obs, jax.random.PRNGKey(seed + 1)), None, length=steps)
    return state, np.asarray(obs), np.asarray(statuses), np.asarray(rewards)


@pytest.mark.parametrize("agents,traffic", [(1, False), (4, False),
                                            (8, True)])
def test_rollout_invariants(agents, traffic):
    cfg = EnvConfig(num_agents=agents, traffic_flow=traffic,
                    traffic_density=1.0 if traffic else 0.5,
                    max_steps=64, npc_mode="fast")
    state, obs, statuses, rewards = _rollout(cfg, num_envs=32, steps=96,
                                             seed=agents)

    assert np.isfinite(obs).all(), "non-finite observation"
    assert np.isfinite(rewards).all(), "non-finite reward"
    assert statuses.min() >= 0 and statuses.max() <= 5, "status out of domain"

    ego = state.ego
    v = np.asarray(ego.v)
    assert (v >= 0).all() and (v <= PHYSICS_MAX_SPEED + 1e-5).all()
    h = np.asarray(ego.heading)
    assert np.isfinite(h).all() and (np.abs(h) <= np.pi + 1e-5).all()
    pi_ = np.asarray(ego.path_index)
    assert (pi_ >= 0).all() and (pi_ < PATH_LEN).all()
    lid = np.asarray(state.lidar)
    assert (lid >= 0).all() and (lid <= LIDAR_MAX_DIST + 1e-5).all()

    # obs contract: lidar block normalized to [0, 1]; base block bounded
    assert (obs[..., 31:] >= 0).all() and (obs[..., 31:] <= 1 + 1e-6).all()
    assert np.abs(obs[..., :4]).max() <= 2.0

    if traffic:
        npc = state.npc
        alive = np.asarray(npc.alive)
        assert alive.shape[-1] == cfg.max_npcs
        # dead slots must not hold NaNs that could leak through masks
        assert np.isfinite(np.asarray(npc.x)).all()
        assert np.isfinite(np.asarray(npc.v)).all()


def test_extreme_actions_stay_finite():
    """Saturated/degenerate (but in-domain) action streams: full throttle +
    full steer, exact zeros (the float-equality decay branch), and
    alternating bang-bang."""
    cfg = EnvConfig(num_agents=4, max_steps=64)
    env = IntersectionEnv(cfg)
    venv = VectorEnv(env, num_envs=16)
    state, obs = jax.jit(venv.reset)(jax.random.PRNGKey(0))
    step = jax.jit(venv.step)
    patterns = [
        jnp.ones((16, 4, 2), jnp.float32),
        -jnp.ones((16, 4, 2), jnp.float32),
        jnp.zeros((16, 4, 2), jnp.float32),
        jnp.tile(jnp.asarray([[1.0, -1.0]], jnp.float32), (16, 4, 1)),
    ]
    for t in range(60):
        state, out = step(state, patterns[t % len(patterns)])
    assert np.isfinite(np.asarray(out.obs)).all()
    assert np.isfinite(np.asarray(out.reward)).all()
    assert np.isfinite(np.asarray(state.ego.x)).all()
