"""Batched environment: vmap over a leading env axis, with auto-reset.

This is the net-new scaling axis of the TPU rebuild (the reference is strictly
single-instance — SURVEY.md §2): thousands of independent intersections step
in lockstep under one jit. Each env instance is fully independent, so stepping
needs zero cross-device communication; shard the env axis over a mesh's
``data`` axis (see parallel/mesh.py) and collectives only appear in the
learner.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import DT_DEFAULT
from ..core.env import EnvConfig, EnvState, IntersectionEnv, RewardParams, StepOutput


class VectorEnv:
    """vmap-batched IntersectionEnv.

    route_pool: int32 array of route ids egos are sampled from at (auto-)reset.
    Defaults to the reference's default ego-route mapping (utils.py:29-52).
    """

    def __init__(self, env: IntersectionEnv, num_envs: int,
                 route_pool: Optional[np.ndarray] = None, auto_reset: bool = True):
        self.env = env
        self.num_envs = num_envs
        self.auto_reset = auto_reset
        if route_pool is None:
            from ..core.routes import default_ego_routes
            pool = env.table.route_ids(
                default_ego_routes(max(env.config.num_agents, 12), env.config.num_lanes))
            route_pool = np.unique(pool)
        self.route_pool = jnp.asarray(route_pool, jnp.int32)

    # single-env reset with routes sampled from the pool
    def _reset_one(self, key) -> Tuple[EnvState, jnp.ndarray]:
        krt, kst = jax.random.split(key)
        rids = jax.random.choice(krt, self.route_pool, (self.env.config.num_agents,))
        return self.env.reset(kst, rids)

    def reset(self, key) -> Tuple[EnvState, jnp.ndarray]:
        """Batched reset. Returns (state, obs) with leading dim num_envs."""
        keys = jax.random.split(key, self.num_envs)
        return jax.vmap(self._reset_one)(keys)

    def step(self, state: EnvState, actions, dt=DT_DEFAULT
             ) -> Tuple[EnvState, StepOutput]:
        """Batched step; actions (B, N, 2). Auto-resets finished envs."""
        new_state, out = jax.vmap(partial(self.env.step, dt=dt))(state, actions)
        if not self.auto_reset:
            return new_state, out

        ep_done = out.terminated | out.truncated                  # (B,)
        reset_keys = jax.vmap(lambda k: jax.random.split(k)[1])(new_state.key)
        fresh_state, fresh_obs = jax.vmap(self._reset_one)(reset_keys)

        def pick(a, b):
            mask = ep_done.reshape((-1,) + (1,) * (a.ndim - 1))
            return jnp.where(mask, a, b)

        merged = jax.tree.map(pick, fresh_state, new_state)
        obs = jnp.where(ep_done[:, None, None], fresh_obs, out.obs)
        return merged, out._replace(obs=obs)
