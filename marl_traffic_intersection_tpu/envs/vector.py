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
from ..core.env import EnvState, IntersectionEnv, StepOutput


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

    # single-env reset (state only) with routes sampled from the pool.
    # Sampled WITHOUT replacement when the pool allows: duplicate routes mean
    # identical spawn points -> agents overlap at spawn and crash-respawn-crash
    # forever (the default route pool has one route per IN lane, so distinct
    # routes guarantee distinct spawns).
    def _reset_state_one(self, key) -> EnvState:
        krt, kst = jax.random.split(key)
        n = self.env.config.num_agents
        pool = self.route_pool
        p = pool.shape[0]
        if p < n:
            rids = jax.random.choice(krt, pool, (n,), replace=True)
        else:
            # uniform n-subset without replacement via n rounds of masked
            # argmin over iid uniforms (same distribution as
            # jax.random.choice(replace=False), which lowers to a full sort —
            # XLA stages (B, pool) sort copies in every auto-reset step)
            u = jax.random.uniform(krt, (p,))
            rows = []
            taken = jnp.zeros((p,), bool)
            for _ in range(n):
                d = jnp.where(taken, jnp.inf, u)
                oh = d == jnp.min(d)
                oh &= jnp.cumsum(oh.astype(jnp.int32)) == 1
                taken |= oh
                rows.append(jnp.sum(jnp.where(oh, pool, 0), dtype=jnp.int32))
            rids = jnp.stack(rows)
        return self.env.reset_state(kst, rids)

    def reset(self, key) -> Tuple[EnvState, jnp.ndarray]:
        """Batched reset. Returns (state, obs) with leading dim num_envs."""
        keys = jax.random.split(key, self.num_envs)
        state = jax.vmap(self._reset_state_one)(keys)
        return state, jax.vmap(self.env.observe)(state)

    def jit_step(self, dt=DT_DEFAULT, donate: bool = True):
        """Jitted per-call step for eager driving loops.

        Donating the state argument lets XLA update the (large, B-leading)
        EnvState buffers in place instead of copying them in and out each
        call — the dominant cost of the non-scan path (PERF.md). The caller
        must not reuse the state object passed in (the usual
        ``state, out = step(state, actions)`` pattern is safe).
        """
        fn = partial(self.step, dt=dt)
        return jax.jit(fn, donate_argnums=(0,) if donate else ())

    def step(self, state: EnvState, actions, dt=DT_DEFAULT,
             final_obs: bool = False):
        """Batched step; actions (B, N, 2). Auto-resets finished envs.

        final_obs=True additionally returns the TERMINAL observation of the
        stepped (pre-reset) state as a third value — the gymnasium SAME_STEP
        autoreset contract needs it for truncation bootstrapping. Costs one
        extra observe over the batch; the default path stays single-observe.
        """
        if not self.auto_reset:
            return jax.vmap(partial(self.env.step, dt=dt))(state, actions)

        # step without obs, merge in fresh states for finished envs, then
        # build the observation once on the merged state (equivalent to
        # observing stepped and fresh states separately, at half the cost)
        new_state, out = jax.vmap(partial(self.env.step, dt=dt, with_obs=False))(
            state, actions)
        ep_done = out.terminated | out.truncated                  # (B,)
        reset_keys = jax.vmap(lambda k: jax.random.split(k)[1])(new_state.key)
        fresh_state = jax.vmap(self._reset_state_one)(reset_keys)

        def pick(a, b):
            mask = ep_done.reshape((-1,) + (1,) * (a.ndim - 1))
            return jnp.where(mask, a, b)

        merged = jax.tree.map(pick, fresh_state, new_state)
        obs = jax.vmap(self.env.observe)(merged)
        if final_obs:
            term_obs = jax.vmap(self.env.observe)(new_state)
            return merged, out._replace(obs=obs), term_obs
        return merged, out._replace(obs=obs)
