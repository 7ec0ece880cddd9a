"""Return-based reward normalization wrapper over VectorEnv.

Net-new training utility (the reference ships no training code). The env's
reward mixes dense progress terms (~0.1/step) with sparse terminal bonuses
(±10, Reward.h:5-14 in the reference), which makes PPO's value targets heavy-
tailed on the crash-heavy configs. The standard fix (Gym ``NormalizeReward``)
divides rewards by the running standard deviation of the *discounted return*,
which rescales both without recentering (keeping zero reward meaningful).

TPU-native design: statistics are kept **per env instance** — every leaf of
``NormState`` has the batch dim leading, so the whole wrapper state shards
along the mesh ``data`` axis with the env batch and normalization adds zero
cross-device communication (each shard converges to the same scale since all
envs draw from the same distribution). Pure function-of-state, jit/scan-safe.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.constants import DT_DEFAULT
from .vector import VectorEnv


class NormState(NamedTuple):
    env_state: object        # wrapped EnvState pytree (B-leading)
    ret: jnp.ndarray         # (B, N) discounted return accumulator
    count: jnp.ndarray       # (B,) i64 samples seen per env (f32 would stop
                             # incrementing at 2^24 samples on long runs)
    mean: jnp.ndarray        # (B,) running mean of returns
    m2: jnp.ndarray          # (B,) running sum of squared deviations


class RewardNormVecEnv:
    """Drop-in VectorEnv: same reset/step surface, normalized ``out.reward``.

    ``out.raw_reward`` is not added — callers needing the raw value should use
    the inner env. Success/crash statuses, dones and obs pass through.
    """

    def __init__(self, venv: VectorEnv, gamma: float = 0.99,
                 clip: float = 10.0, eps: float = 1e-8, warmup: int = 64):
        self.venv = venv
        self.env = venv.env
        self.num_envs = venv.num_envs
        self.gamma = float(gamma)
        self.clip = float(clip)
        self.eps = float(eps)
        self.warmup = int(warmup)

    # Mesh pass-through: learners rebind their venv to the training mesh via
    # `env.mesh is not mesh -> env = env.with_mesh(mesh)` (parallel/ppo.py
    # jit_train_step); the wrapper must forward both so reward-normalized
    # training works under a mesh (the wrapper state is B-leading and shards
    # along the data axis with the env batch).
    @property
    def mesh(self):
        return self.venv.mesh

    def with_mesh(self, mesh) -> "RewardNormVecEnv":
        """A copy of this wrapper whose inner VectorEnv is bound to ``mesh``."""
        return RewardNormVecEnv(self.venv.with_mesh(mesh), gamma=self.gamma,
                                clip=self.clip, eps=self.eps,
                                warmup=self.warmup)

    def reset(self, key) -> Tuple[NormState, jnp.ndarray]:
        env_state, obs = self.venv.reset(key)
        b = self.num_envs
        n = self.env.config.num_agents
        return NormState(
            env_state=env_state,
            ret=jnp.zeros((b, n), jnp.float32),
            count=jnp.zeros((b,), jnp.int32),
            mean=jnp.zeros((b,), jnp.float32),
            m2=jnp.zeros((b,), jnp.float32),
        ), obs

    def step(self, state: NormState, actions, dt=DT_DEFAULT):
        env_state, out = self.venv.step(state.env_state, actions, dt=dt)
        reward = out.reward                                    # (B, N)
        n = reward.shape[-1]

        # discounted-return accumulator; cut at per-agent done (crash/success
        # respawn starts a new life) and at episode boundaries (auto-reset)
        done = out.done | (out.terminated | out.truncated)[:, None]
        ret = self.gamma * state.ret * (1.0 - done.astype(jnp.float32)) + reward

        # per-env Welford merge of this tick's N return samples
        batch_mean = ret.mean(-1)                              # (B,)
        batch_m2 = ((ret - batch_mean[:, None]) ** 2).sum(-1)  # (B,)
        count_new = state.count + n                            # exact int count
        cf = count_new.astype(jnp.float32)
        delta = batch_mean - state.mean
        mean_new = state.mean + delta * n / cf
        m2_new = (state.m2 + batch_m2
                  + delta ** 2 * state.count.astype(jnp.float32) * n / cf)

        var = m2_new / jnp.maximum(cf - 1.0, 1.0)
        scale = jax.lax.rsqrt(var + self.eps)                  # (B,)
        # identity until enough samples: early over-estimates of scale would
        # blow the first updates up
        scale = jnp.where(count_new >= self.warmup, scale, 1.0)
        norm_reward = jnp.clip(reward * scale[:, None], -self.clip, self.clip)

        new_state = NormState(env_state=env_state, ret=ret, count=count_new,
                              mean=mean_new, m2=m2_new)
        return new_state, out._replace(reward=norm_reward)
