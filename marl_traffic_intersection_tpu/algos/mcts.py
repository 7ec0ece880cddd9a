"""Snapshot-based planning: batched random-shooting / MPC over EnvState.

The reference exposes get_state/set_state "for fast MCTS rollbacks"
(reference: cpp/EnvState.h:5, IntersectionEnv.cpp:394-416) but ships no
planner. Here the snapshot is just the EnvState value, so planning becomes a
pure function: broadcast the current state K times, roll K sampled action
sequences forward under vmap+scan entirely on device, score them, return the
best first action. This is the TPU-native version of what the reference's
snapshot API enables — thousands of lookahead rollouts per real step.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.env import EnvState, IntersectionEnv


def _default_score(out) -> jnp.ndarray:
    """Per-step score: sum of agent rewards."""
    return out.reward.sum(-1)


def random_shooting_plan(env: IntersectionEnv, state: EnvState, key,
                         num_candidates: int = 256, horizon: int = 20,
                         gamma: float = 0.99,
                         action_smooth: float = 0.7,
                         score_fn: Callable = _default_score
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Plan one action for the current state by rolling K candidate action
    sequences (OU-smoothed uniform noise) over the horizon.

    Returns (best_action (N, 2), best_return ()). Pure; jit-able with static
    num_candidates/horizon.
    """
    n = env.config.num_agents
    k1, k2 = jax.random.split(key)

    # K smoothed action sequences: a_t = rho * a_{t-1} + (1-rho) * u_t
    noise = jax.random.uniform(k1, (horizon, num_candidates, n, 2),
                               jnp.float32, -1.0, 1.0)

    def smooth(carry, u):
        a = action_smooth * carry + (1.0 - action_smooth) * u
        return a, a

    a0 = jax.random.uniform(k2, (num_candidates, n, 2), jnp.float32, -1.0, 1.0)
    _, actions = jax.lax.scan(smooth, a0, noise)           # (H, K, N, 2)

    # broadcast the snapshot K times (value semantics = the MCTS rollback API)
    batched = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (num_candidates,) + x.shape), state)

    def rollout_step(carry, acts_t):
        st, disc, ret = carry
        st2, out = jax.vmap(env.step)(st, acts_t)
        ret = ret + disc * jax.vmap(score_fn)(out)
        return (st2, disc * gamma, ret), None

    (final_state, _, returns), _ = jax.lax.scan(
        rollout_step,
        (batched, jnp.float32(1.0), jnp.zeros((num_candidates,), jnp.float32)),
        actions)

    best = jnp.argmax(returns)
    return actions[0, best], returns[best]


def mpc_policy(env: IntersectionEnv, num_candidates: int = 256,
               horizon: int = 20, **kw):
    """jitted closure: (state, key) -> planned first action."""
    fn = partial(random_shooting_plan, env, num_candidates=num_candidates,
                 horizon=horizon, **kw)
    return jax.jit(lambda state, key: fn(state, key))


def cem_plan(env: IntersectionEnv, state: EnvState, key,
             num_candidates: int = 64, num_iters: int = 4,
             num_elites: int = 8, horizon: int = 20, gamma: float = 0.99,
             init_std: float = 0.6, std_floor: float = 0.05,
             alpha: float = 0.3,
             score_fn: Callable = _default_score,
             init_mean: Optional[jnp.ndarray] = None
             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Cross-entropy-method planning over EnvState snapshots.

    Iteratively refits a diagonal Gaussian over action SEQUENCES (H, N, 2):
    sample K candidates, roll them forward from the snapshot under
    vmap+scan, keep the top-E by discounted return, refit mean/std (EMA
    smoothing ``alpha`` toward the elite stats). Same per-iteration rollout
    machinery as random shooting, so an equal total budget is
    K_shooting == num_candidates * num_iters. Returns
    (first_action (N, 2), best_return (), mean (H, N, 2)) — pass the
    returned ``mean`` (time-shifted) back as ``init_mean`` for receding-
    horizon warm starts.

    This is the planner the reference's get_state/set_state snapshot API was
    built for (cpp/EnvState.h:5) — here a snapshot is just an array pytree,
    so the whole optimization is one jitted program.
    """
    n = env.config.num_agents
    batched = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (num_candidates,) + x.shape), state)

    def eval_seqs(actions):                                  # (H, K, N, 2)
        def rollout_step(carry, acts_t):
            st, disc, ret = carry
            st2, out = jax.vmap(env.step)(st, acts_t)
            ret = ret + disc * jax.vmap(score_fn)(out)
            return (st2, disc * gamma, ret), None

        (_, _, returns), _ = jax.lax.scan(
            rollout_step,
            (batched, jnp.float32(1.0),
             jnp.zeros((num_candidates,), jnp.float32)),
            actions)
        return returns                                       # (K,)

    def iteration(carry, k):
        mean, std = carry                                    # (H, N, 2)
        u = jax.random.normal(k, (horizon, num_candidates, n, 2), jnp.float32)
        acts = jnp.clip(mean[:, None] + std[:, None] * u, -1.0, 1.0)
        rets = eval_seqs(acts)
        _, elite_idx = jax.lax.top_k(rets, num_elites)
        elites = acts[:, elite_idx]                          # (H, E, N, 2)
        e_mean = elites.mean(axis=1)
        e_std = elites.std(axis=1)
        mean = (1.0 - alpha) * e_mean + alpha * mean
        std = jnp.maximum((1.0 - alpha) * e_std + alpha * std,
                          jnp.float32(std_floor))
        return (mean, std), rets.max()

    mean0 = (jnp.zeros((horizon, n, 2), jnp.float32)
             if init_mean is None else jnp.asarray(init_mean, jnp.float32))
    std0 = jnp.full((horizon, n, 2), jnp.float32(init_std))
    (mean, _), best = jax.lax.scan(
        iteration, (mean0, std0), jax.random.split(key, num_iters))
    return jnp.clip(mean[0], -1.0, 1.0), best[-1], mean


def cem_policy(env: IntersectionEnv, **kw):
    """jitted receding-horizon closure: (state, key, warm_mean) ->
    (action, best_return, next_warm_mean)."""
    fn = partial(cem_plan, env, **kw)

    def plan(state, key, warm_mean):
        act, best, mean = fn(state, key, init_mean=warm_mean)
        # shift the plan one step for the next solve (persistence warm start)
        nxt = jnp.concatenate([mean[1:], mean[-1:]], axis=0)
        return act, best, nxt

    return jax.jit(plan)
