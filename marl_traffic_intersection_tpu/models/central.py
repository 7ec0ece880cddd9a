"""Centralized-critic actor-critic (MAPPO-style CTDE family).

Net-new learner-side capability (the reference ships no training code —
SURVEY.md §2): centralized training with decentralized execution. The actor is
the same per-agent MLP as the flagship family (decentralized: it sees only its
own 127-d observation, so trained policies deploy agent-local), while the
value function conditions on the *joint* observation of all agents in the
intersection — the standard MAPPO recipe (Yu et al., 2021).

TPU-native design notes:

  - the joint state is summarized by a permutation-invariant mean-pool over
    per-agent embeddings (parameter-shared embed -> pool -> per-agent value
    head on [own embed, pooled embed]). Pooling keeps the critic independent
    of agent count and ordering, so one set of params serves every env config
    and curriculum stage, and the whole critic is three batched matmuls — MXU
    work with no gather/scatter;
  - the agent axis is ``obs.shape[-2]``: the PPO learner's trajectories carry
    (T, B, N, 127) so pooling composes with any leading batch layout,
    including the sharded env axis (pooling is over N, never over the sharded
    B axis — no cross-device communication is introduced);
  - activations bfloat16, params float32, hidden widths 128-multiples
    (same MXU discipline as models/actor_critic.py).

Drop-in: exposes the same ``(obs) -> (mean, log_std, value)`` interface as the
other families, so ``PPOLearner`` runs MAPPO unchanged — the PPO machinery
(GAE, clipping, minibatching) is exactly what MAPPO prescribes; only the
value function's conditioning changes.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .actor_critic import bounded_log_std


class CentralizedActorCritic(nn.Module):
    """Per-agent actor + permutation-invariant centralized critic.

    Input obs must have shape (..., N, obs_dim): the second-to-last axis is
    the agent axis (set ``needs_agent_axis`` for learner init).
    """
    hidden: Sequence[int] = (256, 256)
    embed: int = 128
    act_dim: int = 2
    compute_dtype: jnp.dtype = jnp.bfloat16

    needs_agent_axis = True

    @nn.compact
    def __call__(self, obs):
        if obs.ndim < 2:
            raise ValueError("CentralizedActorCritic needs (..., N, obs_dim)")
        dt = self.compute_dtype
        x = obs.astype(dt)

        # ----- actor: decentralized, per-agent (same family as the flagship)
        a = x
        for i, h in enumerate(self.hidden):
            a = nn.Dense(h, name=f"torso_{i}",
                         kernel_init=nn.initializers.orthogonal(np.sqrt(2)),
                         dtype=dt, param_dtype=jnp.float32)(a)
            a = nn.tanh(a)
        mean = nn.Dense(self.act_dim, name="pi_mean",
                        kernel_init=nn.initializers.orthogonal(0.01),
                        dtype=dt, param_dtype=jnp.float32)(a)
        log_std = bounded_log_std(self, self.act_dim)

        # ----- critic: centralized over the agent axis (axis -2)
        e = nn.Dense(self.embed, name="critic_embed",
                     kernel_init=nn.initializers.orthogonal(np.sqrt(2)),
                     dtype=dt, param_dtype=jnp.float32)(x)
        e = nn.tanh(e)
        pooled = e.mean(axis=-2, keepdims=True)            # (..., 1, E)
        pooled = jnp.broadcast_to(pooled, e.shape)         # (..., N, E)
        c = jnp.concatenate([e, pooled], axis=-1)          # (..., N, 2E)
        c = nn.Dense(self.embed * 2, name="critic_joint",
                     kernel_init=nn.initializers.orthogonal(np.sqrt(2)),
                     dtype=dt, param_dtype=jnp.float32)(c)
        c = nn.tanh(c)
        value = nn.Dense(1, name="vf",
                         kernel_init=nn.initializers.orthogonal(1.0),
                         dtype=dt, param_dtype=jnp.float32)(c)

        return (mean.astype(jnp.float32), log_std,
                jnp.squeeze(value, -1).astype(jnp.float32))
