"""SAC networks: squashed-Gaussian actor and Q-critic.

Net-new off-policy learner side (the reference ships no training code —
SURVEY.md §4). Same MXU discipline as the other families: 128-multiple hidden
widths, bfloat16 activations, float32 params and outputs.

Unlike the PPO families' state-independent log_std, the SAC actor's log_std is
state-dependent (standard SAC; Haarnoja et al., 2018), hard-clipped to
[LOG_STD_MIN, LOG_STD_MAX] before exponentiation.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LOG_STD_MIN = -5.0
LOG_STD_MAX = 2.0


class SquashedGaussianActor(nn.Module):
    hidden: Sequence[int] = (256, 256)
    act_dim: int = 2
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, obs):
        dt = self.compute_dtype
        x = obs.astype(dt)
        for i, h in enumerate(self.hidden):
            x = nn.Dense(h, name=f"torso_{i}",
                         kernel_init=nn.initializers.orthogonal(np.sqrt(2)),
                         dtype=dt, param_dtype=jnp.float32)(x)
            x = nn.relu(x)
        mean = nn.Dense(self.act_dim, name="mean",
                        kernel_init=nn.initializers.orthogonal(0.01),
                        dtype=dt, param_dtype=jnp.float32)(x)
        log_std = nn.Dense(self.act_dim, name="log_std",
                           kernel_init=nn.initializers.orthogonal(0.01),
                           dtype=dt, param_dtype=jnp.float32)(x)
        log_std = jnp.clip(log_std.astype(jnp.float32),
                           LOG_STD_MIN, LOG_STD_MAX)
        return mean.astype(jnp.float32), log_std


def sample_squashed(key, mean, log_std):
    """Reparameterized tanh-Gaussian sample: (action in [-1,1], logp)."""
    std = jnp.exp(log_std)
    raw = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
    action = jnp.tanh(raw)
    logp = -0.5 * (((raw - mean) / std) ** 2
                   + 2.0 * log_std + jnp.log(2.0 * jnp.pi)).sum(-1)
    # tanh change-of-variables, numerically-stable softplus form
    logp = logp - (2.0 * (jnp.log(2.0) - raw
                          - jax.nn.softplus(-2.0 * raw))).sum(-1)
    return action, logp


class QCritic(nn.Module):
    """Q(s, a) -> scalar. Twin critics are two param sets of this module
    stacked on a leading axis and applied under vmap (see parallel/sac.py)."""
    hidden: Sequence[int] = (256, 256)
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, obs, action):
        dt = self.compute_dtype
        x = jnp.concatenate([obs, action], axis=-1).astype(dt)
        for i, h in enumerate(self.hidden):
            x = nn.Dense(h, name=f"torso_{i}",
                         kernel_init=nn.initializers.orthogonal(np.sqrt(2)),
                         dtype=dt, param_dtype=jnp.float32)(x)
            x = nn.relu(x)
        q = nn.Dense(1, name="q",
                     kernel_init=nn.initializers.orthogonal(1.0),
                     dtype=dt, param_dtype=jnp.float32)(x)
        return jnp.squeeze(q, -1).astype(jnp.float32)
