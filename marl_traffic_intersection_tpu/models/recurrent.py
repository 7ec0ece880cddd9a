"""Recurrent (GRU) actor-critic: fourth model family.

The observation is partially observable — lidar returns ranges, not
velocities, so closing speed of an occluder is invisible to the feedforward
families and must be inferred from history. A GRU carries that history.

Interface differs from the feedforward families: ``apply(params, obs, h)``
returns ``(mean, log_std, value, h_new)`` and the hidden state is part of the
rollout carry (see parallel/recurrent_ppo.py for the truncated-BPTT learner).

TPU notes: the GRU's three gate matmuls are fused by flax into two (input and
hidden) ``(B·N, F)x(F, 3H)`` contractions — MXU work at training batch sizes;
hidden size is a 128-multiple. Compute bfloat16, params float32. The hidden
state must be reset to zeros at agent life boundaries (crash respawn /
success / episode reset) — the learner owns that masking.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class RecurrentActorCritic(nn.Module):
    hidden: int = 256
    gru: int = 128
    act_dim: int = 2
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, obs, h):
        """obs (..., 127), h (..., gru) -> (mean, log_std, value, h_new)."""
        dt = self.compute_dtype
        x = obs.astype(dt)
        x = nn.Dense(self.hidden, dtype=dt, param_dtype=jnp.float32,
                     kernel_init=nn.initializers.orthogonal(np.sqrt(2)),
                     name="torso_0")(x)
        x = nn.tanh(x)
        h_new, y = nn.GRUCell(features=self.gru, dtype=dt,
                              param_dtype=jnp.float32,
                              name="gru")(h.astype(dt), x)
        mean = nn.Dense(self.act_dim, dtype=dt, param_dtype=jnp.float32,
                        kernel_init=nn.initializers.orthogonal(0.01),
                        name="pi_mean")(y)
        value = nn.Dense(1, dtype=dt, param_dtype=jnp.float32,
                         kernel_init=nn.initializers.orthogonal(1.0),
                         name="vf")(y)
        from .actor_critic import bounded_log_std
        log_std = bounded_log_std(self, self.act_dim)
        return (mean.astype(jnp.float32), log_std,
                jnp.squeeze(value, -1).astype(jnp.float32),
                h_new.astype(jnp.float32))

    def initial_hidden(self, *batch_shape) -> jnp.ndarray:
        return jnp.zeros((*batch_shape, self.gru), jnp.float32)
