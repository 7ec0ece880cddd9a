"""Flagship actor-critic MLP for the 127-d observation contract.

The reference repo ships no training code or networks (SURVEY.md: "There is no
neural network in the reference at all") — this model family is the net-new
learner side of the TPU framework. Design notes for the MXU:

  - hidden sizes are multiples of 128 so layers tile cleanly onto the 128x128
    systolic array;
  - activations run in bfloat16 (params kept in float32) — the observation
    dynamic range is [-1, 1]-ish so bf16 is safe; logits/values are cast back
    to float32 for the loss;
  - diagonal-Gaussian policy over the 2-d (throttle, steer) action space with
    a state-independent learned log_std, tanh-squashed at sampling time to
    respect the env's [-1, 1] action semantics.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def bounded_log_std(module: nn.Module, act_dim: int,
                    lo: float = -4.0, hi: float = 0.5) -> jnp.ndarray:
    """Smoothly-bounded state-independent log_std in [lo, hi], shared by all
    model families. With tanh action squashing the base-Gaussian entropy is
    unbounded in std, so an entropy bonus can blow log_std up without changing
    behavior; a hard clip would kill the gradient once pinned at the bound, so
    bound with a tanh instead. Raw init chosen so log_std starts at 0."""
    raw_init = float(np.arctanh(2.0 * (0.0 - lo) / (hi - lo) - 1.0))
    raw = module.param("log_std", nn.initializers.constant(raw_init),
                       (act_dim,), jnp.float32)
    return lo + 0.5 * (hi - lo) * (jnp.tanh(raw) + 1.0)


class ActorCriticMLP(nn.Module):
    hidden: Sequence[int] = (256, 256)
    act_dim: int = 2
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, obs):
        x = obs.astype(self.compute_dtype)
        for i, h in enumerate(self.hidden):
            x = nn.Dense(h, name=f"torso_{i}",
                         kernel_init=nn.initializers.orthogonal(np.sqrt(2)),
                         dtype=self.compute_dtype, param_dtype=jnp.float32)(x)
            x = nn.tanh(x)
        mean = nn.Dense(self.act_dim, name="pi_mean",
                        kernel_init=nn.initializers.orthogonal(0.01),
                        dtype=self.compute_dtype, param_dtype=jnp.float32)(x)
        value = nn.Dense(1, name="vf",
                         kernel_init=nn.initializers.orthogonal(1.0),
                         dtype=self.compute_dtype, param_dtype=jnp.float32)(x)
        log_std = bounded_log_std(self, self.act_dim)
        return (mean.astype(jnp.float32), log_std,
                jnp.squeeze(value, -1).astype(jnp.float32))


def sample_action(key, mean, log_std):
    """Sample pre-tanh gaussian; return (action in [-1,1], pre-tanh sample)."""
    std = jnp.exp(log_std)
    raw = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
    return jnp.tanh(raw), raw


def logp_and_entropy(mean, log_std, raw_action) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Diagonal-Gaussian log-prob of the pre-tanh action + tanh correction,
    and the base-distribution entropy (summed over action dims)."""
    std = jnp.exp(log_std)
    var = std * std
    logp = -0.5 * (((raw_action - mean) ** 2) / var
                   + 2.0 * log_std + jnp.log(2.0 * jnp.pi)).sum(-1)
    # tanh change-of-variables: log det = sum log(1 - tanh(u)^2)
    logp = logp - (2.0 * (jnp.log(2.0) - raw_action
                          - jax.nn.softplus(-2.0 * raw_action))).sum(-1)
    entropy = (log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e)).sum(-1)
    entropy = jnp.broadcast_to(entropy, logp.shape)
    return logp, entropy
