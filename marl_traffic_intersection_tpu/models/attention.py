"""Structured scene-attention policy: tokenizes the 127-d obs into entities.

Second model family (net-new; the reference has no networks). The observation
contract (reference: IntersectionEnv.cpp:418-520) is structured — ego state,
lookahead target, 5 neighbor slots, 96 lidar rays — so instead of a flat MLP
this model builds entity tokens and runs a small pre-LN transformer encoder:

  token 0:      ego + target features (6)
  tokens 1-5:   neighbor slots (5 feats each), key-padding-masked on all-zero
  tokens 6-13:  lidar, 96 rays folded into 8 sector tokens of 12 rays

Widths are 128-multiples for MXU tiling; attention over 14 tokens is tiny, so
the matmuls (QKV/proj/MLP) dominate and map straight onto the systolic array.
Compute in bfloat16, params float32.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..core.constants import LIDAR_RAYS, NEIGHBOR_COUNT

_EGO_F = 6
_NEI_F = 5
_SECTORS = 8


class _Block(nn.Module):
    dim: int
    heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, mask):
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, param_dtype=jnp.float32,
        )(h, h, mask=mask)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(self.dim * 4, dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32)(h)
        return x + h


class SceneTransformerPolicy(nn.Module):
    dim: int = 128
    heads: int = 4
    depth: int = 2
    act_dim: int = 2
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, obs):
        dt = self.compute_dtype
        *batch, d = obs.shape
        obs = obs.reshape((-1, d)).astype(dt)
        b = obs.shape[0]

        ego = obs[:, :_EGO_F]                                     # (B, 6)
        nei = obs[:, _EGO_F:_EGO_F + NEIGHBOR_COUNT * _NEI_F]
        nei = nei.reshape(b, NEIGHBOR_COUNT, _NEI_F)              # (B, 5, 5)
        lid = obs[:, _EGO_F + NEIGHBOR_COUNT * _NEI_F:]
        lid = lid.reshape(b, _SECTORS, LIDAR_RAYS // _SECTORS)    # (B, 8, 12)

        t_ego = nn.Dense(self.dim, dtype=dt, param_dtype=jnp.float32,
                         name="embed_ego")(ego)[:, None, :]
        t_nei = nn.Dense(self.dim, dtype=dt, param_dtype=jnp.float32,
                         name="embed_neighbor")(nei)
        t_lid = nn.Dense(self.dim, dtype=dt, param_dtype=jnp.float32,
                         name="embed_lidar")(lid)
        tokens = jnp.concatenate([t_ego, t_nei, t_lid], axis=1)   # (B, 14, D)
        tokens = tokens + self.param(
            "pos", nn.initializers.normal(0.02),
            (1, 1 + NEIGHBOR_COUNT + _SECTORS, self.dim), jnp.float32).astype(dt)

        # key-padding mask: absent neighbor slots are all-zero in the obs
        nei_present = jnp.any(nei != 0, axis=-1)                   # (B, 5)
        keep = jnp.concatenate([
            jnp.ones((b, 1), bool), nei_present, jnp.ones((b, _SECTORS), bool),
        ], axis=1)                                                 # (B, T)
        attn_mask = keep[:, None, None, :]                         # (B, 1, q, k)

        x = tokens
        for i in range(self.depth):
            x = _Block(self.dim, self.heads, dt, name=f"block_{i}")(x, attn_mask)
        x = nn.LayerNorm(dtype=dt)(x)
        pooled = x[:, 0, :]                                        # ego token readout

        mean = nn.Dense(self.act_dim, dtype=dt, param_dtype=jnp.float32,
                        kernel_init=nn.initializers.orthogonal(0.01),
                        name="pi_mean")(pooled)
        value = nn.Dense(1, dtype=dt, param_dtype=jnp.float32, name="vf")(pooled)
        from .actor_critic import bounded_log_std
        log_std = bounded_log_std(self, self.act_dim)

        mean = mean.astype(jnp.float32).reshape(*batch, self.act_dim)
        value = jnp.squeeze(value, -1).astype(jnp.float32).reshape(*batch)
        return mean, log_std, value
