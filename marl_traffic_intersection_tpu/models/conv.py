"""Circular-convolution lidar encoder policy: third model family.

The 96 lidar rays (reference obs contract, IntersectionEnv.cpp:510-514) form a
closed 360° ring — ray 95 is physically adjacent to ray 0 — so the natural
inductive bias is a *circular* 1-D convolution over the ray axis, not a flat
MLP or sector pooling. Free-space structure (gaps between cars, road edges)
is translation-equivariant around the ring.

TPU mapping: the conv stack is lowered by XLA to MXU matmuls (the channel
contraction dominates); channel widths are kept at 32/64 and the fused head at
256 so every contraction tiles the 128-lane MXU reasonably at the (B·N)-sized
batches training uses. bfloat16 compute, float32 params, same diagonal-
Gaussian head + smoothly-bounded log_std as the other families.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..core.constants import LIDAR_RAYS, NEIGHBOR_COUNT

_EGO_F = 6
_NEI_F = 5
_STATE_F = _EGO_F + NEIGHBOR_COUNT * _NEI_F   # 31 non-lidar features


class LidarConvPolicy(nn.Module):
    channels: tuple = (32, 64)
    kernel: int = 5
    stride: int = 2
    hidden: int = 256
    act_dim: int = 2
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, obs):
        dt = self.compute_dtype
        *batch, d = obs.shape
        obs = obs.reshape((-1, d)).astype(dt)
        b = obs.shape[0]

        state_f = obs[:, :_STATE_F]                       # (B, 31)
        lid = obs[:, _STATE_F:][..., None]                # (B, 96, 1)

        x = lid
        for i, ch in enumerate(self.channels):
            x = nn.Conv(ch, kernel_size=(self.kernel,),
                        strides=(self.stride,), padding="CIRCULAR",
                        dtype=dt, param_dtype=jnp.float32,
                        name=f"ray_conv_{i}")(x)
            x = nn.relu(x)
        lid_feat = x.reshape(b, -1)                       # (B, 24*64)

        y = nn.Dense(64, dtype=dt, param_dtype=jnp.float32,
                     kernel_init=nn.initializers.orthogonal(np.sqrt(2)),
                     name="state_proj")(state_f)
        y = nn.tanh(y)

        h = jnp.concatenate([lid_feat, y], axis=-1)
        h = nn.Dense(self.hidden, dtype=dt, param_dtype=jnp.float32,
                     kernel_init=nn.initializers.orthogonal(np.sqrt(2)),
                     name="fuse")(h)
        h = nn.tanh(h)

        mean = nn.Dense(self.act_dim, dtype=dt, param_dtype=jnp.float32,
                        kernel_init=nn.initializers.orthogonal(0.01),
                        name="pi_mean")(h)
        value = nn.Dense(1, dtype=dt, param_dtype=jnp.float32,
                         kernel_init=nn.initializers.orthogonal(1.0),
                         name="vf")(h)
        from .actor_critic import bounded_log_std
        log_std = bounded_log_std(self, self.act_dim)

        mean = mean.astype(jnp.float32).reshape(*batch, self.act_dim)
        value = jnp.squeeze(value, -1).astype(jnp.float32).reshape(*batch)
        return mean, log_std, value


assert LIDAR_RAYS == 96  # ring layout assumed by the circular conv
