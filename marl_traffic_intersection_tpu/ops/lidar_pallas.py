"""Pallas TPU kernel for the batched lidar ray-march.

Semantics identical to core/lidar.lidar_scan (reference: cpp/Lidar.cpp:22-90)
but batched over envs inside one kernel: the whole (rays x samples x
obstacles) march runs in VMEM per env-block, writing only the (B, N, RAYS)
result — no (B, N, RAYS, SAMPLES) intermediates ever touch HBM. Rays are
padded to the 128-lane VPU width; the sample loop is a fori_loop carrying
first-hit/first-oob sample codes resolved exactly like the sequential
reference break (oob wins ties because a hit sample requires ~oob).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.constants import (
    CAR_LENGTH,
    CAR_WIDTH,
    CORNER_RADIUS,
    HEIGHT,
    LANE_WIDTH_PX,
    LIDAR_MAX_DIST,
    LIDAR_RAYS,
    LIDAR_SAMPLES,
    LIDAR_STEP,
    WIDTH,
)
from ..core.lidar import ray_rel_angles

_LANES_PAD = 128  # pad 96 rays to the VPU lane width


def _road_off(xf, yf, num_lanes):
    """~is_on_road on float-cast int pixel coords (RoadGeometry.h:19-58)."""
    f = jnp.float32
    cx = f(WIDTH * 0.5)
    cy = f(HEIGHT * 0.5)
    rw = f(num_lanes * LANE_WIDTH_PX)
    cr = f(CORNER_RADIUS)
    r2 = cr * cr
    in_grass = jnp.zeros(xf.shape, bool)
    for sx_ in (-1.0, 1.0):
        for sy_ in (-1.0, 1.0):
            gx = cx + f(sx_) * (rw + cr)
            gy = cy + f(sy_) * (rw + cr)
            dx = xf - gx
            dy = yf - gy
            in_grass |= dx * dx + dy * dy <= r2
    strip = ((xf >= cx - rw) & (xf <= cx + rw)) | ((yf >= cy - rw) & (yf <= cy + rw))
    xb = ((xf >= cx - rw - cr) & (xf <= cx - rw)) | ((xf >= cx + rw) & (xf <= cx + rw + cr))
    yb = ((yf >= cy - rw - cr) & (yf <= cy - rw)) | ((yf >= cy + rw) & (yf <= cy + rw + cr))
    return in_grass | ~(strip | (xb & yb))


def _kernel(rel_ref, sx_ref, sy_ref, sh_ref, ox_ref, oy_ref, oh_ref, om_ref,
            out_ref, *, num_agents, num_obs, num_lanes):
    f = jnp.float32
    rel2d = rel_ref[:]                                     # (1, 128)

    bb = sx_ref.shape[0]
    # per-obstacle AABB extents from rotated rect (Lidar.cpp:65-72)
    hl = f(CAR_LENGTH * 0.5)
    hw = f(CAR_WIDTH * 0.5)

    for n in range(num_agents):
        sx = sx_ref[:, n][:, None]                        # (BB, 1)
        sy = sy_ref[:, n][:, None]
        sh = sh_ref[:, n][:, None]
        ang = sh + rel2d                                   # (BB, 128)
        dx = jnp.cos(ang)
        dy = -jnp.sin(ang)

        def body(s, carry):
            first_hit, first_oob = carry
            dist = s.astype(f) * f(LIDAR_STEP)
            xi = (sx + dx * dist).astype(jnp.int32)
            yi = (sy + dy * dist).astype(jnp.int32)
            oob = (xi < 0) | (xi >= WIDTH) | (yi < 0) | (yi >= HEIGHT)
            xf = xi.astype(f)
            yf = yi.astype(f)
            hit = _road_off(xf, yf, num_lanes)
            for m in range(num_obs):
                ox = ox_ref[:, m][:, None]
                oy = oy_ref[:, m][:, None]
                oh = oh_ref[:, m][:, None]
                active = om_ref[:, m][:, None] > 0
                # eps self/duplicate exclusion (Lidar.cpp:55-63)
                dup = (jnp.abs(ox - sx) < f(1e-3)) & (jnp.abs(oy - sy) < f(1e-3)) \
                    & (jnp.abs(oh - sh) < f(1e-3))
                c = jnp.cos(oh)
                si = jnp.sin(oh)
                ex = jnp.abs(c) * hl + jnp.abs(si) * hw
                ey = jnp.abs(si) * hl + jnp.abs(c) * hw
                inb = (xf >= ox - ex) & (xf <= ox + ex) & (yf >= oy - ey) & (yf <= oy + ey)
                hit |= inb & active & ~dup
            hit &= dist > f(0.0)
            scode = jnp.full(oob.shape, s, jnp.int32)
            big = jnp.int32(LIDAR_SAMPLES)
            first_hit = jnp.minimum(first_hit, jnp.where(hit & ~oob, scode, big))
            first_oob = jnp.minimum(first_oob, jnp.where(oob, scode, big))
            return first_hit, first_oob

        init = (jnp.full((bb, _LANES_PAD), LIDAR_SAMPLES, jnp.int32),
                jnp.full((bb, _LANES_PAD), LIDAR_SAMPLES, jnp.int32))
        first_hit, first_oob = jax.lax.fori_loop(0, LIDAR_SAMPLES, body, init)
        res = jnp.where(first_hit < first_oob,
                        first_hit.astype(f) * f(LIDAR_STEP), f(LIDAR_MAX_DIST))
        out_ref[:, n, :] = res


@functools.partial(jax.jit, static_argnames=("num_lanes", "block_b", "interpret"))
def lidar_scan_pallas(sx, sy, sh, ox, oy, oh, om, num_lanes: int = 3,
                      block_b: int = 256, interpret: bool = False):
    """Batched lidar: sx/sy/sh (B, N); ox/oy/oh/om (B, M) -> (B, N, RAYS).

    ``om`` is the obstacle-present mask (bool). Output matches
    vmap(vmap(lidar_scan)) exactly.
    """
    b, n = sx.shape
    m = ox.shape[0 + 1] if ox.ndim == 2 else 0
    assert ox.shape == (b, m)
    bb = min(block_b, b)
    while b % bb:
        bb //= 2
    grid = (b // bb,)

    om_i = om.astype(jnp.int32)
    rel = jnp.asarray(np.pad(ray_rel_angles(), (0, _LANES_PAD - LIDAR_RAYS)),
                      jnp.float32).reshape(1, _LANES_PAD)
    kernel = functools.partial(_kernel, num_agents=n, num_obs=m,
                               num_lanes=num_lanes)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, _LANES_PAD), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)]
                 + [pl.BlockSpec((bb, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 3
                 + [pl.BlockSpec((bb, m), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((bb, n, _LANES_PAD), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, _LANES_PAD), jnp.float32),
        interpret=interpret,
    )(rel, sx, sy, sh, ox, oy, oh, om_i)
    return out[:, :, :LIDAR_RAYS]


# ---------------------------------------------------------------- env plumbing
# Single-env callable with a custom batch rule: under VectorEnv's vmap the
# whole env batch dispatches into one pallas_call instead of per-env kernels.
from jax import custom_batching

_LIDAR_BATCH_CACHE = {}


def make_lidar_batch(num_lanes: int = 3):
    """Per-num_lanes factory for the batch-aware pallas lidar callable."""
    if num_lanes in _LIDAR_BATCH_CACHE:
        return _LIDAR_BATCH_CACHE[num_lanes]

    @custom_batching.custom_vmap
    def lidar_batch_fn(x, y, h, ox, oy, oh, om):
        """(N,) self poses + (M,) obstacles -> (N, RAYS); pallas, batch-aware."""
        out = lidar_scan_pallas(x[None], y[None], h[None], ox[None], oy[None],
                                oh[None], om[None], num_lanes=num_lanes,
                                block_b=1)
        return out[0]

    @lidar_batch_fn.def_vmap
    def _rule(axis_size, in_batched, x, y, h, ox, oy, oh, om):
        def ensure(v, batched):
            return v if batched else jnp.broadcast_to(v[None], (axis_size,) + v.shape)

        x, y, h, ox, oy, oh, om = (
            ensure(v, b) for v, b in zip((x, y, h, ox, oy, oh, om), in_batched))
        return lidar_scan_pallas(x, y, h, ox, oy, oh, om,
                                 num_lanes=num_lanes), True

    _LIDAR_BATCH_CACHE[num_lanes] = lidar_batch_fn
    return lidar_batch_fn


def lidar_batch(x, y, h, ox, oy, oh, om, num_lanes: int = 3):
    return make_lidar_batch(num_lanes)(x, y, h, ox, oy, oh, om)
