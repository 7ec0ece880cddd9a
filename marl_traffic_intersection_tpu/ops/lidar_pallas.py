"""Pallas TPU kernel for the batched lidar ray-march.

Semantics identical to core/lidar.lidar_scan (reference: cpp/Lidar.cpp:22-90)
but batched over envs inside one kernel: the whole (samples x rays) march for
an env block lives in VMEM/vregs, writing only the (B, N, RAYS) result — no
(B, N, RAYS, SAMPLES) intermediates ever touch HBM. Kept as a non-default
alternative: since core/lidar.py switched to a statically-unrolled obstacle
loop, XLA fuses the whole jnp march into one reduce kernel with no HBM
intermediates either, and beats this kernel at the benchmark shapes.

Layout: the march grid is (block_envs, SAMPLES->64 sublanes, RAYS->128 lanes)
— fully data-parallel, no sequential sample loop (a fori_loop over samples
serializes ~63 dependent vector ops and ran ~4x below VPU issue rate in the
first version of this kernel). The sequential reference ``break`` is resolved
by ONE min-reduce over a parity code: oob samples encode 2s+1, hit samples
2s, so an even minimum means the first event was a hit (a sample cannot be
both — hit requires in-bounds), exactly core/lidar.lidar_scan.
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

_LANES_PAD = 128   # pad 96 rays to the VPU lane width
_SAMP_PAD = 64     # pad 63 samples to a full sublane multiple
_BIG = np.int32(2 * _SAMP_PAD)


def _off_road_fast(xf, yf, num_lanes):
    """Symmetry-folded ~is_on_road on integer-valued float coords — identical
    to core/geometry.off_road_grid_fast (bit-exact: all quantities are
    integers < 2**24 in f32)."""
    f = jnp.float32
    rw = f(num_lanes * LANE_WIDTH_PX)
    cr = f(CORNER_RADIUS)
    d = rw + cr
    r2 = cr * cr
    ax = jnp.abs(xf - f(WIDTH * 0.5))
    ay = jnp.abs(yf - f(HEIGHT * 0.5))
    gx = ax - d
    gy = ay - d
    in_grass = gx * gx + gy * gy <= r2
    on_rect = (ax <= rw) | (ay <= rw) | ((ax <= d) & (ay <= d))
    return in_grass | ~on_rect


def _kernel(rel_ref, dist_ref, samp2_ref, sx_ref, sy_ref, sh_ref,
            ox_ref, oy_ref, oh_ref, om_ref, out_ref,
            *, num_agents, num_obs, num_lanes):
    f = jnp.float32
    rel = rel_ref[:].reshape(1, 1, _LANES_PAD)            # ray angles
    dists = dist_ref[:].reshape(1, _SAMP_PAD, 1)          # 0,4,...,248, pad 0
    samp2 = samp2_ref[:].reshape(1, _SAMP_PAD, 1)         # 0,2,...,124, pad BIG

    hl = f(CAR_LENGTH * 0.5)
    hw = f(CAR_WIDTH * 0.5)

    pos_dist = dists > f(0.0)

    for n in range(num_agents):
        sx = sx_ref[:, n][:, None, None]                  # (E, 1, 1)
        sy = sy_ref[:, n][:, None, None]
        sh = sh_ref[:, n][:, None, None]
        ang = sh + rel                                    # (E, 1, R)
        dx = jnp.cos(ang)
        dy = -jnp.sin(ang)                                # y-down screen coords

        # int()-truncated sample grid (E, S, R), exactly the C++ casts
        xi = (sx + dx * dists).astype(jnp.int32)
        yi = (sy + dy * dists).astype(jnp.int32)
        oob = (xi < 0) | (xi >= WIDTH) | (yi < 0) | (yi >= HEIGHT)
        xf = xi.astype(f)
        yf = yi.astype(f)

        hit = _off_road_fast(xf, yf, num_lanes)
        for m in range(num_obs):
            ox = ox_ref[:, m][:, None, None]
            oy = oy_ref[:, m][:, None, None]
            oh = oh_ref[:, m][:, None, None]
            active = om_ref[:, m][:, None, None] > 0
            # eps self/duplicate exclusion (Lidar.cpp:55-63)
            dup = (jnp.abs(ox - sx) < f(1e-3)) & (jnp.abs(oy - sy) < f(1e-3)) \
                & (jnp.abs(oh - sh) < f(1e-3))
            ok = active & ~dup
            c = jnp.cos(oh)
            si = jnp.sin(oh)
            ex = jnp.abs(c) * hl + jnp.abs(si) * hw
            ey = jnp.abs(si) * hl + jnp.abs(c) * hw
            inf = f(np.inf)
            lox = jnp.where(ok, ox - ex, inf)
            hix = jnp.where(ok, ox + ex, -inf)
            loy = jnp.where(ok, oy - ey, inf)
            hiy = jnp.where(ok, oy + ey, -inf)
            hit |= (xf >= lox) & (xf <= hix) & (yf >= loy) & (yf <= hiy)
        hit &= pos_dist

        code = jnp.where(oob, samp2 + 1, jnp.where(hit, samp2, _BIG))
        first = jnp.min(code, axis=1)                     # (E, R)
        is_hit = (first < _BIG) & ((first & 1) == 0)
        res = jnp.where(is_hit, (first >> 1).astype(f) * f(LIDAR_STEP),
                        f(LIDAR_MAX_DIST))
        out_ref[:, n, :] = res


@functools.partial(jax.jit, static_argnames=("num_lanes", "block_b", "interpret"))
def lidar_scan_pallas(sx, sy, sh, ox, oy, oh, om, num_lanes: int = 3,
                      block_b: int = 8, interpret: bool = False):
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
    # padded sample tables: pad dist 0 (never an event: pos_dist false and the
    # sample sits at the car itself, in-bounds for any on-canvas pose) and pad
    # code BIG (no event even for off-canvas poses)
    dists = np.zeros(_SAMP_PAD, np.float32)
    dists[:LIDAR_SAMPLES] = np.arange(LIDAR_SAMPLES) * np.float32(LIDAR_STEP)
    samp2 = np.full(_SAMP_PAD, _BIG, np.int32)
    samp2[:LIDAR_SAMPLES] = np.arange(0, 2 * LIDAR_SAMPLES, 2)
    dists = jnp.asarray(dists).reshape(1, _SAMP_PAD)
    samp2 = jnp.asarray(samp2).reshape(1, _SAMP_PAD)

    kernel = functools.partial(_kernel, num_agents=n, num_obs=m,
                               num_lanes=num_lanes)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, _LANES_PAD), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)]
                 + [pl.BlockSpec((1, _SAMP_PAD), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)] * 2
                 + [pl.BlockSpec((bb, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 3
                 + [pl.BlockSpec((bb, m), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((bb, n, _LANES_PAD), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, _LANES_PAD), jnp.float32),
        interpret=interpret,
    )(rel, dists, samp2, sx, sy, sh, ox, oy, oh, om_i)
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
