"""Fuzz regression: dense lidar march vs interval (binary-search) lidar.

PERF.md records a one-off 15.7M-ray equality fuzz between ``lidar_scan``
(the oracle-diffed dense march) and ``lidar_scan_interval``; this checks a
smaller but adversarial slice of that in as a permanent regression so the
interval impl can never silently drift. Adversarial axes:

  - random poses over (and beyond) the screen, full 36-slot obstacle sets
    with random alive masks — the traffic-mode shape;
  - axis-aligned headings (0, +-pi/2, pi): |ray dir| ~ 0 components, the
    tail case that killed the float-inversion design (PERF.md);
  - integer-boundary poses: obstacle AABB edges landing exactly on the
    trunc() pixel lattice the march compares against.

Exactness contract: bit-identical outputs (the interval search evaluates the
same trunc(p0 + d*t) predicate the dense grid does — see core/lidar.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marl_traffic_intersection_tpu.core.constants import (
    HEIGHT, LIDAR_MAX_DIST, WIDTH)
from marl_traffic_intersection_tpu.core.lidar import (
    lidar_scan, lidar_scan_interval, lidar_scan_sweep)

M = 4 + 32  # traffic-mode obstacle slots (EnvConfig.max_npcs default)


def _scan_pair(args):
    sx, sy, sh, ox, oy, oh, om = args
    d = lidar_scan(sx, sy, sh, ox, oy, oh, om, 3)
    i = lidar_scan_interval(sx, sy, sh, ox, oy, oh, om, 3)
    return d, i


_batched = jax.jit(jax.vmap(_scan_pair))


def _check(batch):
    dense, interval = _batched(batch)
    dense = np.asarray(dense)
    interval = np.asarray(interval)
    neq = dense != interval
    assert not neq.any(), (
        f"{neq.sum()} of {neq.size} rays differ; first at "
        f"{np.argwhere(neq)[0]}: dense={dense[neq][0]} interval={interval[neq][0]}")


def _random_batch(rng, n, axis_aligned=False, integer_lattice=False):
    m = float(LIDAR_MAX_DIST)
    sx = rng.uniform(-m, WIDTH + m, n).astype(np.float32)
    sy = rng.uniform(-m, HEIGHT + m, n).astype(np.float32)
    if axis_aligned:
        sh = rng.choice(
            np.asarray([0.0, np.pi / 2, -np.pi / 2, np.pi, -np.pi],
                       np.float32), n)
    else:
        sh = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
    ox = rng.uniform(-50, WIDTH + 50, (n, M)).astype(np.float32)
    oy = rng.uniform(-50, HEIGHT + 50, (n, M)).astype(np.float32)
    oh = rng.uniform(-np.pi, np.pi, (n, M)).astype(np.float32)
    if integer_lattice:
        # pose the obstacle centers so AABB edges land on integers for
        # axis-aligned headings; snap some scanner coords too
        ox = np.round(ox)
        oy = np.round(oy)
        oh = rng.choice(np.asarray([0.0, np.pi / 2], np.float32), (n, M))
        snap = rng.uniform(size=n) < 0.5
        sx = np.where(snap, np.round(sx), sx).astype(np.float32)
        sy = np.where(snap, np.round(sy), sy).astype(np.float32)
    om = rng.uniform(size=(n, M)) < rng.uniform(0.1, 1.0, (n, 1))
    # plant some obstacles right on top of the scanner (self-exclusion path)
    dup = rng.uniform(size=n) < 0.3
    ox[:, 0] = np.where(dup, sx, ox[:, 0])
    oy[:, 0] = np.where(dup, sy, oy[:, 0])
    oh[:, 0] = np.where(dup, sh, oh[:, 0])
    om[:, 0] |= dup
    return (jnp.asarray(sx), jnp.asarray(sy), jnp.asarray(sh),
            jnp.asarray(ox), jnp.asarray(oy), jnp.asarray(oh),
            jnp.asarray(om))


def test_lidar_interval_matches_dense_random():
    rng = np.random.RandomState(0)
    _check(_random_batch(rng, 512))          # ~49k rays


def test_lidar_interval_matches_dense_axis_aligned():
    rng = np.random.RandomState(1)
    _check(_random_batch(rng, 512, axis_aligned=True))


def test_lidar_interval_matches_dense_integer_lattice():
    rng = np.random.RandomState(2)
    _check(_random_batch(rng, 512, axis_aligned=True, integer_lattice=True))


def _sweep_pair(args):
    """env-shaped call: (A,) agents vs one shared obstacle set."""
    sx, sy, sh, ox, oy, oh, om = args
    d = jax.vmap(lambda a, b, c: lidar_scan(a, b, c, ox, oy, oh, om, 3))(
        sx, sy, sh)
    s = lidar_scan_sweep(sx, sy, sh, ox, oy, oh, om, 3)
    return d, s


_batched_sweep = jax.jit(jax.vmap(_sweep_pair))


def _random_env_batch(rng, n, agents=4):
    """Per-example (A,) ego poses + ONE shared (M,) obstacle set, mirroring
    the env's lidar call (core/env.py step stage 8)."""
    m = float(LIDAR_MAX_DIST)
    sx = rng.uniform(-m, WIDTH + m, (n, agents)).astype(np.float32)
    sy = rng.uniform(-m, HEIGHT + m, (n, agents)).astype(np.float32)
    sh = rng.uniform(-np.pi, np.pi, (n, agents)).astype(np.float32)
    ox = rng.uniform(-50, WIDTH + 50, (n, M)).astype(np.float32)
    oy = rng.uniform(-50, HEIGHT + 50, (n, M)).astype(np.float32)
    oh = rng.uniform(-np.pi, np.pi, (n, M)).astype(np.float32)
    om = rng.uniform(size=(n, M)) < rng.uniform(0.1, 1.0, (n, 1))
    # egos ARE in the obstacle set in the env — replicate, exercising the
    # self-exclusion eps compare per agent
    ox[:, :agents] = sx
    oy[:, :agents] = sy
    oh[:, :agents] = sh
    om[:, :agents] = True
    return (jnp.asarray(sx), jnp.asarray(sy), jnp.asarray(sh),
            jnp.asarray(ox), jnp.asarray(oy), jnp.asarray(oh),
            jnp.asarray(om))


def test_lidar_sweep_matches_dense():
    """The lane-packed (S, A*R) sweep layout is bitwise-identical to the
    vmapped dense march (same per-element f32 ops, different tensor
    orientation)."""
    rng = np.random.RandomState(7)
    for agents in (1, 4, 8):
        batch = _random_env_batch(rng, 256, agents=agents)
        dense, sweep = jax.jit(jax.vmap(_sweep_pair))(batch)
        neq = np.asarray(dense) != np.asarray(sweep)
        assert not neq.any(), (agents, neq.sum(), np.argwhere(neq)[0])


@pytest.mark.slow
def test_lidar_sweep_matches_dense_bulk():
    rng = np.random.RandomState(42)
    for seed in range(6):
        batch = _random_env_batch(rng, 1024, agents=4)
        dense, sweep = _batched_sweep(batch)
        neq = np.asarray(dense) != np.asarray(sweep)
        assert not neq.any(), (seed, neq.sum())


@pytest.mark.slow
def test_lidar_interval_matches_dense_bulk():
    """~1.2M rays across mixed regimes (the checked-in slice of the 15.7M
    one-off fuzz)."""
    for seed in range(8):
        rng = np.random.RandomState(100 + seed)
        _check(_random_batch(rng, 1536, axis_aligned=seed % 2 == 1,
                             integer_lattice=seed % 4 == 3))
