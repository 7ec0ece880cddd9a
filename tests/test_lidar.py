"""Lidar ray-march differential tests vs the reference C++ oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marl_traffic_intersection_tpu.core.lidar import lidar_scan, ray_rel_angles


def test_rel_angles():
    a = ray_rel_angles()
    assert a.shape == (96,)
    assert a[0] == np.float32(-np.pi)
    assert abs(float(a[-1]) - np.pi) < 1e-6


def test_no_obstacles_center():
    d = lidar_scan(jnp.float32(375.0), jnp.float32(375.0), jnp.float32(0.0),
                   jnp.zeros((1,)), jnp.zeros((1,)), jnp.zeros((1,)),
                   jnp.zeros((1,), bool))
    d = np.asarray(d)
    assert d.shape == (96,)
    # at the very center, road extends ≥ rw in all directions; the nearest
    # off-road (grass circle) is farther than 126 px in every direction
    assert (d > 120).all()


@pytest.mark.oracle
def test_lidar_vs_oracle_random():
    from .oracle import oracle as O

    rng = np.random.RandomState(7)
    scan = jax.jit(lambda sx, sy, sh, ox, oy, oh, om: lidar_scan(sx, sy, sh, ox, oy, oh, om))

    n_exact = 0
    n_total = 0
    worst = 0.0
    for case in range(200):
        # bias positions onto the road so rays travel
        sx = np.float32(rng.uniform(300, 450))
        sy = np.float32(rng.uniform(0, 750))
        sh = np.float32(rng.uniform(-np.pi, np.pi))
        m = rng.randint(0, 6)
        others = np.stack([
            rng.uniform(250, 500, m),
            rng.uniform(0, 750, m),
            rng.uniform(-np.pi, np.pi, m),
        ], axis=1).astype(np.float32) if m else np.zeros((0, 3), np.float32)

        ref = O.lidar(3, [sx, sy, sh], others)
        mine = np.asarray(scan(
            jnp.float32(sx), jnp.float32(sy), jnp.float32(sh),
            jnp.asarray(others[:, 0]) if m else jnp.zeros((1,)),
            jnp.asarray(others[:, 1]) if m else jnp.zeros((1,)),
            jnp.asarray(others[:, 2]) if m else jnp.zeros((1,)),
            jnp.ones((max(m, 1),), bool) if m else jnp.zeros((1,), bool),
        ))
        n_total += 96
        n_exact += int((mine == ref).sum())
        if (mine != ref).any():
            worst = max(worst, float(np.abs(mine - ref).max()))

    # int-cast boundaries can flip a sample by one 4-px step on trig-ulp
    # differences; require near-total exactness and single-step worst case
    assert n_exact / n_total >= 0.999, (n_exact, n_total)
    assert worst <= 8.0, worst


@pytest.mark.oracle
def test_lidar_self_exclusion_vs_oracle():
    """A duplicate of self in the obstacle list must be ignored (eps compare)."""
    from .oracle import oracle as O

    pose = [375.0, 300.0, 0.5]
    others = np.array([pose, [375.0005, 300.0005, 0.5005]], np.float32)
    ref = O.lidar(3, pose, others)
    mine = np.asarray(lidar_scan(
        jnp.float32(pose[0]), jnp.float32(pose[1]), jnp.float32(pose[2]),
        jnp.asarray(others[:, 0]), jnp.asarray(others[:, 1]), jnp.asarray(others[:, 2]),
        jnp.ones((2,), bool)))
    assert np.array_equal(mine, ref)
    # and the near-duplicate within 1e-3 is excluded -> same as no obstacles
    ref_empty = O.lidar(3, pose, np.zeros((0, 3), np.float32))
    assert np.array_equal(ref, ref_empty)


def test_pallas_lidar_respects_num_lanes():
    """Regression: the pallas env path must use the configured lane count
    (a 2-lane world has road half-width 84px, not 126px)."""
    from marl_traffic_intersection_tpu.ops.lidar_pallas import make_lidar_batch

    x = jnp.asarray([375.0]); y = jnp.asarray([375.0]); h = jnp.asarray([0.0])
    om = jnp.zeros((1,), bool)
    with __import__('jax').disable_jit():
        pass
    outs = {}
    for lanes in (2, 3):
        ref = lidar_scan(x[0], y[0], h[0], x, y, h, om, num_lanes=lanes)
        import functools
        fn = make_lidar_batch(lanes)
        # interpret mode on CPU
        from marl_traffic_intersection_tpu.ops import lidar_pallas as LP
        got = LP.lidar_scan_pallas(x[None], y[None], h[None], x[None], y[None],
                                   h[None], om[None], num_lanes=lanes,
                                   block_b=1, interpret=True)[0]
        # eager-jnp vs interpret-pallas can flip a ray landing exactly on a
        # pixel boundary by one 4px march step (same class of diff tolerated
        # vs the C++ oracle) — require near-total agreement
        d = np.abs(np.asarray(got) - np.asarray(ref))
        assert (d > 4.0).sum() == 0 and (d > 0).sum() <= 2, (lanes, d.max())
        outs[lanes] = np.asarray(ref)
    assert not np.array_equal(outs[2], outs[3])  # geometries genuinely differ


def test_interval_impl_bit_equal_random_fuzz():
    """lidar_scan_interval must be BIT-identical to the dense march on random
    poses at scale — the gate for swapping the default (PERF.md)."""
    import jax

    from marl_traffic_intersection_tpu.core.lidar import (lidar_scan,
                                                          lidar_scan_interval)

    key = jax.random.PRNGKey(0)
    B, M = 4096, 5
    ks = jax.random.split(key, 8)
    x = jax.random.uniform(ks[0], (B,), jnp.float32, -50.0, 800.0)
    y = jax.random.uniform(ks[1], (B,), jnp.float32, -50.0, 800.0)
    h = jax.random.uniform(ks[2], (B,), jnp.float32, -np.pi, np.pi)
    ox = jax.random.uniform(ks[3], (B, M), jnp.float32, -50.0, 800.0)
    oy = jax.random.uniform(ks[4], (B, M), jnp.float32, -50.0, 800.0)
    oh = jax.random.uniform(ks[5], (B, M), jnp.float32, -np.pi, np.pi)
    om = jax.random.bernoulli(ks[6], 0.8, (B, M))
    # place some obstacles right on top of rays' likely paths
    ox = ox.at[:, 0].set(x + 40.0)
    oy = oy.at[:, 0].set(y)

    dense = jax.jit(jax.vmap(lambda a, b, c, d, e, f, g:
                             lidar_scan(a, b, c, d, e, f, g)))
    intv = jax.jit(jax.vmap(lambda a, b, c, d, e, f, g:
                            lidar_scan_interval(a, b, c, d, e, f, g)))
    r1 = np.asarray(dense(x, y, h, ox, oy, oh, om))
    r2 = np.asarray(intv(x, y, h, ox, oy, oh, om))
    np.testing.assert_array_equal(r1, r2)


def test_interval_impl_bit_equal_adversarial():
    """Axis-aligned rays (|d| ~ 0 on one axis), boxes whose edges sit exactly
    on sample/integer boundaries, self-exclusion, and out-of-canvas boxes."""
    import jax

    from marl_traffic_intersection_tpu.core.lidar import (lidar_scan,
                                                          lidar_scan_interval)

    cases = []
    # exactly axis-aligned headings (two of the 96 rays get |dx| or |dy| = 0)
    for hh in (0.0, np.pi / 2, -np.pi / 2, np.pi, 1e-7, np.pi / 2 - 1e-7):
        cases.append((375.0, 375.0, hh))
    # car center at integer and near-integer coords (trunc boundaries)
    for xx in (100.0, 100.0 + 2**-12, 99.999999, 375.5):
        cases.append((xx, 375.0, 0.3))
    n = len(cases)
    x = jnp.asarray([c[0] for c in cases], jnp.float32)
    y = jnp.asarray([c[1] for c in cases], jnp.float32)
    h = jnp.asarray([c[2] for c in cases], jnp.float32)
    # obstacles: dead ahead at integer offsets, exactly on the canvas edge,
    # fully off-canvas, duplicated self pose (self-exclusion), far corner
    M = 5
    ox = jnp.stack([x + 48.0, jnp.full((n,), 749.0), jnp.full((n,), -40.0),
                    x, jnp.full((n,), 80.0)], axis=1)
    oy = jnp.stack([y, y, y, y, jnp.full((n,), 80.0)], axis=1)
    oh = jnp.zeros((n, M), jnp.float32).at[:, 4].set(0.7853982)
    om = jnp.ones((n, M), bool)

    from jax import vmap
    r1 = np.asarray(vmap(lambda a, b, c, d, e, f, g:
                         lidar_scan(a, b, c, d, e, f, g))(x, y, h, ox, oy, oh, om))
    r2 = np.asarray(vmap(lambda a, b, c, d, e, f, g:
                         lidar_scan_interval(a, b, c, d, e, f, g))(x, y, h, ox, oy, oh, om))
    np.testing.assert_array_equal(r1, r2)
