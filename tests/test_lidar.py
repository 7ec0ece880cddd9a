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
