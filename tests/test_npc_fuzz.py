"""Fuzz regression: conflict-graph hybrid NPC update vs the serial ground truth.

tests/test_npc.py proves serial==hybrid along simulated rollouts (states the
dynamics can actually reach); this fuzz hits the scheduler with ADVERSARIAL
random fleets instead — dense clusters that force deep dependency chains,
full 32-slot occupancy, shuffled uid orders, and coincident poses — so the
wave-scheduling argument (core/npc.py block comment) is exercised far outside
the reachable-state manifold. Contract: bitwise equality of every pose field
and the alive mask after controller + collision passes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
from marl_traffic_intersection_tpu.core import npc as N
from marl_traffic_intersection_tpu.core.constants import PHYSICS_MAX_SPEED

M = 32


def _table():
    env = IntersectionEnv(EnvConfig(num_agents=1, traffic_flow=True))
    return jnp.asarray(env._paths)


def _random_fleet(rng, cluster: float):
    """Random NpcState; smaller ``cluster`` packs NPCs tighter (more
    interactions, deeper dependency chains)."""
    n_alive = rng.randint(2, M + 1)
    alive = np.zeros(M, bool)
    alive[rng.choice(M, n_alive, replace=False)] = True
    cx, cy = rng.uniform(200, 550, 2)
    x = (cx + rng.uniform(-cluster, cluster, M)).astype(np.float32)
    y = (cy + rng.uniform(-cluster, cluster, M)).astype(np.float32)
    # some exactly-coincident poses (duplicate-exclusion paths)
    for _ in range(2):
        i, j = rng.choice(M, 2, replace=False)
        x[j], y[j] = x[i], y[i]
    uid = rng.permutation(M).astype(np.int32) + rng.randint(0, 1000)
    return N.NpcState(
        alive=jnp.asarray(alive),
        x=jnp.asarray(x), y=jnp.asarray(y),
        v=jnp.asarray(rng.uniform(0, PHYSICS_MAX_SPEED, M).astype(np.float32)),
        heading=jnp.asarray(rng.uniform(-np.pi, np.pi, M).astype(np.float32)),
        steering_angle=jnp.asarray(
            rng.uniform(-0.6, 0.6, M).astype(np.float32)),
        route_id=jnp.asarray(rng.randint(0, 12, M).astype(np.int32)),
        path_index=jnp.asarray(rng.randint(0, 160, M).astype(np.int32)),
        uid=jnp.asarray(uid),
        next_uid=jnp.int32(uid.max() + 1),
    )


def _assert_bitwise(a: N.NpcState, b: N.NpcState, seed, what):
    for field in ("x", "y", "v", "heading", "steering_angle", "path_index",
                  "alive"):
        av, bv = np.asarray(getattr(a, field)), np.asarray(getattr(b, field))
        assert np.array_equal(av, bv), (
            f"{what} seed={seed}: field {field} differs at "
            f"{np.argwhere(av != bv)[:4].ravel()}: {av[av != bv][:4]} vs "
            f"{bv[av != bv][:4]}")


@pytest.mark.parametrize("cluster", [60.0, 150.0, 400.0])
def test_hybrid_matches_serial_on_adversarial_fleets(cluster):
    paths = _table()
    dt = jnp.float32(1.0 / 60.0)
    hybrid = jax.jit(lambda s: N.npc_controller_update(s, paths, dt))
    serial = jax.jit(lambda s: N.npc_controller_update_serial(s, paths, dt))
    kills = jax.jit(N.npc_collisions)
    kills_serial = jax.jit(N.npc_collisions_serial)

    rng = np.random.RandomState(int(cluster))
    for trial in range(25):
        fleet = _random_fleet(rng, cluster)
        h = hybrid(fleet)
        s = serial(fleet)
        _assert_bitwise(h, s, trial, f"controller(cluster={cluster})")
        _assert_bitwise(kills(h), kills_serial(s), trial,
                        f"collisions(cluster={cluster})")
