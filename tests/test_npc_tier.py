"""NPC slot-prefix tiering (envs/vector.py): bitwise equality vs full-width.

The batched step runs on a [:, :tier] slice of the NPC pool whenever no env
in the batch can touch a tail slot this tick (see VectorEnv._stepped). These
differentials drive the tiered and untiered programs through identical
trajectories and assert bit-identical states every step — including ticks
where the batch-level cond flips between the sliced and full programs
(spawn pressure pushing alive counts across the tier boundary), which is
where a wrong predicate or a stale tail write-back would show up.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
from marl_traffic_intersection_tpu.envs.vector import VectorEnv


def _run(cfg_kwargs, num_envs, steps, seed):
    env = IntersectionEnv(EnvConfig(num_agents=2, traffic_flow=True,
                                    max_steps=10 ** 6, **cfg_kwargs))
    venv = VectorEnv(env, num_envs=num_envs, auto_reset=True)
    state, _ = jax.jit(venv.reset)(jax.random.PRNGKey(seed))
    step = jax.jit(venv.step)
    rng = np.random.RandomState(seed + 1)
    traj = []
    for _ in range(steps):
        acts = jnp.asarray(rng.uniform(-1, 1, (num_envs, 2, 2)), jnp.float32)
        state, out = step(state, acts)
        traj.append((jax.tree.map(np.asarray, state),
                     jax.tree.map(np.asarray, out)))
    return traj


def _assert_bitwise(tiered, full):
    for t, ((sa, oa), (sb, ob)) in enumerate(zip(tiered, full)):
        for name, a, b in [("state", sa, sb), ("out", oa, ob)]:
            la = jax.tree_util.tree_leaves_with_path(a)
            lb = jax.tree.leaves(b)
            for (path, x), y in zip(la, lb):
                assert np.array_equal(x, y, equal_nan=True), (
                    t, name, jax.tree_util.keystr(path))


@pytest.mark.parametrize("density,max_npcs,steps,seed", [
    (1.0, 16, 120, 0),   # sliced path active nearly every tick
    (8.0, 12, 160, 1),   # alive count straddles tier=6: cond flips both ways
    (12.0, 8, 200, 2),   # head fills: spawn-overflow predicate must go full
])
def test_tiered_step_bitwise_equals_full(density, max_npcs, steps, seed):
    kw = dict(traffic_density=density, max_npcs=max_npcs)
    tiered = _run(dict(kw, npc_tier=-1), num_envs=8, steps=steps, seed=seed)
    full = _run(dict(kw, npc_tier=0), num_envs=8, steps=steps, seed=seed)
    _assert_bitwise(tiered, full)
    # the interesting trajectories actually exercise both programs: some
    # tick must have an alive NPC in the tail half OR a full head prefix
    # (else the fallback predicate was never tested) and some tick must not
    tier = max_npcs // 2
    hot = [bool(np.any(s.npc.alive[:, tier:]) |
                np.any(np.all(s.npc.alive[:, :tier], axis=-1)))
           for s, _ in tiered]
    if density >= 8.0:
        assert any(hot), "fallback path never exercised"
    assert not all(hot), "sliced path never exercised"


def test_tiered_step_fast_mode_bitwise():
    """Tiering applies to the fast (synchronous) NPC mode too."""
    kw = dict(traffic_density=3.0, max_npcs=16, npc_mode="fast")
    tiered = _run(dict(kw, npc_tier=-1), num_envs=6, steps=100, seed=5)
    full = _run(dict(kw, npc_tier=0), num_envs=6, steps=100, seed=5)
    _assert_bitwise(tiered, full)


def _run_final_obs(npc_tier, num_envs, steps, seed):
    """Traffic-on trajectory through step(final_obs=True): the gymnasium
    SAME_STEP terminal-obs path routes through the tiered _observed on the
    PRE-reset state — its tier cond is otherwise unexercised."""
    env = IntersectionEnv(EnvConfig(num_agents=2, traffic_flow=True,
                                    traffic_density=4.0, max_npcs=12,
                                    max_steps=40, npc_tier=npc_tier))
    venv = VectorEnv(env, num_envs=num_envs, auto_reset=True)
    state, _ = jax.jit(venv.reset)(jax.random.PRNGKey(seed))
    step = jax.jit(lambda s, a: venv.step(s, a, final_obs=True))
    rng = np.random.RandomState(seed + 1)
    traj = []
    for _ in range(steps):
        acts = jnp.asarray(rng.uniform(-1, 1, (num_envs, 2, 2)), jnp.float32)
        state, out, term_obs = step(state, acts)
        traj.append((jax.tree.map(np.asarray, out), np.asarray(term_obs)))
    return traj


def test_tiered_final_obs_bitwise():
    """term_obs (final_obs=True) is bitwise equal between tiered and
    untiered programs across episode boundaries (max_steps=40 forces
    truncation resets, so the terminal observe really runs on states that
    differ from the merged post-reset state)."""
    tiered = _run_final_obs(-1, num_envs=6, steps=90, seed=7)
    full = _run_final_obs(0, num_envs=6, steps=90, seed=7)
    for t, ((oa, ta), (ob, tb)) in enumerate(zip(tiered, full)):
        assert np.array_equal(ta, tb), ("term_obs", t)
        la = jax.tree.leaves(oa)
        for x, y in zip(la, jax.tree.leaves(ob)):
            assert np.array_equal(x, y, equal_nan=True), ("out", t)
