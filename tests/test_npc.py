"""NPC traffic-flow lockstep differential tests (spawn decisions injected)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
from marl_traffic_intersection_tpu.core.constants import STATUS_NAMES


def _npc_sorted(state):
    """My alive NPC slots in vector (uid) order -> (m, 6) x,y,v,heading,pi,route."""
    alive = np.asarray(state.npc.alive)
    uid = np.asarray(state.npc.uid)
    idx = np.nonzero(alive)[0]
    idx = idx[np.argsort(uid[idx])]
    return np.stack([
        np.asarray(state.npc.x)[idx],
        np.asarray(state.npc.y)[idx],
        np.asarray(state.npc.v)[idx],
        np.asarray(state.npc.heading)[idx],
        np.asarray(state.npc.path_index)[idx].astype(np.float32),
    ], axis=1)


def _run_traffic_lockstep(density, num_steps, seed=0, policy_throttle=0.5,
                          pos_atol=5e-3, routes=None, lanes=3):
    from .oracle import oracle as O

    if routes is None:
        routes = [("IN_6", "OUT_2")]
    cfg = EnvConfig(num_agents=len(routes), num_lanes=lanes, traffic_flow=True,
                    traffic_density=density, max_steps=4000)
    env = IntersectionEnv(cfg)
    state, obs = env.reset(jax.random.PRNGKey(seed), env.table.route_ids(routes))
    step = jax.jit(env.step)

    oenv = O.OracleEnv(num_lanes=lanes, traffic=True, max_steps=4000)
    oenv.reset(routes)

    T = env.table.traffic_route_ids.shape[0]
    rng = np.random.RandomState(seed + 100)
    p_spawn = 1.0 - np.exp(-density / 60.0)
    spawn_count = 0

    for t in range(num_steps):
        # injected decision stream: Bernoulli(p) plus a periodic forced try so
        # low-density configs still exercise the spawn path deterministically
        do_try = bool(rng.uniform() < p_spawn) or (t % 40 == 7)
        route_choice = int(rng.randint(T))
        if do_try:
            oenv.force_spawn(route_choice)
        acts = np.tile(np.array([[policy_throttle, 0.0]], np.float32),
                       (len(routes), 1))
        state, out = step(state, jnp.asarray(acts),
                          spawn=(jnp.asarray(do_try), jnp.int32(route_choice)))
        ref = oenv.step(acts)

        # NPC fleet comparison (vector order vs uid order)
        mine = _npc_sorted(state)
        refn = oenv.npcs()
        assert mine.shape[0] == refn.shape[0], (t, mine.shape, refn.shape)
        if mine.shape[0]:
            spawn_count += 1
            np.testing.assert_allclose(mine[:, :4],
                                       refn[:, [0, 1, 2, 3]], atol=pos_atol, rtol=0,
                                       err_msg=f"step {t}")
            assert np.array_equal(mine[:, 4].astype(int), refn[:, 5].astype(int)), t

        # ego-side agreement
        st_mine = [STATUS_NAMES[int(s)] for s in np.asarray(out.status)]
        st_ref = [STATUS_NAMES[int(s)] for s in ref["status"]]
        assert st_mine == st_ref, (t, st_mine, st_ref)
        np.testing.assert_allclose(np.asarray(out.reward), ref["reward"],
                                   atol=1e-4, rtol=0, err_msg=f"step {t}")
        mine_obs = np.asarray(out.obs)
        np.testing.assert_allclose(mine_obs[:, :31], ref["obs"][:, :31],
                                   atol=5e-5, rtol=0, err_msg=f"step {t}")
        ldiff = np.abs(mine_obs[:, 31:] - ref["obs"][:, 31:])
        assert (ldiff > 8.0 / 250.0 + 1e-6).sum() == 0, (t, ldiff.max())
        assert (ldiff > 1e-6).sum(axis=-1).max() <= 3, t
    return spawn_count


@pytest.mark.oracle
def test_config2_traffic_density_05():
    """BASELINE config 2: single agent + traffic, density 0.5."""
    steps_with_npcs = _run_traffic_lockstep(0.5, 400)
    assert steps_with_npcs > 0


@pytest.mark.oracle
def test_two_lane_traffic_lockstep():
    """num_lanes=2 world WITH NPC traffic (VERDICT r3 task 7): the 2-lane
    route mapping classifies intents differently and generates different
    corner-arc paths (utils.py:29-38, RouteGen.cpp:55-87) — this is the
    first end-to-end 2-lane rollout diffed against the oracle with the
    spawn/despawn/NPC-policy path live."""
    steps_with_npcs = _run_traffic_lockstep(
        1.0, 400, seed=3, routes=[("IN_6", "OUT_2"), ("IN_1", "OUT_3")],
        lanes=2)
    assert steps_with_npcs > 0


@pytest.mark.oracle
def test_dense_traffic_density_10():
    """Dense traffic (test.py uses density=10): many concurrent NPCs, heavy
    ghost-scan interaction, collision removal and despawn churn."""
    steps_with_npcs = _run_traffic_lockstep(10.0, 350, seed=3)
    assert steps_with_npcs > 100


@pytest.mark.oracle
@pytest.mark.slow
def test_config4_dense_long():
    _run_traffic_lockstep(1.0, 1200, seed=5)


def test_npc_slot_overflow_drops_spawn():
    """With max_npcs=2, a third spawn must be dropped, not corrupt state."""
    cfg = EnvConfig(num_agents=1, traffic_flow=True, max_npcs=2)
    env = IntersectionEnv(cfg)
    state, _ = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    T = env.table.traffic_route_ids.shape[0]
    for t in range(3):
        state, out = step(state, jnp.zeros((1, 2)),
                          spawn=(jnp.asarray(True), jnp.int32((t * 7) % T)))
    assert int(np.asarray(state.npc.alive).sum()) <= 2


def test_fast_mode_tracks_exact_mode():
    """Fast (synchronous) NPC mode must closely track the exact sequential
    mode for short horizons: same spawn/despawn decisions, near-identical
    trajectories (divergence only via same-tick pose deltas)."""
    from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv

    states = {}
    for mode in ("exact", "fast"):
        cfg = EnvConfig(num_agents=1, traffic_flow=True, max_npcs=8,
                        npc_mode=mode)
        env = IntersectionEnv(cfg)
        state, _ = env.reset(jax.random.PRNGKey(0))
        step = jax.jit(env.step)
        T = env.table.traffic_route_ids.shape[0]
        for t in range(40):
            state, out = step(state, jnp.zeros((1, 2)),
                              spawn=(jnp.asarray(t % 8 == 0), jnp.int32((t * 5) % T)))
        states[mode] = state

    a, b = states["exact"], states["fast"]
    assert np.array_equal(np.asarray(a.npc.alive), np.asarray(b.npc.alive))
    am = np.asarray(a.npc.alive)
    np.testing.assert_allclose(np.asarray(a.npc.x)[am], np.asarray(b.npc.x)[am],
                               atol=2.0)
    np.testing.assert_allclose(np.asarray(a.npc.y)[am], np.asarray(b.npc.y)[am],
                               atol=2.0)


@pytest.mark.parametrize("density,steps,seed", [(1.0, 500, 0), (10.0, 400, 3)])
def test_wave_mode_bitwise_equals_serial(density, steps, seed):
    """The conflict-graph wave-scheduled exact mode must be BITWISE identical
    to the reference-shaped serial loop — every pose float, path index, uid
    and alive bit, every tick. Density 10 keeps many NPCs interacting through
    the ghost scan (long dependency chains), the hardest case for the wave
    scheduler's conservative interaction graph."""
    states = {}
    for mode, cleanup in (("exact", "slot"), ("exact", "wave"), ("serial", "slot")):
        cfg = EnvConfig(num_agents=1, traffic_flow=True, traffic_density=density,
                        npc_mode=mode, npc_cleanup=cleanup, max_steps=4000)
        env = IntersectionEnv(cfg)
        state, _ = env.reset(jax.random.PRNGKey(seed))
        step = jax.jit(env.step)
        T = env.table.traffic_route_ids.shape[0]
        rng = np.random.RandomState(seed + 17)
        traj = []
        for t in range(steps):
            do_try = bool(rng.uniform() < 1.0 - np.exp(-density / 60.0)) or (t % 31 == 5)
            state, out = step(state, jnp.asarray([[0.3, 0.0]], np.float32),
                              spawn=(jnp.asarray(do_try), jnp.int32(rng.randint(T))))
            traj.append(jax.tree.map(np.asarray, state.npc))
        states[(mode, cleanup)] = traj

    # both cleanup schedules AND the serial transcription: bitwise identical
    ref = states[("serial", "slot")]
    for key in (("exact", "slot"), ("exact", "wave")):
        for t, (a, b) in enumerate(zip(states[key], ref)):
            for field in a._fields:
                assert np.array_equal(getattr(a, field), getattr(b, field)), (
                    key, t, field, getattr(a, field), getattr(b, field))


@pytest.mark.oracle
def test_config4_eight_agents_dense_traffic():
    """BASELINE config 4 proper: 8 egos + dense traffic in one world (the
    reference C++ core supports it even though its Python wrapper forces
    single-agent under traffic)."""
    routes = [("IN_1", "OUT_7"), ("IN_2", "OUT_8"), ("IN_4", "OUT_7"),
              ("IN_5", "OUT_11"), ("IN_7", "OUT_1"), ("IN_8", "OUT_2"),
              ("IN_10", "OUT_1"), ("IN_11", "OUT_5")]
    steps_with_npcs = _run_traffic_lockstep(1.0, 300, seed=13, routes=routes)
    assert steps_with_npcs > 30
