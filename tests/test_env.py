"""Full-env lockstep differential tests vs the reference C++ environment."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
from marl_traffic_intersection_tpu.core.constants import STATUS_NAMES


def _run_lockstep(routes, num_steps, policy, use_team=False, respawn=True,
                  max_steps=2000, obs_atol=2e-5, rew_atol=1e-4, pos_atol=1e-4):
    """Step both envs with identical actions; assert per-step agreement."""
    from .oracle import oracle as O

    n = len(routes)
    cfg = EnvConfig(num_agents=n, use_team_reward=use_team,
                    respawn_enabled=respawn, max_steps=max_steps)
    env = IntersectionEnv(cfg)
    route_ids = env.table.route_ids(routes)
    state, obs = env.reset(jax.random.PRNGKey(0), route_ids)
    step = jax.jit(env.step)

    oenv = O.OracleEnv(num_lanes=3, use_team=use_team, respawn=respawn,
                       max_steps=max_steps)
    oenv.reset(routes)
    ref_obs0 = oenv.get_obs()
    np.testing.assert_allclose(np.asarray(obs), ref_obs0, atol=obs_atol, rtol=0)

    rng = np.random.RandomState(11)
    for t in range(num_steps):
        acts = policy(t, rng, n)
        state, out = step(state, jnp.asarray(acts))
        ref = oenv.step(acts)

        st_mine = [STATUS_NAMES[int(s)] for s in np.asarray(out.status)]
        st_ref = [STATUS_NAMES[int(s)] for s in ref["status"]]
        assert st_mine == st_ref, (t, st_mine, st_ref)
        assert np.array_equal(np.asarray(out.done).astype(int), ref["done"]), t
        assert bool(out.terminated) == ref["terminated"], t
        assert bool(out.truncated) == ref["truncated"], t
        assert int(out.agents_alive) == ref["agents_alive"], t
        np.testing.assert_allclose(np.asarray(out.reward), ref["reward"],
                                   atol=rew_atol, rtol=0, err_msg=f"step {t}")
        # non-lidar obs: tight float tolerance
        mine_obs = np.asarray(out.obs)
        np.testing.assert_allclose(mine_obs[:, :31], ref["obs"][:, :31],
                                   atol=obs_atol, rtol=0, err_msg=f"step {t}")
        # lidar block: discrete k*4/250 readings, bit-exact since the CPU
        # FMA-contraction guards (physics.mul_unfused) pinned sample coords
        # and poses to the reference's separate product rounding
        ldiff = np.abs(mine_obs[:, 31:] - ref["obs"][:, 31:])
        assert (ldiff > 1e-6).sum() == 0, (t, ldiff.max(), (ldiff > 1e-6).sum())

        egos = oenv.egos()
        np.testing.assert_allclose(np.asarray(state.ego.x), egos[:, 0], atol=pos_atol, rtol=0)
        np.testing.assert_allclose(np.asarray(state.ego.y), egos[:, 1], atol=pos_atol, rtol=0)
        assert np.array_equal(np.asarray(state.ego.path_index), egos[:, 5].astype(int)), t


def _policy_cruise(t, rng, n):
    a = np.zeros((n, 2), np.float32)
    a[:, 0] = 0.6
    a[:, 1] = rng.uniform(-0.1, 0.1, n)
    return a


def _policy_random(t, rng, n):
    return np.stack([
        rng.choice([0.0, 0.5, 1.0, -0.5], n),
        np.clip(rng.normal(0, 0.4, n), -1, 1),
    ], axis=1).astype(np.float32)


@pytest.mark.oracle
def test_config1_single_agent_fixed_route():
    """BASELINE config 1: single agent, route IN_6->OUT_2, lidar on."""
    _run_lockstep([("IN_6", "OUT_2")], 400, _policy_cruise)


@pytest.mark.oracle
def test_single_agent_random_actions():
    _run_lockstep([("IN_1", "OUT_7")], 300, _policy_random)


@pytest.mark.oracle
def test_config3_three_agent_team():
    """BASELINE config 3: 3-agent MARL with team reward mixing."""
    _run_lockstep([("IN_6", "OUT_2"), ("IN_1", "OUT_7"), ("IN_4", "OUT_7")],
                  300, _policy_cruise, use_team=True)


@pytest.mark.oracle
def test_multi_agent_collisions_no_respawn():
    """Head-on routes force ego-ego collisions; respawn disabled terminates."""
    _run_lockstep([("IN_1", "OUT_7"), ("IN_7", "OUT_1")], 200, _policy_cruise,
                  respawn=False)


@pytest.mark.oracle
@pytest.mark.slow
def test_config1_full_2000_steps():
    _run_lockstep([("IN_6", "OUT_2")], 2000, _policy_random, max_steps=2000)


@pytest.mark.oracle
def test_eight_agents_respawn():
    routes = [("IN_1", "OUT_7"), ("IN_2", "OUT_8"), ("IN_4", "OUT_7"),
              ("IN_5", "OUT_11"), ("IN_7", "OUT_1"), ("IN_8", "OUT_2"),
              ("IN_10", "OUT_1"), ("IN_11", "OUT_5")]
    _run_lockstep(routes, 250, _policy_random)


def test_snapshot_rollback():
    """EnvState is a value: save -> step -> restore -> identical re-run
    (replaces the reference's get_state/set_state MCTS API)."""
    env = IntersectionEnv(EnvConfig(num_agents=2))
    state, _ = env.reset(jax.random.PRNGKey(0),
                         env.table.route_ids([("IN_6", "OUT_2"), ("IN_1", "OUT_7")]))
    step = jax.jit(env.step)
    snap = state
    acts = jnp.asarray([[0.7, 0.1], [0.5, -0.1]], jnp.float32)
    s1, o1 = step(state, acts)
    s2, o2 = step(snap, acts)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.array_equal(np.asarray(o1.obs), np.asarray(o2.obs))


def test_truncation():
    env = IntersectionEnv(EnvConfig(num_agents=1, max_steps=5))
    state, _ = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for t in range(5):
        state, out = step(state, jnp.zeros((1, 2)))
    assert bool(out.truncated)


@pytest.mark.oracle
def test_two_lane_layout_lockstep():
    """num_lanes=2 world: different road geometry, line mask and routes."""
    from .oracle import oracle as O

    cfg = EnvConfig(num_agents=2, num_lanes=2)
    env = IntersectionEnv(cfg)
    routes = [("IN_1", "OUT_3"), ("IN_6", "OUT_2")]
    state, obs = env.reset(jax.random.PRNGKey(0), env.table.route_ids(routes))
    step = jax.jit(env.step)
    oenv = O.OracleEnv(num_lanes=2)
    oenv.reset(routes)
    np.testing.assert_allclose(np.asarray(obs), oenv.get_obs(), atol=2e-5, rtol=0)

    rng = np.random.RandomState(21)
    for t in range(250):
        acts = _policy_random(t, rng, 2)
        state, out = step(state, jnp.asarray(acts))
        ref = oenv.step(acts)
        assert [int(s) for s in np.asarray(out.status)] == list(ref["status"]), t
        np.testing.assert_allclose(np.asarray(out.reward), ref["reward"],
                                   atol=1e-4, rtol=0, err_msg=str(t))
        np.testing.assert_allclose(np.asarray(out.obs)[:, :31],
                                   ref["obs"][:, :31], atol=2e-5, rtol=0,
                                   err_msg=str(t))


@pytest.mark.oracle
def test_variable_dt_substepping_lockstep():
    """Real-time harnesses substep with varying dt (test.py:144-156); the dt
    semantics (speed update only) must match under arbitrary dt sequences."""
    from .oracle import oracle as O

    env = IntersectionEnv(EnvConfig(num_agents=1))
    routes = [("IN_1", "OUT_7")]
    state, _ = env.reset(jax.random.PRNGKey(0), env.table.route_ids(routes))
    step = jax.jit(env.step)
    oenv = O.OracleEnv(num_lanes=3)
    oenv.reset(routes)
    rng = np.random.RandomState(31)
    for t in range(200):
        dt = np.float32(rng.uniform(0.001, 1.0 / 60.0))
        acts = _policy_random(t, rng, 1)
        state, out = step(state, jnp.asarray(acts), jnp.float32(dt))
        ref = oenv.step(acts, dt=float(dt))
        assert [int(s) for s in np.asarray(out.status)] == list(ref["status"]), t
        np.testing.assert_allclose(np.asarray(out.reward), ref["reward"],
                                   atol=1e-4, rtol=0, err_msg=str(t))
        egos = oenv.egos()
        np.testing.assert_allclose(np.asarray(state.ego.x), egos[:, 0],
                                   atol=5e-3, rtol=0)
