"""Native C++ host engine: lockstep cross-validation vs the JAX core."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
from marl_traffic_intersection_tpu.native import NativeEngine, native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native engine build unavailable")


def test_route_tables_match():
    env = IntersectionEnv(EnvConfig())
    nat = NativeEngine()
    nat.reset([0])
    ref = nat.route_table()
    np.testing.assert_allclose(env.table.paths, ref, atol=1e-4, rtol=0)


def _lockstep(routes, steps, policy, traffic=False, use_team=False,
              respawn=True, seed=0):
    n = len(routes)
    cfg = EnvConfig(num_agents=n, traffic_flow=traffic, use_team_reward=use_team,
                    respawn_enabled=respawn, max_steps=4000)
    env = IntersectionEnv(cfg)
    rids = env.table.route_ids(routes)
    state, obs = env.reset(jax.random.PRNGKey(seed), rids)
    step = jax.jit(env.step)

    nat = NativeEngine(use_team=use_team, respawn=respawn, max_steps=4000,
                       traffic=traffic, seed=seed)
    nat.reset([int(r) for r in rids])

    rng = np.random.RandomState(seed + 9)
    T = env.table.traffic_route_ids.shape[0]
    for t in range(steps):
        acts = policy(t, rng, n)
        if traffic:
            do_try = bool(rng.uniform() < 0.2) or (t % 25 == 3)
            rc = int(rng.randint(T))
            state, out = step(state, jnp.asarray(acts),
                              spawn=(jnp.asarray(do_try), jnp.int32(rc)))
            ref = nat.step(acts, spawn=(do_try, rc))
        else:
            state, out = step(state, jnp.asarray(acts))
            ref = nat.step(acts)

        assert np.array_equal(np.asarray(out.status), ref["status"]), t
        assert np.array_equal(np.asarray(out.done).astype(np.int32), ref["done"]), t
        assert bool(out.terminated) == ref["terminated"], t
        assert bool(out.truncated) == ref["truncated"], t
        np.testing.assert_allclose(np.asarray(out.reward), ref["reward"],
                                   atol=1e-4, rtol=0, err_msg=str(t))
        mine = np.asarray(out.obs)
        np.testing.assert_allclose(mine[:, :31], ref["obs"][:, :31], atol=5e-5,
                                   rtol=0, err_msg=str(t))
        ldiff = np.abs(mine[:, 31:] - ref["obs"][:, 31:])
        assert (ldiff > 8.0 / 250.0 + 1e-6).sum() == 0, (t, ldiff.max())

        if traffic:
            refn = nat.npcs()
            alive = np.asarray(state.npc.alive)
            uid = np.asarray(state.npc.uid)
            idx = np.nonzero(alive)[0]
            idx = idx[np.argsort(uid[idx])]
            assert len(idx) == refn.shape[0], t
            if len(idx):
                np.testing.assert_allclose(np.asarray(state.npc.x)[idx],
                                           refn[:, 0], atol=5e-3, rtol=0)
                assert np.array_equal(np.asarray(state.npc.path_index)[idx],
                                      refn[:, 4].astype(int)), t


def _pol(t, rng, n):
    return np.stack([rng.choice([0.0, 0.5, 1.0, -0.5], n),
                     np.clip(rng.normal(0, 0.4, n), -1, 1)], axis=1).astype(np.float32)


def test_native_gym_reset_obs_from_native_engine():
    """backend='native' reset() must return the NATIVE engine's own first
    observation (reference env.py:147-161), in agreement with the JAX
    backend's — one engine answering the whole API, not two (round-1 review
    finding: native reset previously returned JAX-built obs)."""
    from marl_traffic_intersection_tpu.envs.gym import GymIntersectionEnv

    cfg = {"num_agents": 3, "seed": 7}
    nat = GymIntersectionEnv({**cfg, "backend": "native"})
    jx = GymIntersectionEnv({**cfg, "backend": "jax"})
    for trial in range(3):
        obs_n, _ = nat.reset(seed=trial)
        obs_j, _ = jx.reset(seed=trial)
        assert obs_n.shape == obs_j.shape == (3, 127)
        np.testing.assert_allclose(obs_n[:, :31], obs_j[:, :31], atol=5e-5, rtol=0)
        # reset-time lidar is the init all-max contract on both engines
        np.testing.assert_allclose(obs_n[:, 31:], obs_j[:, 31:], atol=1e-6, rtol=0)
        # and the next step continues in lockstep from that reset
        acts = np.tile(np.float32([0.5, 0.1]), (3, 1))
        on = nat.step(acts)[0]
        oj = jx.step(acts)[0]
        np.testing.assert_allclose(on[:, :31], oj[:, :31], atol=5e-5, rtol=0)


def test_native_vs_jax_single_agent():
    _lockstep([("IN_6", "OUT_2")], 400, _pol)


def test_native_vs_jax_multi_agent_team():
    _lockstep([("IN_1", "OUT_7"), ("IN_7", "OUT_1"), ("IN_4", "OUT_7")], 250,
              _pol, use_team=True)


def test_native_vs_jax_traffic():
    _lockstep([("IN_6", "OUT_2")], 300, _pol, traffic=True)


def test_native_latency_sane():
    import time
    nat = NativeEngine()
    nat.reset([61])
    a = np.zeros((1, 2), np.float32)
    nat.step(a)
    t0 = time.perf_counter()
    for _ in range(2000):
        nat.step(a)
    per = (time.perf_counter() - t0) / 2000
    assert per < 2e-3  # well under a device round-trip
