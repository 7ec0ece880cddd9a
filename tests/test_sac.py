"""SAC learner: replay-buffer ring semantics, warmup gating, fused step."""
import jax
import jax.numpy as jnp
import numpy as np

from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
from marl_traffic_intersection_tpu.envs.vector import VectorEnv
from marl_traffic_intersection_tpu.models.sac import (QCritic,
                                                      SquashedGaussianActor,
                                                      sample_squashed)
from marl_traffic_intersection_tpu.parallel.sac import SACConfig, SACLearner


def _learner(num_envs=4, agents=2, **cfg):
    env = IntersectionEnv(EnvConfig(num_agents=agents, max_steps=64))
    venv = VectorEnv(env, num_envs=num_envs)
    defaults = dict(buffer_capacity=64, warmup=16, batch_size=8,
                    steps_per_call=2)
    defaults.update(cfg)
    return SACLearner(venv, SACConfig(**defaults),
                      actor=SquashedGaussianActor(hidden=(32, 32)),
                      critic=QCritic(hidden=(32, 32)))


def test_actor_sample_bounds_and_logp():
    actor = SquashedGaussianActor(hidden=(32, 32))
    obs = jax.random.uniform(jax.random.PRNGKey(0), (5, 127))
    params = actor.init(jax.random.PRNGKey(1), obs)
    mean, log_std = actor.apply(params, obs)
    a, logp = sample_squashed(jax.random.PRNGKey(2), mean, log_std)
    assert a.shape == (5, 2) and logp.shape == (5,)
    assert np.abs(np.asarray(a)).max() < 1.0
    assert np.isfinite(np.asarray(logp)).all()


def test_buffer_ring_wraparound():
    ln = _learner(num_envs=4, agents=2, buffer_capacity=16)  # chunk=8, cap=16
    assert ln.capacity == 16
    ts = ln.init(jax.random.PRNGKey(0))
    buf = ts.buffer
    mk = lambda v: (jnp.full((8, 127), v), jnp.full((8, 2), v),
                    jnp.full((8,), v), jnp.full((8, 127), v), jnp.zeros((8,)))
    for v in (1.0, 2.0, 3.0):  # third insert overwrites slot 0
        buf = ln._insert(buf, *mk(v))
    assert int(buf.size) == 16
    assert int(buf.ptr) == 1
    np.testing.assert_array_equal(np.asarray(buf.reward[:8]), np.full(8, 3.0))
    np.testing.assert_array_equal(np.asarray(buf.reward[8:]), np.full(8, 2.0))


def test_warmup_gates_updates():
    """Before warmup transitions are collected, params must not move."""
    ln = _learner(warmup=10 ** 6)
    ts = ln.init(jax.random.PRNGKey(0))
    venv = ln.env
    state, obs = venv.reset(jax.random.PRNGKey(1))
    step = jax.jit(ln.train_step)
    ts2, *_ = step(ts, state, obs, jax.random.PRNGKey(2))
    a0 = jax.tree.leaves(ts.actor_params)[0]
    a1 = jax.tree.leaves(ts2.actor_params)[0]
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
    q0 = jax.tree.leaves(ts.q_target)[0]
    q1 = jax.tree.leaves(ts2.q_target)[0]
    np.testing.assert_array_equal(np.asarray(q0), np.asarray(q1))


def test_sac_train_step_runs_and_learns_after_warmup():
    ln = _learner(warmup=8, steps_per_call=4)
    ts = ln.init(jax.random.PRNGKey(0))
    state, obs = ln.env.reset(jax.random.PRNGKey(1))
    step = jax.jit(ln.train_step)
    key = jax.random.PRNGKey(2)
    for _ in range(3):
        ts, state, obs, key, m = step(ts, state, obs, key)
    assert np.isfinite(float(m["q_loss"]))
    assert np.isfinite(float(m["actor_loss"]))
    assert float(m["alpha"]) > 0
    assert int(ts.update_count) == 12
    # params moved once past warmup
    ts_fresh = ln.init(jax.random.PRNGKey(0))
    a0 = jax.tree.leaves(ts_fresh.actor_params)[0]
    a1 = jax.tree.leaves(ts.actor_params)[0]
    assert np.abs(np.asarray(a1) - np.asarray(a0)).max() > 0
    # twin critics stay distinct (independent inits, shared target update)
    q = ts.q_params
    leaf = jax.tree.leaves(q)[0]
    assert np.abs(np.asarray(leaf[0]) - np.asarray(leaf[1])).max() > 0


def test_sac_fits_trivial_q():
    """Sanity: with constant rewards the twin-Q means should move toward the
    discounted-return scale rather than diverge."""
    ln = _learner(warmup=8, steps_per_call=8, batch_size=32)
    ts = ln.init(jax.random.PRNGKey(0))
    state, obs = ln.env.reset(jax.random.PRNGKey(1))
    step = jax.jit(ln.train_step)
    key = jax.random.PRNGKey(2)
    for _ in range(6):
        ts, state, obs, key, m = step(ts, state, obs, key)
    assert np.isfinite(float(m["mean_q"]))
    assert float(m["buffer_size"]) > 0


def test_demo_collect_seeds_buffer():
    """collect() fills the ring from an arbitrary policy (train_sac.py --demo
    demonstration seeding) without running gradient updates."""
    ln = _learner(num_envs=4, agents=2, buffer_capacity=128)
    ts = ln.init(jax.random.PRNGKey(0))
    state, obs = ln.env.reset(jax.random.PRNGKey(1))

    policy = lambda k, o: jnp.tanh(jax.random.normal(k, o.shape[:-1] + (2,)))
    import functools
    collect = jax.jit(functools.partial(ln.collect, policy_fn=policy,
                                        steps=3))
    ts2, state, obs, key = collect(ts, state, obs, jax.random.PRNGKey(2))
    seeded = int(ts2.buffer.size)
    assert seeded == 3 * ln.chunk
    assert int(ts2.update_count) == 0
    # inserted obs rows are real observations, not zeros
    assert np.abs(np.asarray(ts2.buffer.obs[:ln.chunk])).sum() > 0
    # training proceeds from the seeded state (ts2 is donated here)
    step = jax.jit(ln.train_step, donate_argnums=(0, 1))
    ts3, *_ = step(ts2, state, obs, jax.random.PRNGKey(3))
    assert int(ts3.buffer.size) > seeded
