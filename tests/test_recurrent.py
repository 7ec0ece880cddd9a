"""Recurrent (GRU) model family + truncated-BPTT PPO learner (CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
from marl_traffic_intersection_tpu.envs.vector import VectorEnv
from marl_traffic_intersection_tpu.models import RecurrentActorCritic
from marl_traffic_intersection_tpu.models.actor_critic import logp_and_entropy
from marl_traffic_intersection_tpu.parallel.ppo import PPOConfig
from marl_traffic_intersection_tpu.parallel.recurrent_ppo import (
    RecurrentPPOLearner)


def _make(rollout_len=8, num_minibatches=2, num_envs=4, agents=2):
    env = IntersectionEnv(EnvConfig(num_agents=agents, max_steps=32))
    venv = VectorEnv(env, num_envs=num_envs)
    learner = RecurrentPPOLearner(
        venv, RecurrentActorCritic(hidden=64, gru=32),
        PPOConfig(rollout_len=rollout_len, num_minibatches=num_minibatches,
                  update_epochs=2))
    ts = learner.init(jax.random.PRNGKey(0))
    state, obs = venv.reset(jax.random.PRNGKey(1))
    return learner, ts, state, obs


def test_gru_forward_shapes_and_memory():
    model = RecurrentActorCritic(hidden=64, gru=32)
    obs = jax.random.uniform(jax.random.PRNGKey(0), (5, 127))
    h0 = model.initial_hidden(5)
    params = model.init(jax.random.PRNGKey(1), obs, h0)
    mean, log_std, value, h1 = model.apply(params, obs, h0)
    assert mean.shape == (5, 2) and value.shape == (5,) and h1.shape == (5, 32)
    # hidden state actually carries information: same obs, different hidden
    # -> different outputs
    mean2, _, _, _ = model.apply(params, obs, h1)
    assert not np.allclose(np.asarray(mean), np.asarray(mean2))


def test_chunk_replay_matches_rollout():
    """Truncated-BPTT replay from stored entry hiddens must reproduce the
    rollout's action log-probs exactly (same params, pre-update)."""
    learner, ts, state, obs = _make(rollout_len=8, num_minibatches=2)
    h = learner.initial_hidden()
    key = jax.random.PRNGKey(2)
    env_state, obs2, h2, _, traj, last_v = jax.jit(learner._rollout)(
        ts.params, state, obs, h, key)

    T, mb = 8, 2
    chunk = T // mb
    model = learner.model
    for c in range(mb):
        hh = traj.h_in[c * chunk]
        for t in range(chunk):
            i = c * chunk + t
            mean, log_std, value, hh2 = model.apply(ts.params, traj.obs[i], hh)
            logp, _ = logp_and_entropy(mean, log_std, traj.raw_action[i])
            np.testing.assert_allclose(np.asarray(logp),
                                       np.asarray(traj.logp[i]), atol=1e-4)
            np.testing.assert_allclose(np.asarray(value),
                                       np.asarray(traj.value[i]), atol=1e-4)
            hh = hh2 * (1.0 - traj.done[i].astype(jnp.float32))[..., None]


def test_hidden_resets_at_done():
    """Episode truncation must zero the carried hidden for that env."""
    env = IntersectionEnv(EnvConfig(num_agents=1, max_steps=3))
    venv = VectorEnv(env, num_envs=2)
    learner = RecurrentPPOLearner(
        venv, RecurrentActorCritic(hidden=64, gru=32),
        PPOConfig(rollout_len=6, num_minibatches=2, update_epochs=1))
    ts = learner.init(jax.random.PRNGKey(0))
    state, obs = venv.reset(jax.random.PRNGKey(1))
    h = learner.initial_hidden()
    env_state, obs2, h2, _, traj, _ = jax.jit(learner._rollout)(
        ts.params, state, obs, h, jax.random.PRNGKey(2))
    # max_steps=3: every env truncates at steps 3 and 6 of the 6-step rollout
    done = np.asarray(traj.done)
    assert done[2].all()
    # h_in at the step after a done is zero (memory does not leak across lives)
    np.testing.assert_array_equal(np.asarray(traj.h_in[3]),
                                  np.zeros_like(np.asarray(traj.h_in[3])))


def test_recurrent_train_step_runs():
    learner, ts, state, obs = _make()
    h = learner.initial_hidden()
    step = jax.jit(learner.train_step)
    ts, state, obs, h, key, m = step(ts, state, obs, h, jax.random.PRNGKey(3))
    ts, state, obs, h, key, m = step(ts, state, obs, h, key)
    assert np.isfinite(float(m["pg_loss"]))
    assert np.isfinite(float(m["approx_kl"]))
    assert int(ts.update_count) == 2 * 2 * 2


def test_recurrent_train_step_sharded():
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from marl_traffic_intersection_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(n_data=4, n_model=2)
    learner, ts, state, obs = _make(num_envs=8)
    step, shard_ts, shard_env = learner.jit_train_step(mesh, "gru")
    ts = shard_ts(ts)
    state, obs, h = shard_env(state, obs, learner.initial_hidden())
    ts, state, obs, h, key, m = step(ts, state, obs, h, jax.random.PRNGKey(3))
    assert np.isfinite(float(m["pg_loss"]))
