"""Vector env, models, and PPO learner smoke/behavior tests (CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
from marl_traffic_intersection_tpu.envs.vector import VectorEnv
from marl_traffic_intersection_tpu.models import ActorCriticMLP, SceneTransformerPolicy
from marl_traffic_intersection_tpu.parallel.ppo import PPOConfig, PPOLearner


def test_vector_env_steps_and_autoresets():
    env = IntersectionEnv(EnvConfig(num_agents=2, max_steps=10))
    venv = VectorEnv(env, num_envs=4)
    state, obs = venv.reset(jax.random.PRNGKey(0))
    assert obs.shape == (4, 2, 127)
    step = jax.jit(venv.step)
    for t in range(12):
        state, out = step(state, jnp.zeros((4, 2, 2)))
    # max_steps=10 -> every env truncated and auto-reset at t=9; step_count
    # rolls back to small values
    assert int(np.asarray(state.step_count).max()) <= 10


def test_vector_env_batch_independence():
    """Env 0 stepped alone must equal env 0 stepped in a batch."""
    env = IntersectionEnv(EnvConfig(num_agents=1))
    venv = VectorEnv(env, num_envs=3, auto_reset=False)
    state, obs = venv.reset(jax.random.PRNGKey(1))
    acts = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (3, 1, 2)),
                       jnp.float32)
    state2, out = jax.jit(venv.step)(state, acts)

    single = jax.tree.map(lambda x: x[0], state)
    s2, o2 = jax.jit(env.step)(single, acts[0])
    np.testing.assert_array_equal(np.asarray(out.obs[0]), np.asarray(o2.obs))
    np.testing.assert_array_equal(np.asarray(state2.ego.x[0]), np.asarray(s2.ego.x))


def test_models_forward():
    obs = jnp.zeros((7, 127), jnp.float32)
    for model in (ActorCriticMLP(), SceneTransformerPolicy(dim=128, depth=1)):
        params = model.init(jax.random.PRNGKey(0), obs)
        mean, log_std, value = model.apply(params, obs)
        assert mean.shape == (7, 2) and value.shape == (7,)
        assert mean.dtype == jnp.float32


def test_ppo_train_step_runs_and_improves_value():
    env = IntersectionEnv(EnvConfig(num_agents=2, max_steps=64))
    venv = VectorEnv(env, num_envs=8)
    learner = PPOLearner(venv, ActorCriticMLP(hidden=(64, 64)),
                         PPOConfig(rollout_len=16, num_minibatches=2,
                                   update_epochs=2))
    ts = learner.init(jax.random.PRNGKey(0))
    state, obs = venv.reset(jax.random.PRNGKey(1))
    step = jax.jit(learner.train_step)
    key = jax.random.PRNGKey(2)
    ts, state, obs, key, m1 = step(ts, state, obs, key)
    ts, state, obs, key, m2 = step(ts, state, obs, key)
    assert np.isfinite(float(m2["pg_loss"]))
    assert np.isfinite(float(m2["approx_kl"]))
    assert int(ts.update_count) == 2 * 2 * 2  # 2 steps x epochs x minibatches
