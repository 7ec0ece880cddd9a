"""CentralizedActorCritic (MAPPO-style CTDE family): shape/invariance/learner.

The reference ships no training code (SURVEY.md §4); this family is net-new.
These tests pin the CTDE contract: the actor is agent-local (decentralized
execution), the critic is centralized and permutation-invariant over the
agent axis.
"""
import jax
import jax.numpy as jnp
import numpy as np

from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
from marl_traffic_intersection_tpu.envs.vector import VectorEnv
from marl_traffic_intersection_tpu.models import (CentralizedActorCritic,
                                                  make_model)
from marl_traffic_intersection_tpu.parallel.ppo import (PPOConfig, PPOLearner)


def _params_and_obs(n_agents=4, batch=3, seed=0):
    model = CentralizedActorCritic(hidden=(64, 64), embed=32)
    obs = jax.random.uniform(jax.random.PRNGKey(seed), (batch, n_agents, 127))
    params = model.init(jax.random.PRNGKey(1), obs)
    return model, params, obs


def test_forward_shapes_and_dtypes():
    model, params, obs = _params_and_obs()
    mean, log_std, value = model.apply(params, obs)
    assert mean.shape == (3, 4, 2) and value.shape == (3, 4)
    assert mean.dtype == jnp.float32 and value.dtype == jnp.float32
    assert log_std.shape == (2,)


def test_registry_and_agent_axis_flag():
    m = make_model("central")
    assert isinstance(m, CentralizedActorCritic)
    assert getattr(m, "needs_agent_axis") is True


def test_actor_is_agent_local_critic_is_centralized():
    """Perturbing agent j's obs must not move agent i's action (decentralized
    actor) but MUST move agent i's value (centralized critic)."""
    model, params, obs = _params_and_obs()
    mean0, _, val0 = model.apply(params, obs)
    obs2 = obs.at[:, 2, :].add(0.5)
    mean1, _, val1 = model.apply(params, obs2)
    np.testing.assert_array_equal(np.asarray(mean0[:, :2]),
                                  np.asarray(mean1[:, :2]))
    assert np.abs(np.asarray(val1[:, 0] - val0[:, 0])).max() > 0


def test_critic_permutation_invariant():
    """Swapping two agents swaps their values and leaves the pool unchanged."""
    model, params, obs = _params_and_obs()
    perm = jnp.asarray([1, 0, 3, 2])
    _, _, val = model.apply(params, obs)
    _, _, val_p = model.apply(params, obs[:, perm, :])
    np.testing.assert_allclose(np.asarray(val_p), np.asarray(val[:, perm]),
                               rtol=0, atol=1e-6)


def test_param_shapes_agent_count_independent():
    model = CentralizedActorCritic(hidden=(64, 64), embed=32)
    p2 = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 127)))
    p8 = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 127)))
    assert jax.tree.map(jnp.shape, p2) == jax.tree.map(jnp.shape, p8)


def test_mappo_train_step_runs():
    env = IntersectionEnv(EnvConfig(num_agents=2, max_steps=64))
    venv = VectorEnv(env, num_envs=8)
    learner = PPOLearner(venv, CentralizedActorCritic(hidden=(64, 64), embed=32),
                         PPOConfig(rollout_len=16, num_minibatches=2,
                                   update_epochs=2))
    ts = learner.init(jax.random.PRNGKey(0))
    state, obs = venv.reset(jax.random.PRNGKey(1))
    step = jax.jit(learner.train_step)
    key = jax.random.PRNGKey(2)
    ts, state, obs, key, m = step(ts, state, obs, key)
    ts, state, obs, key, m = step(ts, state, obs, key)
    assert np.isfinite(float(m["pg_loss"]))
    assert np.isfinite(float(m["v_loss"]))
    assert int(ts.update_count) == 2 * 2 * 2


def test_mappo_sharded_train_step():
    """Full dp x tp sharded MAPPO step on the virtual 8-device mesh."""
    from marl_traffic_intersection_tpu.parallel.mesh import make_mesh
    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=4, n_model=2)
    env = IntersectionEnv(EnvConfig(num_agents=2, max_steps=32))
    venv = VectorEnv(env, num_envs=8)
    learner = PPOLearner(venv, CentralizedActorCritic(hidden=(128, 128)),
                         PPOConfig(rollout_len=8, num_minibatches=2,
                                   update_epochs=1))
    ts = learner.init(jax.random.PRNGKey(0))
    state, obs = venv.reset(jax.random.PRNGKey(1))
    step, shard_ts, shard_env = learner.jit_train_step(mesh, "central")
    ts = shard_ts(ts)
    state, obs = shard_env(state, obs)
    ts, state, obs, key, m = step(ts, state, obs, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["pg_loss"]))


def test_mlp_actor_transplant_preserves_policy():
    """scripts/warm_start_central.py contract: the central family's actor
    tower shares module names/shapes with the flagship mlp, so a trained mlp
    actor transplants into a central init without changing the policy."""
    from marl_traffic_intersection_tpu.models import ActorCriticMLP

    obs = jax.random.uniform(jax.random.PRNGKey(0), (5, 3, 127))
    mlp = ActorCriticMLP()
    mlp_params = mlp.init(jax.random.PRNGKey(1), obs[0])
    central = CentralizedActorCritic()
    params = jax.device_get(central.init(jax.random.PRNGKey(2), obs))
    for k in list(params["params"]):
        if k.startswith("torso_") or k in ("pi_mean", "log_std"):
            params["params"][k] = mlp_params["params"][k]

    m_ref, ls_ref, _ = mlp.apply(mlp_params, obs)
    m_new, ls_new, _ = central.apply(params, obs)
    np.testing.assert_array_equal(np.asarray(m_ref), np.asarray(m_new))
    np.testing.assert_array_equal(np.asarray(ls_ref), np.asarray(ls_new))


def test_critic_warmup_freezes_actor():
    """PPOConfig.critic_warmup masks the actor loss for the first K updates:
    the central family's actor tower is disjoint from its critic tower, so the
    policy must be bit-unchanged during warmup, then start moving."""
    env = IntersectionEnv(EnvConfig(num_agents=2, max_steps=64))
    venv = VectorEnv(env, num_envs=4)
    model = CentralizedActorCritic(hidden=(32, 32), embed=16)
    learner = PPOLearner(venv, model,
                         PPOConfig(rollout_len=8, num_minibatches=2,
                                   update_epochs=2, critic_warmup=1))
    ts = learner.init(jax.random.PRNGKey(0))
    state, obs = venv.reset(jax.random.PRNGKey(1))
    step = jax.jit(learner.train_step)

    p0 = jax.device_get(ts.params)
    ts1, state, obs, key, _ = step(ts, state, obs, jax.random.PRNGKey(2))
    p1 = jax.device_get(ts1.params)
    np.testing.assert_array_equal(p0["params"]["pi_mean"]["kernel"],
                                  p1["params"]["pi_mean"]["kernel"])
    np.testing.assert_array_equal(p0["params"]["torso_0"]["kernel"],
                                  p1["params"]["torso_0"]["kernel"])
    assert not np.array_equal(p0["params"]["critic_embed"]["kernel"],
                              p1["params"]["critic_embed"]["kernel"])

    ts2, *_ = step(ts1, state, obs, key)
    p2 = jax.device_get(ts2.params)
    assert not np.array_equal(p1["params"]["pi_mean"]["kernel"],
                              p2["params"]["pi_mean"]["kernel"])
