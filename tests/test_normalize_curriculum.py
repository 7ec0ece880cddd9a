"""Reward-normalization wrapper, conv model family, curriculum parser,
and the donating eager step (CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
from marl_traffic_intersection_tpu.envs.normalize import RewardNormVecEnv
from marl_traffic_intersection_tpu.envs.vector import VectorEnv
from marl_traffic_intersection_tpu.models import LidarConvPolicy, make_model
from marl_traffic_intersection_tpu.parallel.ppo import PPOConfig, PPOLearner


def _drive(venv, state, steps, acts):
    step = jax.jit(venv.step)
    outs = []
    for _ in range(steps):
        state, out = step(state, acts)
        outs.append(out)
    return state, outs


def test_reward_norm_passthrough_and_scale():
    """Statuses/obs/dones pass through; after warmup rewards are the raw
    rewards multiplied by the per-env running return scale (bounded, finite)."""
    env = IntersectionEnv(EnvConfig(num_agents=2, max_steps=500))
    venv = VectorEnv(env, num_envs=4)
    nenv = RewardNormVecEnv(venv, warmup=16)

    state_r, obs_r = venv.reset(jax.random.PRNGKey(0))
    state_n, obs_n = nenv.reset(jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(obs_r), np.asarray(obs_n))

    acts = jnp.full((4, 2, 2), 0.3, jnp.float32)
    state_r, outs_r = _drive(venv, state_r, 40, acts)
    state_n, outs_n = _drive(nenv, state_n, 40, acts)

    for o_r, o_n in zip(outs_r, outs_n):
        np.testing.assert_array_equal(np.asarray(o_r.obs), np.asarray(o_n.obs))
        np.testing.assert_array_equal(np.asarray(o_r.status),
                                      np.asarray(o_n.status))
        np.testing.assert_array_equal(np.asarray(o_r.done), np.asarray(o_n.done))
    # identical before warmup (16 samples = 8 ticks at N=2)
    np.testing.assert_allclose(np.asarray(outs_r[0].reward),
                               np.asarray(outs_n[0].reward))
    # scaled (not equal, same sign) after warmup
    late_r = np.asarray(outs_r[-1].reward)
    late_n = np.asarray(outs_n[-1].reward)
    assert np.all(np.isfinite(late_n)) and np.all(np.abs(late_n) <= 10.0)
    nz = np.abs(late_r) > 1e-9
    assert np.any(nz)
    assert np.all(np.sign(late_n[nz]) == np.sign(late_r[nz]))
    # running stats actually accumulated
    assert float(np.asarray(state_n.count).min()) == 80.0


def test_reward_norm_trains_under_ppo():
    env = IntersectionEnv(EnvConfig(num_agents=2, max_steps=64))
    venv = RewardNormVecEnv(VectorEnv(env, num_envs=8), warmup=8)
    learner = PPOLearner(venv, make_model("mlp"),
                         PPOConfig(rollout_len=16, num_minibatches=2,
                                   update_epochs=2))
    ts = learner.init(jax.random.PRNGKey(0))
    state, obs = venv.reset(jax.random.PRNGKey(1))
    step = jax.jit(learner.train_step)
    ts, state, obs, key, m = step(ts, state, obs, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["pg_loss"]))
    assert np.isfinite(float(m["v_loss"]))


def test_reward_norm_trains_under_ppo_with_mesh():
    """Regression: jit_train_step(mesh) rebinds via env.mesh/with_mesh, which
    RewardNormVecEnv must forward to its inner VectorEnv (ADVICE r4)."""
    import pytest as _pytest
    if len(jax.devices()) < 8:
        _pytest.skip("needs 8 virtual devices")
    from marl_traffic_intersection_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=8, n_model=1)
    env = IntersectionEnv(EnvConfig(num_agents=2, max_steps=64))
    venv = RewardNormVecEnv(VectorEnv(env, num_envs=8), warmup=8)
    learner = PPOLearner(venv, make_model("mlp"),
                         PPOConfig(rollout_len=8, num_minibatches=2,
                                   update_epochs=1))
    ts = learner.init(jax.random.PRNGKey(0))
    step, shard_ts, shard_env = learner.jit_train_step(mesh)
    assert learner.env.mesh is mesh          # wrapper forwarded the rebind
    assert learner.env.venv.mesh is mesh
    state, obs = learner.env.reset(jax.random.PRNGKey(1))
    ts = shard_ts(ts)
    # NormState wraps the env pytree; shard the whole thing B-leading
    state, obs = shard_env(state, obs)
    ts, state, obs, key, m = step(ts, state, obs, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["pg_loss"]))


def test_conv_model_forward_and_ring_equivariance():
    obs = jax.random.uniform(jax.random.PRNGKey(0), (5, 127))
    model = LidarConvPolicy()
    params = model.init(jax.random.PRNGKey(1), obs)
    mean, log_std, value = model.apply(params, obs)
    assert mean.shape == (5, 2) and value.shape == (5,)
    assert mean.dtype == jnp.float32
    # batched leading dims reshape like the other families
    obs3 = obs.reshape(5, 1, 127)
    mean3, _, value3 = model.apply(params, obs3)
    np.testing.assert_allclose(np.asarray(mean3[:, 0]), np.asarray(mean),
                               atol=1e-6)
    assert value3.shape == (5, 1)


def test_make_model_registry():
    import pytest
    for kind in ("mlp", "attention", "conv"):
        m = make_model(kind)
        obs = jnp.zeros((3, 127), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), obs)
        mean, _, _ = m.apply(params, obs)
        assert mean.shape == (3, 2)
    with pytest.raises(ValueError):
        make_model("nope")


def test_conv_ppo_smoke():
    env = IntersectionEnv(EnvConfig(num_agents=1, max_steps=32))
    venv = VectorEnv(env, num_envs=4)
    learner = PPOLearner(venv, LidarConvPolicy(channels=(8, 16), hidden=64),
                         PPOConfig(rollout_len=8, num_minibatches=2,
                                   update_epochs=1))
    ts = learner.init(jax.random.PRNGKey(0))
    state, obs = venv.reset(jax.random.PRNGKey(1))
    ts, state, obs, key, m = jax.jit(learner.train_step)(
        ts, state, obs, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["pg_loss"]))


def test_jit_step_donation_matches_undonated():
    env = IntersectionEnv(EnvConfig(num_agents=2))
    venv = VectorEnv(env, num_envs=4)
    state_a, _ = venv.reset(jax.random.PRNGKey(3))
    state_b, _ = venv.reset(jax.random.PRNGKey(3))
    acts = jnp.full((4, 2, 2), 0.25, jnp.float32)
    step_d = venv.jit_step(donate=True)
    step_p = venv.jit_step(donate=False)
    for _ in range(5):
        state_a, out_a = step_d(state_a, acts)
        state_b, out_b = step_p(state_b, acts)
    np.testing.assert_array_equal(np.asarray(out_a.obs), np.asarray(out_b.obs))
    np.testing.assert_array_equal(np.asarray(state_a.ego.x),
                                  np.asarray(state_b.ego.x))


def test_curriculum_parser():
    import pytest

    from train import parse_curriculum
    stages = parse_curriculum("agents=1@40;agents=2,ent_coef=0.005@40;"
                              "agents=4,density=1.0,traffic=1@80")
    assert stages == [
        ({"agents": 1}, 40),
        ({"agents": 2, "ent_coef": 0.005}, 40),
        ({"agents": 4, "density": 1.0, "traffic": True}, 80),
    ]
    with pytest.raises(ValueError):
        parse_curriculum("agents=1")
    with pytest.raises(ValueError):
        parse_curriculum("bogus=3@10")
