"""Multi-device sharding tests on the virtual 8-CPU-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
from marl_traffic_intersection_tpu.envs.vector import VectorEnv
from marl_traffic_intersection_tpu.models import ActorCriticMLP
from marl_traffic_intersection_tpu.parallel.mesh import (
    data_sharding, make_hybrid_mesh, make_mesh, param_shardings,
    shard_batch_tree)
from marl_traffic_intersection_tpu.parallel.ppo import PPOConfig, PPOLearner

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_sharded_env_batch_step():
    """Env batch sharded over the data axis steps under jit with no host sync."""
    mesh = make_mesh(n_data=8, n_model=1)
    env = IntersectionEnv(EnvConfig(num_agents=2))
    venv = VectorEnv(env, num_envs=16, auto_reset=False)
    state, obs = venv.reset(jax.random.PRNGKey(0))
    state = shard_batch_tree(mesh, state)

    step = jax.jit(venv.step)
    state2, out = step(state, jnp.zeros((16, 2, 2)))
    assert out.obs.shape == (16, 2, 127)
    # leading axis stays sharded over the 8 devices
    assert len(state2.ego.x.sharding.device_set) == 8

    # sharded result equals unsharded single-device result
    state_r, _ = venv.reset(jax.random.PRNGKey(0))
    _, out_r = step(state_r, jnp.zeros((16, 2, 2)))
    np.testing.assert_array_equal(np.asarray(out.obs), np.asarray(out_r.obs))


@pytest.mark.slow
def test_sharded_traffic_env_step_bitwise():
    """TRAFFIC-mode sharded step (VERDICT r3 task 1): the mesh-bound
    VectorEnv steps under shard_map with per-device tier conds. Each device
    reduces the tier predicate over its own 2-env shard, so devices can
    (and do) pick different tier branches in the same tick — results must
    still be bitwise equal to the unmeshed single-program batch, because
    every branch is bitwise equal to the full-width program."""
    mesh = make_mesh(n_data=8, n_model=1)
    env = IntersectionEnv(EnvConfig(num_agents=2, traffic_flow=True,
                                    traffic_density=4.0, max_npcs=12,
                                    max_steps=10 ** 6))
    venv = VectorEnv(env, num_envs=16, auto_reset=True, mesh=mesh)
    venv0 = VectorEnv(env, num_envs=16, auto_reset=True)
    state, _ = jax.jit(venv.reset)(jax.random.PRNGKey(3))
    state0 = jax.tree.map(jnp.copy, state)
    state = shard_batch_tree(mesh, state)
    step_m, step_u = jax.jit(venv.step), jax.jit(venv0.step)
    rng = np.random.RandomState(9)
    for t in range(60):
        acts = jnp.asarray(rng.uniform(-1, 1, (16, 2, 2)), jnp.float32)
        state, out_m = step_m(state, acts)
        state0, out_u = step_u(state0, acts)
    assert len(state.ego.x.sharding.device_set) == 8
    for (path, x), y in zip(
            jax.tree_util.tree_leaves_with_path(jax.tree.map(np.asarray, (state, out_m))),
            jax.tree.leaves(jax.tree.map(np.asarray, (state0, out_u)))):
        assert np.array_equal(x, y, equal_nan=True), jax.tree_util.keystr(path)


def test_tp_param_shardings():
    mesh = make_mesh(n_data=4, n_model=2)
    model = ActorCriticMLP(hidden=(128, 128))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 127)))
    shardings = param_shardings(mesh, params, "mlp")
    k0 = shardings["params"]["torso_0"]["kernel"].spec
    k1 = shardings["params"]["torso_1"]["kernel"].spec
    assert tuple(k0) == (None, "model")
    assert tuple(k1) == ("model", None)
    # forward under mesh sharding matches replicated forward
    sharded = jax.tree.map(jax.device_put, params, shardings)
    obs = jnp.ones((4, 127))
    out_a = jax.jit(model.apply)(sharded, obs)
    out_b = jax.jit(model.apply)(params, obs)
    np.testing.assert_allclose(np.asarray(out_a[0]), np.asarray(out_b[0]),
                               atol=1e-5)


def test_hybrid_mesh_train_step():
    """3-axis (replica, data, model) hybrid mesh: on CPU there is a single
    'slice', so the replica axis is size 1, but the full multi-slice sharding
    path (batch over ('replica','data')) compiles and runs."""
    mesh = make_hybrid_mesh(n_model=2)
    assert mesh.axis_names == ("replica", "data", "model")
    assert mesh.shape["replica"] == 1 and mesh.shape["data"] == 4

    env = IntersectionEnv(EnvConfig(num_agents=2, max_steps=32))
    venv = VectorEnv(env, num_envs=8)
    learner = PPOLearner(venv, ActorCriticMLP(hidden=(128, 128)),
                         PPOConfig(rollout_len=8, num_minibatches=2,
                                   update_epochs=1))
    ts = learner.init(jax.random.PRNGKey(0))
    state, obs = venv.reset(jax.random.PRNGKey(1))

    step, shard_ts, shard_env = learner.jit_train_step(mesh, "mlp")
    ts = shard_ts(ts)
    state, obs = shard_env(state, obs)
    ts, state, obs, key, metrics = step(ts, state, obs, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["pg_loss"]))


@pytest.mark.parametrize("tp", [1, 2])
def test_sac_train_step_dp_tp(tp):
    """SAC sharded train step (VERDICT r2 task 5): HBM replay ring sharded
    over 'data', twin-Q params TP-split behind the twin axis ('sac_q' rule),
    dp x tp mesh. Compiles, runs, finite losses, ring stays sharded."""
    from marl_traffic_intersection_tpu.parallel.sac import SACConfig, SACLearner

    mesh = make_mesh(n_data=8 // tp, n_model=tp)
    env = IntersectionEnv(EnvConfig(num_agents=2, max_steps=32))
    venv = VectorEnv(env, num_envs=8)
    learner = SACLearner(venv, SACConfig(batch_size=32, buffer_capacity=1024,
                                         warmup=16, steps_per_call=4))
    ts = learner.init(jax.random.PRNGKey(0))
    state, obs = venv.reset(jax.random.PRNGKey(1))

    step, shard_ts, shard_env = learner.jit_train_step(mesh)
    ts = shard_ts(ts)
    if tp == 2:
        # the twin-stacked torso_1 kernel really is TP-split on its input dim
        spec = ts.q_params["params"]["torso_1"]["kernel"].sharding.spec
        assert tuple(spec) == (None, "model", None)
    state, obs = shard_env(state, obs)
    ts, state, obs, key, metrics = step(ts, state, obs, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["q_loss"]))
    assert np.isfinite(float(metrics["actor_loss"]))
    # replay ring rows remain spread over every device after the update
    assert len(ts.buffer.obs.sharding.device_set) == 8


def test_full_train_step_dp_tp():
    """dp=4 x tp=2 PPO train step on tiny shapes: compiles and runs."""
    mesh = make_mesh(n_data=4, n_model=2)
    env = IntersectionEnv(EnvConfig(num_agents=2, max_steps=32))
    venv = VectorEnv(env, num_envs=8)
    learner = PPOLearner(venv, ActorCriticMLP(hidden=(128, 128)),
                         PPOConfig(rollout_len=8, num_minibatches=2,
                                   update_epochs=1))
    ts = learner.init(jax.random.PRNGKey(0))
    state, obs = venv.reset(jax.random.PRNGKey(1))

    step, shard_ts, shard_env = learner.jit_train_step(mesh, "mlp")
    ts = shard_ts(ts)
    state, obs = shard_env(state, obs)
    ts, state, obs, key, metrics = step(ts, state, obs, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["pg_loss"]))
    assert np.isfinite(float(metrics["mean_reward"]))


def test_full_train_step_dp_tp_traffic():
    """dp=4 x tp=2 PPO train step on a TRAFFIC env (VERDICT r4 task 6):
    jit_train_step rebinds the venv to the mesh, so the rollout's NPC tier
    predicates are shard-local under shard_map; compiles and runs."""
    mesh = make_mesh(n_data=4, n_model=2)
    env = IntersectionEnv(EnvConfig(num_agents=2, max_steps=32,
                                    traffic_flow=True, traffic_density=1.0,
                                    max_npcs=8))
    venv = VectorEnv(env, num_envs=8)
    learner = PPOLearner(venv, ActorCriticMLP(hidden=(64, 64)),
                         PPOConfig(rollout_len=4, num_minibatches=2,
                                   update_epochs=1))
    ts = learner.init(jax.random.PRNGKey(0))

    step, shard_ts, shard_env = learner.jit_train_step(mesh, "mlp")
    assert learner.env.mesh is mesh
    state, obs = learner.env.reset(jax.random.PRNGKey(1))
    ts = shard_ts(ts)
    state, obs = shard_env(state, obs)
    ts, state, obs, key, metrics = step(ts, state, obs, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["pg_loss"]))
    assert np.isfinite(float(metrics["mean_reward"]))
