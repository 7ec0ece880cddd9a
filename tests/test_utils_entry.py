"""Checkpointing, road-mask parity, and driver entry-point tests."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_road_mask_parity():
    from marl_traffic_intersection_tpu.core.geometry import (
        is_obstacle_pixel, road_obstacle_mask)
    for lanes in (2, 3):
        grid = road_obstacle_mask(lanes)
        ys, xs = np.mgrid[0:750, 0:750]
        got = np.asarray(is_obstacle_pixel(xs.astype(np.int32),
                                           ys.astype(np.int32), lanes))
        assert np.array_equal(got, grid.astype(bool))


def test_checkpoint_roundtrip(tmp_path):
    from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
    from marl_traffic_intersection_tpu.utils.checkpoint import (
        restore_checkpoint, save_checkpoint)

    env = IntersectionEnv(EnvConfig(num_agents=2))
    state, _ = env.reset(jax.random.PRNGKey(0))
    state, out = jax.jit(env.step)(state, jnp.zeros((2, 2)))
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)
    restored = restore_checkpoint(path, template=jax.device_get(state))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored state steps identically
    s1, o1 = jax.jit(env.step)(state, jnp.zeros((2, 2)))
    s2, o2 = jax.jit(env.step)(jax.tree.map(jnp.asarray, restored), jnp.zeros((2, 2)))
    np.testing.assert_array_equal(np.asarray(o1.obs), np.asarray(o2.obs))


def test_graft_entry():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (4096, 2)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_train_state_checkpoint_resume_structure(tmp_path):
    """Full TrainState (params + optax opt_state) must survive a checkpoint
    round-trip with structure intact (regression: orbax returns plain dicts
    without a template, breaking adam state access on resume)."""
    import jax.numpy as jnp
    from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
    from marl_traffic_intersection_tpu.envs.vector import VectorEnv
    from marl_traffic_intersection_tpu.models import ActorCriticMLP
    from marl_traffic_intersection_tpu.parallel.ppo import PPOConfig, PPOLearner
    from marl_traffic_intersection_tpu.utils.checkpoint import (
        restore_checkpoint, save_checkpoint)

    env = IntersectionEnv(EnvConfig(num_agents=1, max_steps=16))
    venv = VectorEnv(env, num_envs=2)
    learner = PPOLearner(venv, ActorCriticMLP(hidden=(32, 32)),
                         PPOConfig(rollout_len=4, num_minibatches=2,
                                   update_epochs=1))
    ts = learner.init(jax.random.PRNGKey(0))
    state, obs = venv.reset(jax.random.PRNGKey(1))
    step = jax.jit(learner.train_step)
    ts, state, obs, key, _ = step(ts, state, obs, jax.random.PRNGKey(2))

    path = str(tmp_path / "ts")
    save_checkpoint(path, {"params": ts.params, "opt_state": ts.opt_state,
                           "update": 1})
    template = {"params": jax.device_get(ts.params),
                "opt_state": jax.device_get(ts.opt_state), "update": 0}
    ck = restore_checkpoint(path, template=template)
    ts2 = ts._replace(params=ck["params"], opt_state=ck["opt_state"])
    # structures must match and a further train step must run
    assert jax.tree.structure(ts2.opt_state) == jax.tree.structure(ts.opt_state)
    step(ts2, state, obs, key)


def test_shipped_policy_artifact_solves_config1():
    """The committed checkpoint must solve config 1 deterministically."""
    import pathlib
    import jax.numpy as jnp
    from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
    from marl_traffic_intersection_tpu.core.constants import STATUS_SUCCESS
    from marl_traffic_intersection_tpu.models import ActorCriticMLP
    from marl_traffic_intersection_tpu.utils.checkpoint import restore_checkpoint

    art = pathlib.Path(__file__).resolve().parent.parent / "artifacts" / "policy_mlp_cfg1"
    if not art.exists():
        pytest.skip("no artifact")
    params = restore_checkpoint(str(art))["params"]
    model = ActorCriticMLP()

    env = IntersectionEnv(EnvConfig(num_agents=1, max_steps=400))
    state, obs = env.reset(jax.random.PRNGKey(7),
                           env.table.route_ids([("IN_6", "OUT_2")]))
    step = jax.jit(env.step)
    fwd = jax.jit(model.apply)
    for t in range(400):
        mean, _, _ = fwd(params, obs)
        state, out = step(state, jnp.tanh(mean))
        obs = out.obs
        if bool(out.terminated):
            break
    assert bool(out.terminated), "did not finish the route"
    assert int(out.status[0]) == STATUS_SUCCESS
    assert t < 200, t


def test_shipped_multiagent_artifact_solves_config1_and_runs_config4():
    """The collision-tuned checkpoint must keep solving config 1; on a short
    config-4 (8 egos + traffic) horizon it must complete routes."""
    import pathlib
    import numpy as np
    import jax.numpy as jnp
    from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
    from marl_traffic_intersection_tpu.core.constants import STATUS_SUCCESS
    from marl_traffic_intersection_tpu.core.routes import default_ego_routes
    from marl_traffic_intersection_tpu.models import ActorCriticMLP
    from marl_traffic_intersection_tpu.utils.checkpoint import restore_checkpoint

    art = pathlib.Path(__file__).resolve().parent.parent / "artifacts" / "policy_mlp_multi"
    if not art.exists():
        pytest.skip("no artifact")
    params = restore_checkpoint(str(art))["params"]
    model = ActorCriticMLP()
    fwd = jax.jit(model.apply)

    env = IntersectionEnv(EnvConfig(num_agents=1, max_steps=400))
    state, obs = env.reset(jax.random.PRNGKey(7),
                           env.table.route_ids([("IN_6", "OUT_2")]))
    step = jax.jit(env.step)
    for t in range(400):
        mean, _, _ = fwd(params, obs)
        state, out = step(state, jnp.tanh(mean))
        obs = out.obs
        if bool(out.terminated):
            break
    assert bool(out.terminated) and int(out.status[0]) == STATUS_SUCCESS
    assert t < 200, t

    env4 = IntersectionEnv(EnvConfig(num_agents=8, traffic_flow=True,
                                     traffic_density=1.0, max_steps=400))
    rids = env4.table.route_ids(default_ego_routes(8, 3))
    state, obs = env4.reset(jax.random.PRNGKey(11), rids)
    step4 = jax.jit(env4.step)
    prev = np.zeros(8, np.int32)
    successes = 0
    for t in range(300):
        mean, _, _ = fwd(params, obs)
        state, out = step4(state, jnp.tanh(mean))
        obs = out.obs
        st = np.asarray(out.status)
        successes += int(((st == STATUS_SUCCESS) & (prev != STATUS_SUCCESS)).sum())
        prev = st
    assert successes >= 4, successes  # several route completions in 300 steps


def test_shipped_attention_artifact_solves_config1():
    """The committed attention-family checkpoint must solve config 1."""
    import pathlib
    import jax.numpy as jnp
    from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
    from marl_traffic_intersection_tpu.core.constants import STATUS_SUCCESS
    from marl_traffic_intersection_tpu.models import SceneTransformerPolicy
    from marl_traffic_intersection_tpu.utils.checkpoint import restore_checkpoint

    art = pathlib.Path(__file__).resolve().parent.parent / "artifacts" / "policy_attn_cfg1"
    if not art.exists():
        pytest.skip("no artifact")
    params = restore_checkpoint(str(art))["params"]
    model = SceneTransformerPolicy()
    fwd = jax.jit(model.apply)

    env = IntersectionEnv(EnvConfig(num_agents=1, max_steps=400))
    state, obs = env.reset(jax.random.PRNGKey(7),
                           env.table.route_ids([("IN_6", "OUT_2")]))
    step = jax.jit(env.step)
    for t in range(400):
        mean, _, _ = fwd(params, obs)
        state, out = step(state, jnp.tanh(mean))
        obs = out.obs
        if bool(out.terminated):
            break
    assert bool(out.terminated) and int(out.status[0]) == STATUS_SUCCESS
    assert t < 200, t


def test_shipped_gru_artifact_solves_config1():
    """The committed recurrent-family checkpoint must solve config 1."""
    import pathlib
    import jax.numpy as jnp
    from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
    from marl_traffic_intersection_tpu.core.constants import STATUS_SUCCESS
    from marl_traffic_intersection_tpu.models import RecurrentActorCritic
    from marl_traffic_intersection_tpu.utils.checkpoint import restore_checkpoint

    art = pathlib.Path(__file__).resolve().parent.parent / "artifacts" / "policy_gru_cfg1"
    if not art.exists():
        pytest.skip("no artifact")
    params = restore_checkpoint(str(art))["params"]
    model = RecurrentActorCritic()
    fwd = jax.jit(model.apply)

    env = IntersectionEnv(EnvConfig(num_agents=1, max_steps=400))
    state, obs = env.reset(jax.random.PRNGKey(7),
                           env.table.route_ids([("IN_6", "OUT_2")]))
    h = model.initial_hidden(1)
    step = jax.jit(env.step)
    for t in range(400):
        mean, _, _, h = fwd(params, obs, h)
        state, out = step(state, jnp.tanh(mean))
        obs = out.obs
        if bool(out.terminated):
            break
    assert bool(out.terminated) and int(out.status[0]) == STATUS_SUCCESS
    assert t < 200, t


def test_shipped_conv_artifact_solves_config1():
    """The committed conv-family checkpoint must solve config 1."""
    import pathlib
    import jax.numpy as jnp
    from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
    from marl_traffic_intersection_tpu.core.constants import STATUS_SUCCESS
    from marl_traffic_intersection_tpu.models import LidarConvPolicy
    from marl_traffic_intersection_tpu.utils.checkpoint import restore_checkpoint

    art = pathlib.Path(__file__).resolve().parent.parent / "artifacts" / "policy_conv_cfg1"
    if not art.exists():
        pytest.skip("no artifact")
    params = restore_checkpoint(str(art))["params"]
    model = LidarConvPolicy()
    fwd = jax.jit(model.apply)

    env = IntersectionEnv(EnvConfig(num_agents=1, max_steps=400))
    state, obs = env.reset(jax.random.PRNGKey(7),
                           env.table.route_ids([("IN_6", "OUT_2")]))
    step = jax.jit(env.step)
    for t in range(400):
        mean, _, _ = fwd(params, obs)
        state, out = step(state, jnp.tanh(mean))
        obs = out.obs
        if bool(out.terminated):
            break
    assert bool(out.terminated) and int(out.status[0]) == STATUS_SUCCESS
    assert t < 200, t


def test_shipped_central_artifact_solves_config1():
    """The MAPPO (central) checkpoint deploys agent-locally and must solve
    config 1 deterministically like the flagship family."""
    import pathlib
    import jax.numpy as jnp
    from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
    from marl_traffic_intersection_tpu.core.constants import STATUS_SUCCESS
    from marl_traffic_intersection_tpu.models import CentralizedActorCritic
    from marl_traffic_intersection_tpu.utils.checkpoint import restore_checkpoint

    art = (pathlib.Path(__file__).resolve().parent.parent
           / "artifacts" / "policy_central_multi")
    if not art.exists():
        pytest.skip("no artifact")
    params = restore_checkpoint(str(art))["params"]
    model = CentralizedActorCritic()

    env = IntersectionEnv(EnvConfig(num_agents=1, max_steps=400))
    state, obs = env.reset(jax.random.PRNGKey(7),
                           env.table.route_ids([("IN_6", "OUT_2")]))
    step = jax.jit(env.step)
    fwd = jax.jit(model.apply)
    for t in range(400):
        mean, _, _ = fwd(params, obs)  # (N=1, 127): agent axis is -2
        state, out = step(state, jnp.tanh(mean))
        obs = out.obs
        if bool(out.terminated):
            break
    assert bool(out.terminated), "did not finish the route"
    assert int(out.status[0]) == STATUS_SUCCESS
    assert t < 200, t


def test_shipped_sac_artifact_solves_config1():
    """The demonstration-seeded SAC checkpoint must solve config 1."""
    import pathlib
    import jax.numpy as jnp
    from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
    from marl_traffic_intersection_tpu.core.constants import STATUS_SUCCESS
    from marl_traffic_intersection_tpu.models.sac import SquashedGaussianActor
    from marl_traffic_intersection_tpu.utils.checkpoint import restore_checkpoint

    art = (pathlib.Path(__file__).resolve().parent.parent
           / "artifacts" / "policy_sac_cfg1")
    if not art.exists():
        pytest.skip("no artifact")
    params = restore_checkpoint(str(art))["actor_params"]
    model = SquashedGaussianActor()

    env = IntersectionEnv(EnvConfig(num_agents=1, max_steps=400))
    state, obs = env.reset(jax.random.PRNGKey(7),
                           env.table.route_ids([("IN_6", "OUT_2")]))
    step = jax.jit(env.step)
    fwd = jax.jit(model.apply)
    for t in range(400):
        mean, _ = fwd(params, obs)
        state, out = step(state, jnp.tanh(mean))
        obs = out.obs
        if bool(out.terminated):
            break
    assert bool(out.terminated), "did not finish the route"
    assert int(out.status[0]) == STATUS_SUCCESS
    assert t < 200, t


def test_shipped_sac_multi_artifact_solves_config1():
    """The multi-agent demonstration-seeded SAC checkpoint must still solve
    config 1 (agent-shared actor deploys at any agent count)."""
    import pathlib
    import jax.numpy as jnp
    from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
    from marl_traffic_intersection_tpu.core.constants import STATUS_SUCCESS
    from marl_traffic_intersection_tpu.models.sac import SquashedGaussianActor
    from marl_traffic_intersection_tpu.utils.checkpoint import restore_checkpoint

    art = (pathlib.Path(__file__).resolve().parent.parent
           / "artifacts" / "policy_sac_multi")
    if not art.exists():
        pytest.skip("no artifact")
    params = restore_checkpoint(str(art))["actor_params"]
    model = SquashedGaussianActor()

    env = IntersectionEnv(EnvConfig(num_agents=1, max_steps=400))
    state, obs = env.reset(jax.random.PRNGKey(7),
                           env.table.route_ids([("IN_6", "OUT_2")]))
    step = jax.jit(env.step)
    fwd = jax.jit(model.apply)
    for t in range(400):
        mean, _ = fwd(params, obs)
        state, out = step(state, jnp.tanh(mean))
        obs = out.obs
        if bool(out.terminated):
            break
    assert bool(out.terminated) and int(out.status[0]) == STATUS_SUCCESS
    assert t < 200, t
