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



ARTIFACTS = [  # (artifact dir, model family of utils.checkpoint.load_policy)
    ("policy_mlp_cfg1", "mlp"),
    ("policy_mlp_multi", "mlp"),
    ("policy_attn_cfg1", "attention"),
    ("policy_attn_multi", "attention"),
    ("policy_conv_cfg1", "conv"),
    ("policy_gru_cfg1", "gru"),
    ("policy_gru_multi", "gru"),
    ("policy_central_multi", "central"),
    ("policy_central_cfg4", "central"),
    ("policy_sac_cfg1", "sac"),
    ("policy_sac_multi", "sac"),
]


@pytest.mark.parametrize("name,kind", ARTIFACTS,
                         ids=[a for a, _ in ARTIFACTS])
def test_shipped_artifacts_solve_config1(name, kind):
    """Every committed checkpoint must solve config 1 deterministically
    (fixed route IN_6->OUT_2, <200 steps, SUCCESS status). One shared
    harness over utils.checkpoint.load_policy — the same loader eval.py /
    play.py / serve.py use."""
    import pathlib
    import jax.numpy as jnp
    from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
    from marl_traffic_intersection_tpu.core.constants import STATUS_SUCCESS
    from marl_traffic_intersection_tpu.utils.checkpoint import load_policy

    art = pathlib.Path(__file__).resolve().parent.parent / "artifacts" / name
    if not art.exists():
        pytest.skip("no artifact")
    model, params, mean_fn = load_policy(str(art), kind)
    fwd = jax.jit(model.apply if mean_fn is None else mean_fn)

    env = IntersectionEnv(EnvConfig(num_agents=1, max_steps=400))
    state, obs = env.reset(jax.random.PRNGKey(7),
                           env.table.route_ids([("IN_6", "OUT_2")]))
    step = jax.jit(env.step)
    h = model.initial_hidden(1) if kind == "gru" else None
    for t in range(400):
        if kind == "gru":
            mean, _, _, h = fwd(params, obs, h)
        else:
            mean = fwd(params, obs)
        state, out = step(state, jnp.tanh(mean))
        obs = out.obs
        if bool(out.terminated):
            break
    assert bool(out.terminated), "did not finish the route"
    assert int(out.status[0]) == STATUS_SUCCESS
    assert t < 200, t


def test_shipped_multiagent_artifact_runs_config4():
    """The collision-tuned checkpoint must complete routes on a short
    config-4 (8 egos + traffic) horizon."""
    import pathlib
    import numpy as np
    import jax.numpy as jnp
    from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
    from marl_traffic_intersection_tpu.core.constants import STATUS_SUCCESS
    from marl_traffic_intersection_tpu.core.routes import default_ego_routes
    from marl_traffic_intersection_tpu.utils.checkpoint import load_policy

    art = (pathlib.Path(__file__).resolve().parent.parent
           / "artifacts" / "policy_mlp_multi")
    if not art.exists():
        pytest.skip("no artifact")
    _, params, mean_fn = load_policy(str(art), "mlp")
    fwd = jax.jit(mean_fn)

    env4 = IntersectionEnv(EnvConfig(num_agents=8, traffic_flow=True,
                                     traffic_density=1.0, max_steps=400))
    rids = env4.table.route_ids(default_ego_routes(8, 3))
    state, obs = env4.reset(jax.random.PRNGKey(11), rids)
    step4 = jax.jit(env4.step)
    prev = np.zeros(8, np.int32)
    successes = 0
    for t in range(300):
        state, out = step4(state, jnp.tanh(fwd(params, obs)))
        obs = out.obs
        st = np.asarray(out.status)
        successes += int(((st == STATUS_SUCCESS) & (prev != STATUS_SUCCESS)).sum())
        prev = st
    assert successes >= 4, successes  # several route completions in 300 steps


def test_vector_eval_counts_events():
    """eval.py --vector: the batched evaluator's jitted scan counts episode
    boundaries and status-transition events (tiny batch, random policy)."""
    import argparse
    import io
    import json
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import eval as eval_mod
    from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv

    env = IntersectionEnv(EnvConfig(num_agents=2, max_steps=16))
    rids = env.table.route_ids([("IN_6", "OUT_2"), ("IN_1", "OUT_7")])
    args = argparse.Namespace(vector=4, max_steps=40, seed=0,
                              config=1, policy="random")
    buf = io.StringIO()
    stdout, sys.stdout = sys.stdout, buf
    try:
        eval_mod.vector_eval(args, env, rids, None, None)
    finally:
        sys.stdout = stdout
    r = json.loads(buf.getvalue())
    # max_steps=16 < 40 scanned steps: every env truncates >= twice
    assert r["episodes"] >= 8
    assert r["env_steps"] == 4 * 40
    assert r["mean_ep_len"] <= 16
