"""Weak-scaling assertions on the virtual mesh (BASELINE.md 'Scaling' row).

Wall-clock weak scaling cannot be demonstrated on shared physical cores, so
these tests assert the hardware-independent facts that imply it on a real
pod (see scripts/weak_scaling.py / SCALING.md):

  * the compiled per-device env-step program cost is mesh-size-invariant
    (fixed per-device batch, data-axis sharding), and contains no
    collectives at all;
  * the train step's collectives are the parameter-sized gradient
    all-reduce family only — per-device cost stays ~constant as the mesh
    grows.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
from marl_traffic_intersection_tpu.envs.vector import VectorEnv
from marl_traffic_intersection_tpu.models import ActorCriticMLP
from marl_traffic_intersection_tpu.parallel.mesh import (
    data_sharding, make_mesh, shard_batch_tree)
from marl_traffic_intersection_tpu.parallel.ppo import PPOConfig, PPOLearner

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

ENVS_PER_DEVICE = 16
AGENTS = 2


def _env_step_compiled(n_dev, traffic: bool = False):
    mesh = make_mesh(n_data=n_dev, n_model=1, devices=jax.devices()[:n_dev])
    env = IntersectionEnv(EnvConfig(num_agents=AGENTS, max_steps=10 ** 9,
                                    traffic_flow=traffic, traffic_density=1.0))
    venv = VectorEnv(env, num_envs=ENVS_PER_DEVICE * n_dev, auto_reset=True,
                     mesh=mesh if traffic else None)
    state, _ = jax.jit(venv.reset)(jax.random.PRNGKey(0))
    state = shard_batch_tree(mesh, state)
    acts = jax.device_put(jnp.zeros((ENVS_PER_DEVICE * n_dev, AGENTS, 2)),
                          data_sharding(mesh))
    return jax.jit(venv.step).lower(state, acts).compile()


def _cost(compiled):
    ca = compiled.cost_analysis() or {}
    return float(ca.get("flops", 0.0))


def _bytes(compiled):
    ca = compiled.cost_analysis() or {}
    return float(ca.get("bytes accessed", 0.0))


def test_env_step_per_device_cost_invariant_and_collective_free():
    flops, nbytes = {}, {}
    for n in (1, 4, 8):
        compiled = _env_step_compiled(n)
        txt = compiled.as_text()
        for op in ("all-reduce", "all-gather", "reduce-scatter",
                   "collective-permute", "all-to-all"):
            assert op not in txt, f"unexpected collective {op} at mesh size {n}"
        flops[n] = _cost(compiled)  # XLA reports per-device cost under SPMD
        nbytes[n] = _bytes(compiled)
    # per-device cost invariant to the mesh size (weak scaling by
    # construction): FLOPs (compute roofline) AND bytes accessed (HBM
    # bandwidth roofline — the binding one for the env step, PERF.md)
    assert flops[4] == pytest.approx(flops[1], rel=0.05)
    assert flops[8] == pytest.approx(flops[1], rel=0.05)
    assert nbytes[1] > 0.0
    assert nbytes[4] == pytest.approx(nbytes[1], rel=0.05)
    assert nbytes[8] == pytest.approx(nbytes[1], rel=0.05)


@pytest.mark.slow
def test_traffic_env_step_per_device_cost_invariant_and_collective_free():
    """TRAFFIC-mode variant (VERDICT r3 task 1): with the mesh-bound
    VectorEnv the step runs under shard_map, so the NPC slot-prefix tier
    predicate reduces over the LOCAL batch shard and each device picks its
    own lax.cond branch — no per-step cross-device all-reduce, no globally
    synchronized cond. The compiled program must contain ZERO collectives
    and its per-device cost must be mesh-size-invariant."""
    flops, nbytes = {}, {}
    for n in (1, 4, 8):
        compiled = _env_step_compiled(n, traffic=True)
        txt = compiled.as_text()
        for op in ("all-reduce", "all-gather", "reduce-scatter",
                   "collective-permute", "all-to-all"):
            assert op not in txt, f"unexpected collective {op} at mesh size {n}"
        flops[n] = _cost(compiled)
        nbytes[n] = _bytes(compiled)
    assert flops[4] == pytest.approx(flops[1], rel=0.05)
    assert flops[8] == pytest.approx(flops[1], rel=0.05)
    assert nbytes[1] > 0.0
    assert nbytes[4] == pytest.approx(nbytes[1], rel=0.05)
    assert nbytes[8] == pytest.approx(nbytes[1], rel=0.05)


def test_train_step_collectives_are_param_sized_only():
    costs = {}
    for n in (1, 4):
        mesh = make_mesh(n_data=n, n_model=1, devices=jax.devices()[:n])
        env = IntersectionEnv(EnvConfig(num_agents=AGENTS, max_steps=64))
        venv = VectorEnv(env, num_envs=ENVS_PER_DEVICE * n)
        learner = PPOLearner(venv, ActorCriticMLP(hidden=(64, 64)),
                             PPOConfig(rollout_len=4, num_minibatches=1,
                                       update_epochs=1))
        ts = learner.init(jax.random.PRNGKey(0))
        state, obs = jax.jit(venv.reset)(jax.random.PRNGKey(1))
        step, shard_ts, shard_env = learner.jit_train_step(mesh, "mlp")
        ts = shard_ts(ts)
        state, obs = shard_env(state, obs)
        compiled = step.lower(ts, state, obs, jax.random.PRNGKey(2)).compile()
        txt = compiled.as_text()
        if n > 1:
            assert "all-reduce" in txt  # the gradient/metric psum family
        # nothing batch-sized crosses devices: no all-gather of the rollout
        rollout_elems = ENVS_PER_DEVICE * n * AGENTS * 4 * 127
        for line in txt.splitlines():
            if "all-gather" in line and f"{rollout_elems}" in line:
                raise AssertionError(f"batch-sized all-gather found: {line}")
        costs[n] = _cost(compiled)  # per-device under SPMD
    # per-device train cost approximately invariant (gradient sync is O(params))
    assert costs[4] == pytest.approx(costs[1], rel=0.10)
