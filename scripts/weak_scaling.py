"""Weak-scaling measurement on the virtual 8-device CPU mesh.

BASELINE.md commits to a scaling measurement at 1 chip / 1 host / N hosts.
Multi-chip hardware does not exist in this environment (one v5e chip behind
the axon tunnel), so this harness measures what is measurable here and
records it in SCALING.md:

  1. **Per-device program invariance** (the real weak-scaling argument):
     with a fixed per-device env batch, the compiled per-device program's
     FLOPs and bytes must stay constant as the mesh grows 1 -> 8. XLA SPMD
     compiles ONE per-device program; if its cost does not grow with the
     mesh and the only collectives are the learner's gradient psums (the env
     step has none — envs are fully independent), then per-step wall time on
     real hardware is mesh-size-independent, i.e. weak-scaling efficiency
     ~= 1 up to the gradient all-reduce, which is O(params) and
     latency-bound on ICI, not O(batch).
  2. **Collective inventory**: the env-step HLO must contain ZERO
     collectives; the train-step HLO must contain the expected
     all-reduce/psum family ops and nothing batch-sized.
  3. **Wall-clock table** (for transparency): measured on 2 physical cores,
     so beyond 2 virtual devices the total compute exceeds the machine and
     wall time necessarily grows ~ N/2 — reported with ideal-vs-core-bound
     reference lines, NOT as a hardware claim.

Run: python scripts/weak_scaling.py [--out SCALING.md]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
from marl_traffic_intersection_tpu.envs.vector import VectorEnv
from marl_traffic_intersection_tpu.models import ActorCriticMLP
from marl_traffic_intersection_tpu.parallel.mesh import make_mesh, shard_batch_tree
from marl_traffic_intersection_tpu.parallel.ppo import PPOConfig, PPOLearner

ENVS_PER_DEVICE = int(os.environ.get("ENVS_PER_DEVICE", 128))
AGENTS = int(os.environ.get("AGENTS", 4))
COLLECTIVE_OPS = ("all-reduce", "all-gather", "reduce-scatter",
                  "collective-permute", "all-to-all")


def _count_collectives(compiled) -> dict:
    txt = compiled.as_text()
    return {op: txt.count(f" {op}") + txt.count(f"{op}(") + txt.count(f"{op}.")
            for op in COLLECTIVE_OPS if op in txt}


def _cost(compiled):
    ca = compiled.cost_analysis() or {}
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def measure_env_step(n_dev: int):
    mesh = make_mesh(n_data=n_dev, n_model=1,
                     devices=jax.devices()[:n_dev])
    env = IntersectionEnv(EnvConfig(num_agents=AGENTS, max_steps=10 ** 9))
    venv = VectorEnv(env, num_envs=ENVS_PER_DEVICE * n_dev, auto_reset=True)
    state, obs = jax.jit(venv.reset)(jax.random.PRNGKey(0))
    state = shard_batch_tree(mesh, state)
    acts = jax.device_put(
        jnp.zeros((ENVS_PER_DEVICE * n_dev, AGENTS, 2)),
        __import__("marl_traffic_intersection_tpu.parallel.mesh",
                   fromlist=["data_sharding"]).data_sharding(mesh))

    def multi(state, acts):
        def body(s, _):
            s, out = venv.step(s, acts)
            return s, out.obs.sum()  # keep obs alive (honest bench)
        return jax.lax.scan(body, state, None, length=10)

    compiled = jax.jit(multi).lower(state, acts).compile()
    flops, byts = _cost(compiled)
    colls = _count_collectives(compiled)

    s2, _ = compiled(state, acts)
    # zero-width npc arrays come back with canonicalized (replicated)
    # sharding; restore the data-axis spec before re-feeding the executable
    s2 = shard_batch_tree(mesh, s2)
    jax.block_until_ready(s2)
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        s2, _ = compiled(s2, acts)
        s2 = shard_batch_tree(mesh, s2)
    jax.block_until_ready(s2)
    ms = (time.perf_counter() - t0) / (iters * 10) * 1e3
    sps = ENVS_PER_DEVICE * n_dev * 1e3 / ms
    return dict(n=n_dev, ms_per_step=ms, steps_per_s=sps, flops=flops,
                bytes=byts, collectives=colls)


def measure_train_step(n_dev: int):
    mesh = make_mesh(n_data=n_dev, n_model=1,
                     devices=jax.devices()[:n_dev])
    env = IntersectionEnv(EnvConfig(num_agents=AGENTS, max_steps=256))
    venv = VectorEnv(env, num_envs=ENVS_PER_DEVICE * n_dev)
    learner = PPOLearner(venv, ActorCriticMLP(hidden=(128, 128)),
                         PPOConfig(rollout_len=8, num_minibatches=2,
                                   update_epochs=1))
    ts = learner.init(jax.random.PRNGKey(0))
    state, obs = jax.jit(venv.reset)(jax.random.PRNGKey(1))
    step, shard_ts, shard_env = learner.jit_train_step(mesh, "mlp")
    ts = shard_ts(ts)
    state, obs = shard_env(state, obs)
    key = jax.random.PRNGKey(2)

    compiled = step.lower(ts, state, obs, key).compile()
    flops, byts = _cost(compiled)
    colls = _count_collectives(compiled)

    def refeed(state):
        # restore data-axis spec on zero-width npc arrays (see measure_env_step)
        return shard_batch_tree(mesh, state)

    ts, state, obs, key, _ = compiled(ts, state, obs, key)
    state = refeed(state)
    jax.block_until_ready(ts.params)
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        ts, state, obs, key, metrics = compiled(ts, state, obs, key)
        state = refeed(state)
    jax.block_until_ready(ts.params)
    ms = (time.perf_counter() - t0) / iters * 1e3
    env_sps = ENVS_PER_DEVICE * n_dev * AGENTS * 8 * 1e3 / ms
    return dict(n=n_dev, ms_per_update=ms, env_steps_per_s=env_sps,
                flops=flops, bytes=byts, collectives=colls)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="write SCALING.md")
    args = ap.parse_args()
    cores = os.cpu_count()
    sizes = [1, 2, 4, 8]

    print(f"virtual devices: {len(jax.devices())}, physical cores: {cores}")
    env_rows = [measure_env_step(n) for n in sizes]
    train_rows = [measure_train_step(n) for n in sizes]
    for r in env_rows:
        print("env  ", r)
    for r in train_rows:
        print("train", r)

    if not args.out:
        return

    e1 = env_rows[0]
    t1 = train_rows[0]
    lines = [
        "# Weak scaling (virtual 8-device CPU mesh)",
        "",
        f"Per-device env batch fixed at {ENVS_PER_DEVICE} envs x {AGENTS} agents;",
        f"mesh `data` axis swept 1 -> 8 on {cores} physical cores",
        "(`scripts/weak_scaling.py`; BASELINE.md 'Scaling' row).",
        "",
        "## Why per-device program invariance is the scaling claim",
        "",
        "XLA SPMD emits ONE per-device program. With the env batch sharded on",
        "the `data` axis, that program's cost must not depend on the mesh",
        "size; envs never communicate (no collective in the env-step HLO, see",
        "table), so on real multi-chip hardware each device steps its shard",
        "independently and per-step wall time is mesh-size-independent —",
        "weak-scaling efficiency ~= 1 by construction, up to the learner's",
        "gradient all-reduce (O(params), ICI-latency-bound, batch-size-",
        "independent). This box has 2 physical cores hosting all 8 virtual",
        "devices, so WALL TIME here cannot demonstrate that directly (total",
        "compute grows with the mesh while the silicon is fixed); the",
        "per-device cost columns below are the hardware-independent evidence,",
        "asserted in tests/test_scaling.py.",
        "",
        "## Env stepping (10-step scan, obs kept alive)",
        "",
        "| devices | envs | ms/step | env-steps/s | per-dev GFLOP/step | per-dev GB/step | collectives |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in env_rows:
        pd_flops = r["flops"] / 10 / 1e9  # cost_analysis is per-device under SPMD
        pd_bytes = r["bytes"] / 10 / 1e9
        lines.append(
            f"| {r['n']} | {ENVS_PER_DEVICE * r['n']} | {r['ms_per_step']:.2f} "
            f"| {r['steps_per_s'] * AGENTS:,.0f} | {pd_flops:.4f} | {pd_bytes:.4f} "
            f"| {r['collectives'] or 'none'} |")
    lines += [
        "",
        "## Full PPO update (rollout 8, 2 minibatches)",
        "",
        "| devices | envs | ms/update | env-steps/s | per-dev GFLOP | collectives |",
        "|---|---|---|---|---|---|",
    ]
    for r in train_rows:
        pd_flops = r["flops"] / 1e9
        lines.append(
            f"| {r['n']} | {ENVS_PER_DEVICE * r['n']} | {r['ms_per_update']:.1f} "
            f"| {r['env_steps_per_s']:,.0f} | {pd_flops:.3f} "
            f"| {r['collectives'] or 'none'} |")
    ef = env_rows[-1]["flops"] / (e1["flops"] + 1e-9)
    tf = train_rows[-1]["flops"] / (t1["flops"] + 1e-9)
    lines += [
        "",
        "Note: the env-step rows' all-reduces come from this harness's own",
        "scalar obs-checksum (`out.obs.sum()`, kept to defeat dead-code",
        "elimination); the raw `VectorEnv.step` HLO is collective-free at",
        "every mesh size (asserted by tests/test_scaling.py).",
        "",
        f"Per-device cost ratio 8-dev vs 1-dev: env step {ef:.3f}, "
        f"train step {tf:.3f} (1.000 = perfect weak scaling of the compiled",
        "program). The 2-process DCN-style run (`tests/test_multihost.py`)",
        "additionally verifies bitwise-equal synced losses across processes.",
        "",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
