"""North-star benchmark: batched env-steps/s/chip (4096 envs x 4 agents, lidar on).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
"repeats": [...], "dispersion_pct": N, ...}.

Methodology (VERDICT r3 task 6):
  * value = MEDIAN of BENCH_REPEATS (default 5) timed blocks; the individual
    block throughputs are reported in "repeats" and the spread in
    "dispersion_pct" = 100*(max-min)/median, so round-over-round drift can be
    classified as noise vs regression.
  * vs_baseline uses a PINNED reference denominator (BASELINE.json
    "measured_reference", recorded once on this host with the oracle build
    from /root/reference — 5-repeat max) so the ratio no longer swings with
    the shared-core weather of a re-timed race. Set BENCH_RETIME_REF=1 to
    re-measure instead (falls back to the 60 FPS design rate if the oracle
    can't build — the reference publishes no numbers, BASELINE.md).

Env knobs: BENCH_NUM_ENVS/AGENTS/ITERS/INNER/REPEATS, BENCH_MODE=traffic
(with BENCH_NPC_MODE/BENCH_DENSITY), BENCH_EXACT_TRIG=1 (bit-exact libm-
replica trig on the ego integrator + lidar — ops/exact_trig.py; measures the
price of the exactness mode, PERF.md "exact_trig cost").
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def bench_tpu(num_envs: int, num_agents: int, iters: int, inner: int,
              traffic: bool = False, npc_mode: str = "fast",
              density: float = 1.0, exact_trig: bool = False,
              repeats: int = 5, npc_cleanup: str = "slot") -> list:
    """Returns the list of per-block throughputs (env-steps/s), one per repeat."""
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

    lidar_impl = os.environ.get("BENCH_LIDAR_IMPL", "auto")
    env = IntersectionEnv(EnvConfig(
        num_agents=num_agents, max_steps=10 ** 9, traffic_flow=traffic,
        traffic_density=density, npc_mode=npc_mode, exact_trig=exact_trig,
        npc_cleanup=npc_cleanup, lidar_impl=lidar_impl))
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

    vals = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, _chk = multi_step(state)
        jax.block_until_ready(state)
        dt = time.perf_counter() - t0
        vals.append((num_envs * inner * iters) / dt)
    return vals


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


def _pinned_reference(traffic: bool, density: float, num_agents: int):
    """The pinned reference denominator from BASELINE.json, or None."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE.json")
    try:
        with open(path) as f:
            pinned = json.load(f).get("measured_reference", {})
    except Exception:
        return None
    if traffic:
        return pinned.get(f"traffic_d{density}")
    return pinned.get(f"no_traffic_agents{num_agents}")


def main():
    mode = os.environ.get("BENCH_MODE", "default")
    traffic = mode == "traffic"
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 1024 if traffic else 4096))
    num_agents = int(os.environ.get("BENCH_NUM_AGENTS", 1 if traffic else 4))
    iters = int(os.environ.get("BENCH_ITERS", 5))
    inner = int(os.environ.get("BENCH_INNER", 20))
    repeats = max(int(os.environ.get("BENCH_REPEATS", 5)), 1)
    exact_trig = os.environ.get("BENCH_EXACT_TRIG", "0") == "1"
    retime = os.environ.get("BENCH_RETIME_REF", "0") == "1"
    density = float(os.environ.get("BENCH_DENSITY", 1.0))

    if traffic:
        npc_mode = os.environ.get("BENCH_NPC_MODE", "fast")
        npc_cleanup = os.environ.get("BENCH_NPC_CLEANUP", "slot")
        vals = bench_tpu(num_envs, num_agents, iters, inner,
                         traffic=True, npc_mode=npc_mode, density=density,
                         exact_trig=exact_trig, repeats=repeats,
                         npc_cleanup=npc_cleanup)
        ref = None if retime else _pinned_reference(True, density, num_agents)
        if ref is None:
            try:
                ref = bench_reference_traffic(density)
            except Exception:
                ref = 60.0
        metric = (f"traffic-mode env-steps/s/chip ({num_envs} envs, "
                  f"density {density}, npc_mode={npc_mode}"
                  + (f", npc_cleanup={npc_cleanup}" if npc_cleanup != "slot"
                     else "") + ")")
    else:
        vals = bench_tpu(num_envs, num_agents, iters, inner,
                         exact_trig=exact_trig, repeats=repeats)
        ref = None if retime else _pinned_reference(False, density, num_agents)
        if ref is None:
            try:
                ref = bench_reference(num_agents)
            except Exception:
                ref = 60.0  # reference real-time design rate fallback
        metric = (f"batched env-steps/s/chip ({num_envs} envs x {num_agents} "
                  f"agents, lidar on)")
    if exact_trig:
        metric += ", exact_trig"
    value = float(np.median(vals))
    print(json.dumps({
        "metric": metric,
        "value": round(value, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(value / ref, 2),
        "repeats": [round(v, 1) for v in vals],
        "dispersion_pct": round(100.0 * (max(vals) - min(vals)) / value, 2),
        "baseline_ref_steps_per_s": round(float(ref), 1),
    }))


if __name__ == "__main__":
    main()
