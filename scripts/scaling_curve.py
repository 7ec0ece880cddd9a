"""Batch-size scaling sweep: env-steps/s/chip vs num_envs (or vs agents).

Evidence for the linear-scaling claim in PERF.md — one JSON line per batch
size. Run on the TPU (serially; one process at a time on the tunnel chip):

  python scripts/scaling_curve.py
  BENCH_AGENTS=4 BENCH_SIZES=512,2048,8192 python scripts/scaling_curve.py
  BENCH_AGENT_SIZES=1,2,4,8 python scripts/scaling_curve.py   # agents axis
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_tpu  # noqa: E402


def main():
    iters = int(os.environ.get("BENCH_ITERS", 3))
    inner = int(os.environ.get("BENCH_INNER", 10))
    agent_sizes = os.environ.get("BENCH_AGENT_SIZES")
    repeats = int(os.environ.get("BENCH_REPEATS", 3))

    def med(vals):  # bench_tpu returns one throughput per repeat block
        s = sorted(vals)
        return s[len(s) // 2]

    if agent_sizes:  # sweep the agents axis at fixed num_envs
        num_envs = int(os.environ.get("BENCH_NUM_ENVS", 4096))
        for a in (int(s) for s in agent_sizes.split(",")):
            v = med(bench_tpu(num_envs, a, iters, inner, repeats=repeats))
            print(json.dumps({"num_envs": num_envs, "agents": a,
                              "env_steps_per_s": round(v, 1),
                              "agent_steps_per_s": round(v * a, 1)}),
                  flush=True)
        return
    sizes = [int(s) for s in os.environ.get(
        "BENCH_SIZES", "1024,2048,4096,8192,16384").split(",")]
    agents = int(os.environ.get("BENCH_AGENTS", 4))
    for b in sizes:
        v = med(bench_tpu(b, agents, iters, inner, repeats=repeats))
        print(json.dumps({"num_envs": b, "agents": agents,
                          "env_steps_per_s": round(v, 1),
                          "batched_step_us": round(1e6 * b / v, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
