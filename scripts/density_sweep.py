"""Traffic-density robustness sweep (VERDICT r3 task 4).

Benches the traffic step at densities x batch sizes x npc modes on the
current backend and prints a markdown table plus one JSON line per cell.
Also reports the measured alive-NPC distribution per density (mean / batch
max over the run) — the quantity the slot-prefix tier ladder must cover.

Run on the TPU (defaults) or CPU (--device cpu). One process per
invocation; cells run sequentially inside it (axon allows one process).

Usage:
  python scripts/density_sweep.py [--densities 0.5 1.0 2.0 4.0]
      [--batches 1024 4096] [--modes exact fast] [--iters 3] [--inner 10]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--densities", type=float, nargs="*",
                    default=[0.5, 1.0, 2.0, 4.0])
    ap.add_argument("--batches", type=int, nargs="*", default=[1024, 4096])
    ap.add_argument("--modes", nargs="*", default=["exact", "fast"])
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--inner", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--agents", type=int, default=1)
    ap.add_argument("--device", default="tpu", choices=["cpu", "tpu"])
    ap.add_argument("--npc-cleanup", default="slot", choices=["slot", "wave"])
    ap.add_argument("--npc-tier", type=int, default=-1)
    args = ap.parse_args()

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
    from marl_traffic_intersection_tpu.envs.vector import VectorEnv

    def cell(density, B, mode):
        env = IntersectionEnv(EnvConfig(
            num_agents=args.agents, max_steps=10 ** 9, traffic_flow=True,
            traffic_density=density, npc_mode=mode,
            npc_tier=args.npc_tier, npc_cleanup=args.npc_cleanup))
        venv = VectorEnv(env, num_envs=B, auto_reset=True)
        state, _ = jax.jit(venv.reset)(jax.random.PRNGKey(0))
        actions = jnp.zeros((B, args.agents, 2), jnp.float32)

        @jax.jit
        def multi_step(state):
            def body(s, _):
                s2, out = venv.step(s, actions)
                return s2, out.obs.sum()
            s, chk = jax.lax.scan(body, state, None, length=args.inner)
            return s, chk.sum()

        # settle into the steady state before timing (alive count ramps up
        # over the first ~mean-transit ticks)
        for _ in range(4):
            state, _c = multi_step(state)
        jax.block_until_ready((state, _c))

        vals = []
        alive_stats = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, _c = multi_step(state)
            jax.block_until_ready((state, _c))
            dtm = time.perf_counter() - t0
            vals.append((B * args.inner * args.iters) / dtm)
            al = np.asarray(state.npc.alive).sum(axis=1)
            alive_stats.append((float(al.mean()), int(al.max())))
        val = float(np.median(vals))
        return dict(density=density, batch=B, mode=mode,
                    steps_per_s=round(val, 1),
                    repeats=[round(v, 1) for v in vals],
                    alive_mean=round(float(np.mean([a for a, _ in alive_stats])), 2),
                    alive_batch_max=max(m for _, m in alive_stats))

    rows = []
    for density in args.densities:
        for B in args.batches:
            for mode in args.modes:
                r = cell(density, B, mode)
                print(json.dumps(r), flush=True)
                rows.append(r)

    print("\n| density | B | mode | env-steps/s | alive mean | alive max |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['density']} | {r['batch']} | {r['mode']} | "
              f"{r['steps_per_s']:,.0f} | {r['alive_mean']} | "
              f"{r['alive_batch_max']} |")


if __name__ == "__main__":
    main()
