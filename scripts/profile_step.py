"""Deep profile of the batched env step: cost analysis + component ablation.

Run alone on the chip (single-chip axon tunnel serializes processes).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
from marl_traffic_intersection_tpu.envs.vector import VectorEnv

B = int(os.environ.get("B", 4096))
N = int(os.environ.get("N", 4))


def bench_compiled(name, compiled, *args, iters=20):
    r = compiled(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = compiled(*args)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter() - t0) / iters * 1e3:.2f} ms", flush=True)
    return r


def cost(name, compiled):
    ca = compiled.cost_analysis()
    if ca:
        print(f"{name} cost: flops={ca.get('flops', 0):.3e} "
              f"bytes={ca.get('bytes accessed', 0)/1e9:.2f} GB", flush=True)


def variant(env):
    venv = VectorEnv(env, num_envs=B, auto_reset=False)
    st, _ = jax.jit(venv.reset)(jax.random.PRNGKey(0))
    acts = jnp.zeros((B, N, 2))
    compiled = jax.jit(venv.step).lower(st, acts).compile()
    return venv, st, acts, compiled


def main():
    env = IntersectionEnv(EnvConfig(num_agents=N, max_steps=10 ** 9))
    venv, st, acts, compiled = variant(env)
    cost("full", compiled)
    bench_compiled("full step", compiled, st, acts)

    import marl_traffic_intersection_tpu.core.env as E
    import marl_traffic_intersection_tpu.core.lidar as L
    import marl_traffic_intersection_tpu.core.physics as P

    real_lidar, real_upi = L.lidar_scan, P.update_path_index

    L.lidar_scan = lambda sx, sy, sh, ox, oy, oh, om, num_lanes=3: \
        jnp.full((96,), jnp.float32(250.0)) + sx * 0
    E.lidar_scan = L.lidar_scan
    _, st2, _, c2 = variant(IntersectionEnv(EnvConfig(num_agents=N, max_steps=10 ** 9)))
    cost("minus-lidar", c2)
    bench_compiled("step minus lidar", c2, st2, acts)
    L.lidar_scan = real_lidar
    E.lidar_scan = real_lidar

    P.update_path_index = lambda path, pl, pi, x, y, search_range=50: pi + 0 * (x[..., ] if False else pi)
    E.update_path_index = P.update_path_index
    _, st3, _, c3 = variant(IntersectionEnv(EnvConfig(num_agents=N, max_steps=10 ** 9)))
    cost("minus-upi", c3)
    bench_compiled("step minus path-index", c3, st3, acts)
    P.update_path_index = real_upi
    E.update_path_index = real_upi

    real_obs = IntersectionEnv.observe
    IntersectionEnv.observe = lambda self, s: jnp.zeros((N, 127), jnp.float32)
    _, st4, _, c4 = variant(IntersectionEnv(EnvConfig(num_agents=N, max_steps=10 ** 9)))
    cost("minus-observe", c4)
    bench_compiled("step minus observe", c4, st4, acts)
    IntersectionEnv.observe = real_obs

    # no status/collision block? approximate by timing pieces standalone
    if os.environ.get("DUMP"):
        out = os.environ["DUMP"]
        print("lowered HLO size:",
              len(jax.jit(venv.step).lower(st, acts).as_text()), flush=True)
        with open(out, "w") as f:
            f.write(jax.jit(venv.step).lower(st, acts).compile().as_text())
        print("wrote optimized HLO to", out, flush=True)


if __name__ == "__main__":
    main()
