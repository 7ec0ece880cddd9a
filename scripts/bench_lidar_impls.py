"""Head-to-head lidar impls inside the full no-traffic bench step.

Times the 4096x4 north-star step with lidar_impl in {xla, interval} to
decide the 'auto' mapping for the no-traffic case. Run alone on the chip.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
from marl_traffic_intersection_tpu.envs.vector import VectorEnv

B = int(os.environ.get("B", 4096))
A = int(os.environ.get("A", 4))
INNER = int(os.environ.get("INNER", 20))
ITERS = int(os.environ.get("ITERS", 5))


def run(impl):
    env = IntersectionEnv(EnvConfig(num_agents=A, max_steps=10 ** 9,
                                    lidar_impl=impl))
    venv = VectorEnv(env, num_envs=B, auto_reset=True)
    st, _ = jax.jit(venv.reset)(jax.random.PRNGKey(0))
    acts = jnp.zeros((B, A, 2))

    @jax.jit
    def multi_step(state):
        def body(s, _):
            s2, out = venv.step(s, acts)
            return s2, out.obs.sum()
        s, chk = jax.lax.scan(body, state, None, length=INNER)
        return s, chk.sum()

    st, _ = multi_step(st)
    jax.block_until_ready(st)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            st, _ = multi_step(st)
        jax.block_until_ready(st)
        best = max(best, B * INNER * ITERS / (time.perf_counter() - t0))
    print(f"{impl}: {best:,.0f} env-steps/s", flush=True)
    return best


if __name__ == "__main__":
    for impl in ("xla", "interval"):
        run(impl)
