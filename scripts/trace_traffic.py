"""Capture a TPU profiler trace of the traffic-mode step and print top ops.

Runs the bench-shaped traffic step (B env batch, exact or fast NPC mode)
under jax.profiler.trace, then feeds the xplane dump to top_ops.py's parser.
Run alone on the chip.

  NPC_MODE=exact B=1024 python scripts/trace_traffic.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
from marl_traffic_intersection_tpu.envs.vector import VectorEnv

B = int(os.environ.get("B", 1024))
A = int(os.environ.get("A", 1))
DENSITY = float(os.environ.get("DENSITY", 1.0))
NPC_MODE = os.environ.get("NPC_MODE", "exact")
LIDAR = os.environ.get("LIDAR", "xla")
WARM_STEPS = int(os.environ.get("WARM_STEPS", 600))
INNER = int(os.environ.get("INNER", 20))
TRACE_DIR = os.environ.get("TRACE_DIR", "/tmp/mti_trace")


def main():
    env = IntersectionEnv(EnvConfig(num_agents=A, traffic_flow=True,
                                    traffic_density=DENSITY, npc_mode=NPC_MODE,
                                    lidar_impl=LIDAR, max_steps=10 ** 9))
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

    step1 = jax.jit(venv.step)
    for _ in range(WARM_STEPS):
        st, _ = step1(st, acts)
    st, _ = multi_step(st)
    jax.block_until_ready(st)

    with jax.profiler.trace(TRACE_DIR):
        for _ in range(3):
            st, chk = multi_step(st)
        jax.block_until_ready(st)

    import importlib
    top_ops = importlib.import_module("top_ops")
    top_ops.main(TRACE_DIR)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
