"""Stage-level profile of the NPC traffic pipeline at bench shapes.

Times each NPC sub-stage (controller exact-wave / serial / fast, collisions,
graph build, wave-level solve) as separately jitted programs over a realistic
density-1.0 NPC population, and reports wave-depth statistics over a rollout.
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
from marl_traffic_intersection_tpu.core import npc as N
from marl_traffic_intersection_tpu.core.constants import PATH_LEN
from marl_traffic_intersection_tpu.core.physics import gather_rows_matmul, update_path_index

B = int(os.environ.get("B", 1024))
DENSITY = float(os.environ.get("DENSITY", 1.0))
WARM_STEPS = int(os.environ.get("WARM_STEPS", 600))


def bench(name, fn, *args, iters=30):
    compiled = jax.jit(fn).lower(*args).compile()
    r = compiled(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = compiled(*args)
    jax.block_until_ready(r)
    print(f"{name:34s} {(time.perf_counter() - t0) / iters * 1e3:7.3f} ms", flush=True)
    return r


def main():
    env = IntersectionEnv(EnvConfig(num_agents=1, traffic_flow=True,
                                    traffic_density=DENSITY, max_steps=10 ** 9))
    venv = VectorEnv(env, num_envs=B, auto_reset=False)
    st, _ = jax.jit(venv.reset)(jax.random.PRNGKey(0))
    acts = jnp.zeros((B, 1, 2))
    step = jax.jit(venv.step)
    # warm the world so the NPC population is at steady state
    for _ in range(WARM_STEPS):
        st, _ = step(st, acts)
    jax.block_until_ready(st)
    alive = np.asarray(st.npc.alive)
    print(f"B={B} density={DENSITY} alive NPCs: mean={alive.sum(1).mean():.2f} "
          f"max={alive.sum(1).max()}", flush=True)

    npc = st.npc
    paths_table = jnp.asarray(env._paths)
    dt = jnp.float32(1.0 / 60.0)

    # dependent-slot statistics (cleanup-loop trip counts)
    def ndep(npc):
        paths = gather_rows_matmul(paths_table, npc.route_id)
        pi0 = update_path_index(paths, PATH_LEN, npc.path_index, npc.x, npc.y)
        g = N._interaction_graph(npc, paths, pi0)
        earlier = npc.uid[:, None] < npc.uid[None, :]
        return jnp.sum(npc.alive & jnp.any(g & earlier, axis=0))
    deps = np.asarray(jax.jit(jax.vmap(ndep))(npc))
    print(f"dependent slots: mean={deps.mean():.2f} p95={np.percentile(deps, 95):.0f} "
          f"max={deps.max()}", flush=True)

    vm = lambda f: jax.vmap(lambda n: f(n, paths_table, dt))
    bench("controller exact (waves)", vm(N.npc_controller_update), npc)
    bench("controller serial", vm(N.npc_controller_update_serial), npc)
    bench("controller fast (1 sync pass)", vm(N.npc_controller_update_fast), npc)

    def graph_only(npc):
        paths = gather_rows_matmul(paths_table, npc.route_id)
        pi0 = update_path_index(paths, PATH_LEN, npc.path_index, npc.x, npc.y)
        return N._interaction_graph(npc, paths, pi0)
    bench("graph build", jax.vmap(graph_only), npc)

    bench("collisions sparse", jax.vmap(N.npc_collisions), npc)
    bench("collisions serial", jax.vmap(N.npc_collisions_serial), npc)

    # full env step for reference
    bench("full env step (exact)", step, st, acts, iters=10)


if __name__ == "__main__":
    main()
