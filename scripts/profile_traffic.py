"""Stage-level profile of the full traffic-mode step at bench shapes.

Where profile_npc.py times the NPC pipeline alone, this times the pieces of
the whole traffic step — lidar with the 4+32-slot obstacle set (dense xla
vs interval impl), the NPC controller, observe(), and the full step for both
lidar impls — to locate the traffic-mode bottleneck. Run alone on the chip
(single-chip axon tunnel serializes processes).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("DEVICE", "tpu") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    import jax
    # persistent compile cache (same as bench.py): tunnel compiles are slow
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
from marl_traffic_intersection_tpu.envs.vector import VectorEnv
from marl_traffic_intersection_tpu.core import npc as N
from marl_traffic_intersection_tpu.core.lidar import lidar_scan, lidar_scan_interval

B = int(os.environ.get("B", 1024))
A = int(os.environ.get("A", 4))
DENSITY = float(os.environ.get("DENSITY", 1.0))
WARM_STEPS = int(os.environ.get("WARM_STEPS", 600))
INNER = int(os.environ.get("INNER", 10))


def bench(name, fn, *args, iters=20):
    compiled = jax.jit(fn).lower(*args).compile()
    r = compiled(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = compiled(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:38s} {dt:8.3f} ms", flush=True)
    return dt


def scan_steps(step, n_inner):
    def f(st, acts):
        def body(c, _):
            s, out = step(c[0], acts)
            return (s, c[1] + out.obs.sum()), None
        (st2, chk), _ = jax.lax.scan(body, (st, jnp.float32(0.0)),
                                     None, length=n_inner)
        return st2, chk
    return f


def main():
    results = {}
    for impl in ("xla", "interval"):
        env = IntersectionEnv(EnvConfig(num_agents=A, traffic_flow=True,
                                        traffic_density=DENSITY,
                                        max_steps=10 ** 9, lidar_impl=impl))
        venv = VectorEnv(env, num_envs=B, auto_reset=True)
        st, _ = jax.jit(venv.reset)(jax.random.PRNGKey(0))
        acts = jnp.zeros((B, A, 2))
        step = jax.jit(venv.step)
        for _ in range(WARM_STEPS):
            st, _ = step(st, acts)
        jax.block_until_ready(st)
        if impl == "xla":
            alive = np.asarray(st.npc.alive)
            print(f"B={B} A={A} density={DENSITY} alive NPCs: "
                  f"mean={alive.sum(1).mean():.2f} max={alive.sum(1).max()}",
                  flush=True)

            # isolated lidar with the full 4+32 obstacle set
            def lidar_only(st, fn):
                e = st.ego
                ox = jnp.concatenate([e.x, st.npc.x], -1)
                oy = jnp.concatenate([e.y, st.npc.y], -1)
                oh = jnp.concatenate([e.heading, st.npc.heading], -1)
                om = jnp.concatenate([jnp.ones(e.x.shape, bool), st.npc.alive], -1)
                def one_env(x, y, h, ox, oy, ohh, om):
                    return jax.vmap(lambda a, b, c: fn(a, b, c, ox, oy, ohh, om, 3))(x, y, h)
                return jax.vmap(one_env)(e.x, e.y, e.heading, ox, oy, oh, om)

            bench("lidar dense 36-obstacle", lambda s: lidar_only(s, lidar_scan), st)
            bench("lidar interval 36-obstacle",
                  lambda s: lidar_only(s, lidar_scan_interval), st)

            def lidar_no_npc(st):
                e = st.ego
                om = jnp.ones(e.x.shape, bool)
                def one_env(x, y, h, om):
                    return jax.vmap(lambda a, b, c: lidar_scan(
                        a, b, c, x, y, h, om, 3))(x, y, h)
                return jax.vmap(one_env)(e.x, e.y, e.heading, om)
            bench("lidar dense ego-only (4 obst)", lidar_no_npc, st)

            paths_table = jnp.asarray(env._paths)
            dt_ = jnp.float32(1.0 / 60.0)
            vm = lambda f: jax.vmap(lambda nn: f(nn, paths_table, dt_))
            bench("npc controller exact", vm(N.npc_controller_update), st.npc)
            bench("npc controller fast", vm(N.npc_controller_update_fast), st.npc)
            bench("npc collisions", jax.vmap(N.npc_collisions), st.npc)
            bench("observe", jax.vmap(env.observe), st)

        t = bench(f"full step [{impl}] x{INNER} (scan)",
                  scan_steps(step, INNER), st, acts, iters=10)
        sps = B * INNER / (t / 1e3)
        print(f"  -> {impl}: {sps:,.0f} env-steps/s", flush=True)
        results[impl] = sps
    print({k: round(v) for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
