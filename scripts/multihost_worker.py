"""Worker for the multi-process (simulated multi-host) smoke test.

Each process gets 2 virtual CPU devices; jax.distributed assembles the global
8-visible-device mesh and the sharded PPO train step runs cross-process
collectives over gRPC — the same code path as ICI/DCN collectives on a pod.

Usage (launched by tests/test_multihost.py or by hand):
  python scripts/multihost_worker.py <num_procs> <proc_id> <coord_port>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main(num_procs: int, proc_id: int, port: int):
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_procs,
        process_id=proc_id,
    )
    assert jax.process_count() == num_procs
    n_global = len(jax.devices())
    assert n_global == 2 * num_procs, n_global

    import jax.numpy as jnp
    from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
    from marl_traffic_intersection_tpu.envs.vector import VectorEnv
    from marl_traffic_intersection_tpu.models import ActorCriticMLP
    from marl_traffic_intersection_tpu.parallel.mesh import make_mesh
    from marl_traffic_intersection_tpu.parallel.ppo import PPOConfig, PPOLearner

    mesh = make_mesh(n_data=n_global, n_model=1)

    def one_case(tag: str, env_cfg: EnvConfig):
        env = IntersectionEnv(env_cfg)
        venv = VectorEnv(env, num_envs=2 * n_global)
        learner = PPOLearner(venv, ActorCriticMLP(hidden=(64, 64)),
                             PPOConfig(rollout_len=4, num_minibatches=2,
                                       update_epochs=1))
        ts = learner.init(jax.random.PRNGKey(0))
        state, obs = venv.reset(jax.random.PRNGKey(1))

        step, shard_ts, shard_env = learner.jit_train_step(mesh, "mlp")
        ts = shard_ts(ts)
        state, obs = shard_env(state, obs)
        ts, state, obs, key, metrics = step(ts, state, obs,
                                            jax.random.PRNGKey(2))
        pg = float(metrics["pg_loss"])
        assert pg == pg, f"nan pg_loss ({tag})"  # finite check
        return pg

    pg = one_case("no-traffic", EnvConfig(num_agents=2, max_steps=32))
    # traffic-mode rollout across process boundaries: the shard-mapped env
    # step's tier conds are per-device (envs/vector.py), so the only
    # cross-process collectives stay the gradient psum family
    pg_tr = one_case("traffic", EnvConfig(num_agents=2, max_steps=32,
                                          traffic_flow=True,
                                          traffic_density=1.0, max_npcs=8))
    print(f"proc {proc_id}: OK pg_loss={pg:.6f}", flush=True)
    print(f"proc {proc_id}: OK traffic_pg_loss={pg_tr:.6f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
