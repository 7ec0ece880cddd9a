"""PPO training launcher: single chip, single host, or multi-host pod slice.

Examples:
  python train.py --num-envs 4096 --agents 4 --updates 50
  python train.py --model attention --tp 2
  # multi-host (one process per host; jax.distributed picks up cluster env):
  python train.py --distributed --num-envs 32768

The env batch is sharded over the mesh 'data' axis; each host only touches its
addressable shard. Gradients sync through XLA collectives inserted by the
sharded loss reduction (see parallel/mesh.py docstring).
"""
from __future__ import annotations

import argparse
import json
import time

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=1024)
    ap.add_argument("--agents", type=int, default=4)
    ap.add_argument("--traffic", action="store_true")
    ap.add_argument("--density", type=float, default=0.5)
    ap.add_argument("--npc-mode", choices=["exact", "fast"], default="fast",
                    help="NPC update semantics: bit-match sequential vs "
                         "synchronous training-throughput mode")
    ap.add_argument("--lidar-impl", choices=["xla", "pallas"], default="xla")
    ap.add_argument("--updates", type=int, default=20)
    ap.add_argument("--rollout-len", type=int, default=64)
    ap.add_argument("--model", choices=["mlp", "attention"], default="mlp")
    ap.add_argument("--tp", type=int, default=1, help="model-axis size")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--ent-coef", type=float, default=0.01)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--distributed", action="store_true",
                    help="call jax.distributed.initialize() for multi-host")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--checkpoint-every", type=int, default=0,
                    help="also save every K updates (fault tolerance)")
    ap.add_argument("--resume", default=None,
                    help="restore params/opt_state/update from a checkpoint")
    ap.add_argument("--tb", default=None, help="TensorBoard log dir")
    args = ap.parse_args()

    if args.distributed:
        jax.distributed.initialize()

    from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
    from marl_traffic_intersection_tpu.envs.vector import VectorEnv
    from marl_traffic_intersection_tpu.models import (ActorCriticMLP,
                                                      SceneTransformerPolicy)
    from marl_traffic_intersection_tpu.parallel.mesh import make_mesh
    from marl_traffic_intersection_tpu.parallel.ppo import PPOConfig, PPOLearner
    from marl_traffic_intersection_tpu.utils.profiling import StepsPerSecond

    n_dev = len(jax.devices())
    mesh = make_mesh(n_data=n_dev // args.tp, n_model=args.tp)
    if jax.process_index() == 0:
        print(f"devices={n_dev} mesh={dict(mesh.shape)}")

    env = IntersectionEnv(EnvConfig(
        num_agents=args.agents, traffic_flow=args.traffic,
        traffic_density=args.density, max_steps=2000,
        npc_mode=args.npc_mode, lidar_impl=args.lidar_impl))
    venv = VectorEnv(env, num_envs=args.num_envs)
    model = ActorCriticMLP() if args.model == "mlp" else SceneTransformerPolicy()
    learner = PPOLearner(venv, model, PPOConfig(rollout_len=args.rollout_len,
                                                lr=args.lr,
                                                ent_coef=args.ent_coef))

    from marl_traffic_intersection_tpu.utils.checkpoint import (
        restore_checkpoint, save_checkpoint)

    ts = learner.init(jax.random.PRNGKey(args.seed))
    start_update = 0
    if args.resume:
        # restore against a live template so optax NamedTuple states keep
        # their structure (orbax returns plain containers otherwise)
        template = {"params": jax.device_get(ts.params),
                    "opt_state": jax.device_get(ts.opt_state), "update": 0}
        ck = restore_checkpoint(args.resume, template=template)
        ts = ts._replace(params=ck["params"], opt_state=ck["opt_state"])
        start_update = int(ck.get("update", 0))
        if jax.process_index() == 0:
            print(f"resumed from {args.resume} at update {start_update}")

    state, obs = venv.reset(jax.random.PRNGKey(args.seed + 1))
    step, shard_ts, shard_env = learner.jit_train_step(mesh, args.model)
    ts = shard_ts(ts)
    state, obs = shard_env(state, obs)

    tb = None
    if args.tb and jax.process_index() == 0:
        from tensorboardX import SummaryWriter
        tb = SummaryWriter(args.tb)

    def save(u):
        if args.checkpoint and jax.process_index() == 0:
            save_checkpoint(args.checkpoint,
                            {"params": ts.params, "opt_state": ts.opt_state,
                             "update": u})
            print(f"saved {args.checkpoint} @ update {u}")

    key = jax.random.PRNGKey(args.seed + 2)
    meter = StepsPerSecond(steps_per_tick=args.num_envs * args.rollout_len)
    for u in range(start_update, start_update + args.updates):
        t0 = time.perf_counter()
        ts, state, obs, key, metrics = step(ts, state, obs, key)
        jax.block_until_ready(metrics["pg_loss"])
        meter.tick()
        if jax.process_index() == 0:
            m = {k: float(v) for k, v in metrics.items()}
            print(json.dumps({"update": u, "secs": round(time.perf_counter() - t0, 3),
                              "env_steps_per_s": round(meter.value, 1), **
                              {k: round(v, 5) for k, v in m.items()}}))
            if tb is not None:
                for k, v in m.items():
                    tb.add_scalar(k, v, u)
        if args.checkpoint_every and (u + 1) % args.checkpoint_every == 0:
            save(u + 1)

    save(start_update + args.updates)


if __name__ == "__main__":
    main()
