"""Off-policy SAC training launcher (see parallel/sac.py).

Examples:
  python train_sac.py --num-envs 256 --agents 2 --calls 200
  python train_sac.py --traffic --density 0.5 --num-envs 512

Each jitted call runs steps_per_call x [env step -> replay insert -> gradient
update] as one XLA program; the replay buffer lives in HBM and is donated
through the call (updated in place).
"""
from __future__ import annotations

import argparse
import json
import time

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=256)
    ap.add_argument("--agents", type=int, default=2)
    ap.add_argument("--traffic", action="store_true")
    ap.add_argument("--density", type=float, default=0.5)
    ap.add_argument("--npc-mode", choices=["exact", "fast"], default="exact")
    ap.add_argument("--calls", type=int, default=100,
                    help="jitted train calls (steps_per_call env steps each)")
    ap.add_argument("--steps-per-call", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--warmup", type=int, default=4096)
    ap.add_argument("--capacity", type=int, default=1 << 19)
    ap.add_argument("--routes", default=None,
                    help="restrict ego route sampling to a fixed pool, e.g. "
                         "'IN_6:OUT_2,IN_1:OUT_7' (default: all mapped routes)")
    ap.add_argument("--demo", default=None,
                    help="PPO checkpoint whose actor seeds the replay buffer "
                         "with demonstration transitions before training "
                         "(off-policy warm start)")
    ap.add_argument("--demo-model", default="mlp",
                    choices=["mlp", "attention", "conv", "central"],
                    help="model family of --demo (feedforward families only; "
                         "gru needs a hidden state the collector doesn't "
                         "carry)")
    ap.add_argument("--demo-steps", type=int, default=200,
                    help="env steps of demonstrations (x num_envs x agents "
                         "transitions)")
    ap.add_argument("--demo-noise", type=float, default=0.1,
                    help="pre-tanh gaussian exploration noise on demo actions")
    ap.add_argument("--demo-every", type=int, default=0,
                    help="every K train calls, refresh the ring with "
                         "--demo-refresh demo steps (keeps demonstrations "
                         "from being overwritten by self-play)")
    ap.add_argument("--demo-refresh", type=int, default=8)
    ap.add_argument("--target-entropy", type=float, default=None,
                    help="SAC entropy target (default -act_dim)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--resume", default=None)
    args = ap.parse_args()

    from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
    from marl_traffic_intersection_tpu.envs.vector import VectorEnv
    from marl_traffic_intersection_tpu.parallel.sac import SACConfig, SACLearner
    from marl_traffic_intersection_tpu.utils.checkpoint import (
        restore_checkpoint, save_checkpoint)
    from marl_traffic_intersection_tpu.utils.profiling import StepsPerSecond

    env = IntersectionEnv(EnvConfig(
        num_agents=args.agents, traffic_flow=args.traffic,
        traffic_density=args.density, max_steps=2000,
        npc_mode=args.npc_mode))
    route_pool = None
    if args.routes:
        pairs = [tuple(p.split(":")) for p in args.routes.split(",")]
        route_pool = env.table.route_ids(pairs)
    venv = VectorEnv(env, num_envs=args.num_envs, route_pool=route_pool)
    learner = SACLearner(venv, SACConfig(
        lr=args.lr, batch_size=args.batch_size, warmup=args.warmup,
        buffer_capacity=args.capacity, steps_per_call=args.steps_per_call,
        target_entropy=args.target_entropy))

    ts = learner.init(jax.random.PRNGKey(args.seed))
    if args.resume:
        template = {"actor_params": jax.device_get(ts.actor_params),
                    "q_params": jax.device_get(ts.q_params)}
        ck = restore_checkpoint(args.resume, template=template)
        ts = ts._replace(actor_params=ck["actor_params"],
                         q_params=ck["q_params"],
                         q_target=jax.tree.map(lambda x: x, ck["q_params"]))
        print(f"resumed actor/critic params from {args.resume}")

    state, obs = venv.reset(jax.random.PRNGKey(args.seed + 1))
    step = jax.jit(learner.train_step, donate_argnums=(0, 1))
    key = jax.random.PRNGKey(args.seed + 2)

    if args.demo:
        import functools

        import jax.numpy as jnp

        from marl_traffic_intersection_tpu.utils.checkpoint import load_policy
        _, demo_params, demo_mean = load_policy(args.demo, args.demo_model)

        def demo_policy(k, obs):
            mean = demo_mean(demo_params, obs)
            noise = args.demo_noise * jax.random.normal(k, mean.shape)
            return jnp.tanh(mean + noise)

        collect = jax.jit(functools.partial(
            learner.collect, policy_fn=demo_policy, steps=args.demo_steps),
            donate_argnums=(0, 1))
        t0 = time.perf_counter()
        ts, state, obs, key = collect(ts, state, obs, key)
        jax.block_until_ready(ts.buffer.size)
        print(json.dumps({
            "demo_transitions": int(ts.buffer.size),
            "secs": round(time.perf_counter() - t0, 2)}))
        refresh = None
        if args.demo_every:
            refresh = jax.jit(functools.partial(
                learner.collect, policy_fn=demo_policy,
                steps=args.demo_refresh), donate_argnums=(0, 1))

    meter = StepsPerSecond(
        steps_per_tick=args.num_envs * args.steps_per_call)
    t_log = time.perf_counter()
    last_log_c = -1
    for c in range(args.calls):
        if args.demo and args.demo_every and c and c % args.demo_every == 0:
            ts, state, obs, key = refresh(ts, state, obs, key)
        ts, state, obs, key, metrics = step(ts, state, obs, key)
        meter.tick()
        if c % 10 == 0 or c == args.calls - 1:
            # host sync only at log points (tunnel round-trips dominate
            # per-call latency otherwise); secs averages the span since the
            # last log, since the block drains all queued async calls
            jax.block_until_ready(metrics["q_loss"])
            m = {k: float(v) for k, v in metrics.items()}
            now = time.perf_counter()
            print(json.dumps({
                "call": c,
                "secs": round((now - t_log) / (c - last_log_c), 3),
                "env_steps_per_s": round(meter.value, 1),
                "updates": int(ts.update_count),
                **{k: round(v, 5) for k, v in m.items()}}))
            t_log, last_log_c = now, c

    if args.checkpoint:
        save_checkpoint(args.checkpoint,
                        {"actor_params": ts.actor_params,
                         "q_params": ts.q_params})
        print(f"saved {args.checkpoint}")


if __name__ == "__main__":
    main()
