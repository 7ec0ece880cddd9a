"""PPO training launcher: single chip, single host, or multi-host pod slice.

Examples:
  python train.py --num-envs 4096 --agents 4 --updates 50
  python train.py --model attention --tp 2
  # curriculum: easy -> hard stages, params carried across stages
  python train.py --agents 4 --curriculum "agents=1@40;agents=2@40;agents=4@80"
  python train.py --traffic --curriculum "density=0.2@50;density=1.0@100"
  # multi-host (one process per host; jax.distributed picks up cluster env):
  python train.py --distributed --num-envs 32768

The env batch is sharded over the mesh 'data' axis; each host only touches its
addressable shard. Gradients sync through XLA collectives inserted by the
sharded loss reduction (see parallel/mesh.py docstring). A curriculum stage
re-jits the train step (env shapes change) but the policy/optimizer state is
carried through — parameter shapes are config-independent since the policy is
agent-shared over a fixed 127-d observation contract.
"""
from __future__ import annotations

import argparse
import json
import time

import jax


def parse_curriculum(spec: str) -> list:
    """'key=val[,key=val]@updates;...' -> [(overrides dict, updates)].

    Supported keys: agents, density, traffic, ent_coef, lr, rollout_len.
    """
    stages = []
    for part in spec.split(";"):
        part = part.strip()
        if not part:
            continue
        body, _, upd = part.rpartition("@")
        if not body:
            raise ValueError(f"curriculum stage needs 'key=val@updates': {part!r}")
        overrides = {}
        for kv in body.split(","):
            k, _, v = kv.partition("=")
            k = k.strip().replace("-", "_")
            if k == "agents":
                overrides["agents"] = int(v)
            elif k == "density":
                overrides["density"] = float(v)
            elif k == "traffic":
                overrides["traffic"] = v.strip() in ("1", "true", "True")
            elif k == "ent_coef":
                overrides["ent_coef"] = float(v)
            elif k == "lr":
                overrides["lr"] = float(v)
            elif k == "rollout_len":
                overrides["rollout_len"] = int(v)
            else:
                raise ValueError(f"unknown curriculum key {k!r}")
        stages.append((overrides, int(upd)))
    return stages


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=1024)
    ap.add_argument("--agents", type=int, default=4)
    ap.add_argument("--traffic", action="store_true")
    ap.add_argument("--density", type=float, default=0.5)
    ap.add_argument("--npc-mode", choices=["exact", "fast"], default="exact",
                    help="NPC update semantics: bit-match sequential vs "
                         "synchronous approximation. Default flipped to "
                         "'exact' in round 3: the config-4 episode A/B "
                         "(docs/NPC_MODES.md) shows fast biases vehicle-"
                         "crash statistics ~5% under pressure, and the "
                         "slot-prefix tiering leaves exact within ~10% of "
                         "fast's throughput")
    ap.add_argument("--lidar-impl",
                    choices=["auto", "xla", "interval", "pallas"],
                    default="auto")
    ap.add_argument("--updates", type=int, default=20)
    ap.add_argument("--rollout-len", type=int, default=64)
    ap.add_argument("--model", choices=["mlp", "attention", "conv", "gru", "central"],
                    default="mlp")
    ap.add_argument("--tp", type=int, default=1, help="model-axis size")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--ent-coef", type=float, default=0.01)
    ap.add_argument("--critic-warmup", type=int, default=0,
                    help="updates with the actor loss masked while a fresh "
                         "critic fits (MAPPO warm starts: the central critic "
                         "tower is separate from the actor, so the policy is "
                         "untouched during warmup)")
    ap.add_argument("--norm-reward", action="store_true",
                    help="running discounted-return reward normalization")
    ap.add_argument("--curriculum", default=None,
                    help="staged training: 'key=val[,k=v]@updates;...' "
                         "(keys: agents, density, traffic, ent_coef, lr, "
                         "rollout_len); --updates is ignored when set")
    ap.add_argument("--routes", default=None,
                    help="restrict ego route sampling to a fixed pool, e.g. "
                         "'IN_6:OUT_2,IN_1:OUT_7' (default: all mapped routes)")
    ap.add_argument("--reward", default=None,
                    help="override reward knobs, e.g. 'k_co=-20,k_prog=5' "
                         "(fields of core.env.RewardParams; traced leaves, "
                         "no recompile)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--device", choices=["auto", "cpu"], default="auto",
                    help="cpu forces the host platform (tests / preemption "
                         "drills without claiming the chip)")
    ap.add_argument("--distributed", action="store_true",
                    help="call jax.distributed.initialize() for multi-host")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--checkpoint-every", type=int, default=0,
                    help="also save every K updates (fault tolerance)")
    ap.add_argument("--resume", default=None,
                    help="restore params/opt_state/update from a checkpoint")
    ap.add_argument("--tb", default=None, help="TensorBoard log dir")
    ap.add_argument("--log-every", type=int, default=10,
                    help="host-sync metrics every K updates; between logs the "
                         "loop dispatches asynchronously (each per-update "
                         "metric fetch costs ~10 tunnel round-trips, ~30%% "
                         "of end-to-end throughput at 4096 envs)")
    args = ap.parse_args()
    args.log_every = max(1, args.log_every)

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    if args.distributed:
        jax.distributed.initialize()

    from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
    from marl_traffic_intersection_tpu.envs.normalize import RewardNormVecEnv
    from marl_traffic_intersection_tpu.envs.vector import VectorEnv
    from marl_traffic_intersection_tpu.models import make_model
    from marl_traffic_intersection_tpu.parallel.mesh import (make_hybrid_mesh,
                                                             make_mesh)
    from marl_traffic_intersection_tpu.parallel.ppo import PPOConfig, PPOLearner
    from marl_traffic_intersection_tpu.parallel.recurrent_ppo import (
        RecurrentPPOLearner)
    from marl_traffic_intersection_tpu.utils.checkpoint import (
        restore_checkpoint, save_checkpoint)
    from marl_traffic_intersection_tpu.utils.profiling import StepsPerSecond

    devices = jax.devices()
    n_dev = len(devices)
    n_slices = len({getattr(d, "slice_index", 0) for d in devices})
    if n_slices > 1:
        # DCN-connected multi-slice pod: replica axis across slices, batch
        # sharded over (replica, data) — see PERF.md "Multi-slice scaling"
        mesh = make_hybrid_mesh(n_model=args.tp)
    else:
        mesh = make_mesh(n_data=n_dev // args.tp, n_model=args.tp)
    if jax.process_index() == 0:
        print(f"devices={n_dev} slices={n_slices} mesh={dict(mesh.shape)}")

    if args.curriculum:
        stages = parse_curriculum(args.curriculum)
    else:
        stages = [({}, args.updates)]

    model = make_model(args.model)
    ts = None
    start_update = 0
    key = jax.random.PRNGKey(args.seed + 2)

    # Preemption resilience: if the --checkpoint path already exists and no
    # explicit --resume was given, auto-resume from it (restarting the same
    # command after a kill continues the run). Periodic checkpoints are FULL
    # training snapshots (params/opt_state/update + RNG key + env state +
    # obs [+ gru hidden]), so the resumed loss curve reproduces the
    # uninterrupted one exactly.
    import os as _os
    auto_resumed = False
    if not args.resume and args.checkpoint and _os.path.exists(args.checkpoint):
        args.resume = args.checkpoint
        auto_resumed = True
        if jax.process_index() == 0:
            print(f"auto-resuming from existing checkpoint {args.checkpoint}")
    resume_raw = None
    if args.resume:
        resume_raw = restore_checkpoint(args.resume)
        start_update = int(resume_raw.get("update", 0))

    def save(u, ts, env_state=None, obs=None, key=None, h=None):
        if args.checkpoint and jax.process_index() == 0:
            ck = {"params": ts.params, "opt_state": ts.opt_state, "update": u}
            if env_state is not None:
                ck["env_state"] = jax.device_get(env_state)
                ck["obs"] = jax.device_get(obs)
                ck["key"] = jax.device_get(key)
                if h is not None:
                    ck["h"] = jax.device_get(h)
            save_checkpoint(args.checkpoint, ck)
            print(f"saved {args.checkpoint} @ update {u}")

    tb = None
    if args.tb and jax.process_index() == 0:
        from tensorboardX import SummaryWriter
        tb = SummaryWriter(args.tb)

    # Budget accounting: an AUTO-resume (restart after preemption) counts the
    # restored update toward the absolute budget — the run finishes what the
    # original command asked for. An EXPLICIT --resume is a warm start (e.g.
    # fine-tuning a shipped artifact): the restored counter is only an offset
    # and the full --updates budget runs on top of it.
    stage_lo = 0 if auto_resumed else start_update
    for stage_idx, (ov, updates) in enumerate(stages):
        stage_hi = stage_lo + updates
        if start_update >= stage_hi:
            stage_lo = stage_hi  # stage fully covered by the resumed counter
            continue
        agents = ov.get("agents", args.agents)
        density = ov.get("density", args.density)
        traffic = ov.get("traffic", args.traffic)
        ent_coef = ov.get("ent_coef", args.ent_coef)
        lr = ov.get("lr", args.lr)
        rollout_len = ov.get("rollout_len", args.rollout_len)

        reward = None
        if args.reward:
            import numpy as np
            from marl_traffic_intersection_tpu.core.env import RewardParams
            kv = dict(p.split("=") for p in args.reward.split(","))
            reward = RewardParams(**{k: np.float32(v) for k, v in kv.items()})
        env = IntersectionEnv(EnvConfig(
            num_agents=agents, traffic_flow=traffic,
            traffic_density=density, max_steps=2000,
            npc_mode=args.npc_mode, lidar_impl=args.lidar_impl),
            reward=reward)
        route_pool = None
        if args.routes:
            pairs = [tuple(p.split(":")) for p in args.routes.split(",")]
            route_pool = env.table.route_ids(pairs)
        venv = VectorEnv(env, num_envs=args.num_envs, route_pool=route_pool)
        if args.norm_reward:
            venv = RewardNormVecEnv(venv)
        learner_cls = RecurrentPPOLearner if args.model == "gru" else PPOLearner
        learner = learner_cls(venv, model, PPOConfig(
            rollout_len=rollout_len, lr=lr, ent_coef=ent_coef,
            critic_warmup=args.critic_warmup))

        if ts is None:
            ts = learner.init(jax.random.PRNGKey(args.seed))
            if args.resume:
                # restore against a live template so optax NamedTuple states
                # keep their structure (orbax returns plain containers)
                template = {"params": jax.device_get(ts.params),
                            "opt_state": jax.device_get(ts.opt_state),
                            "update": 0}
                # full snapshots carry extra keys; their raw restored values
                # are their own structure template here (the typed EnvState
                # restore happens after venv.reset below)
                for k in ("env_state", "obs", "key", "h"):
                    if resume_raw is not None and k in resume_raw:
                        template[k] = resume_raw[k]
                ck = restore_checkpoint(args.resume, template=template)
                ts = ts._replace(params=ck["params"],
                                 opt_state=ck["opt_state"])
                start_update = int(ck.get("update", 0))
                if jax.process_index() == 0:
                    print(f"resumed from {args.resume} "
                          f"at update {start_update}")

        if jax.process_index() == 0 and len(stages) > 1:
            print(json.dumps({"stage": stage_idx, "agents": agents,
                              "traffic": traffic, "density": density,
                              "ent_coef": ent_coef, "lr": lr,
                              "updates": updates}))

        state, obs = venv.reset(jax.random.PRNGKey(args.seed + 1 + stage_idx))
        recurrent = args.model == "gru"
        h0 = learner.initial_hidden() if recurrent else None
        if resume_raw is not None and "env_state" in resume_raw \
                and start_update > stage_lo:
            # mid-stage full snapshot: restore the rollout carries so the
            # resumed curve continues the uninterrupted one exactly
            tmpl = {"env_state": jax.device_get(state),
                    "obs": jax.device_get(obs),
                    "key": jax.device_get(key)}
            if recurrent:
                tmpl["h"] = jax.device_get(h0)
            full = restore_checkpoint(args.resume, template={**tmpl, **{
                "params": jax.device_get(ts.params),
                "opt_state": jax.device_get(ts.opt_state), "update": 0}})
            state, obs, key = full["env_state"], full["obs"], full["key"]
            if recurrent and "h" in full:
                h0 = full["h"]
            resume_raw = None
        step, shard_ts, shard_env = learner.jit_train_step(mesh, args.model)
        ts = shard_ts(ts)
        if recurrent:
            state, obs, h = shard_env(state, obs, h0)
        else:
            state, obs = shard_env(state, obs)

        meter = StepsPerSecond(steps_per_tick=args.num_envs * rollout_len)
        last = stage_hi - 1
        t_log = time.perf_counter()
        last_log_u = start_update - 1

        def periodic_save(u1, ts):
            if args.checkpoint_every and u1 % args.checkpoint_every == 0:
                save(u1, ts, env_state=state, obs=obs, key=key,
                     h=h if recurrent else None)

        for u in range(start_update, stage_hi):
            if recurrent:
                ts, state, obs, h, key, metrics = step(ts, state, obs, h, key)
            else:
                ts, state, obs, key, metrics = step(ts, state, obs, key)
            log_now = (u - start_update) % args.log_every == 0 or u == last
            if not log_now:
                meter.tick()
                periodic_save(u + 1, ts)
                continue
            # host sync only at log points: each float() below is a tunnel
            # round-trip, so between logs updates pipeline on the device
            jax.block_until_ready(metrics["pg_loss"])
            meter.tick()
            if jax.process_index() == 0:
                m = {k: float(v) for k, v in metrics.items()}
                now = time.perf_counter()
                span = u - last_log_u
                print(json.dumps({
                    "update": u,
                    "secs": round((now - t_log) / span, 3),
                    "env_steps_per_s": round(meter.value, 1),
                    **{k: round(v, 5) for k, v in m.items()}}))
                t_log, last_log_u = now, u
                if tb is not None:
                    for k, v in m.items():
                        tb.add_scalar(k, v, u)
            periodic_save(u + 1, ts)
        start_update = stage_hi
        stage_lo = stage_hi

    if ts is None:
        if jax.process_index() == 0:
            print("nothing to do: checkpoint already covers all updates")
        return
    _loc = locals()
    save(start_update, ts, env_state=_loc.get("state"), obs=_loc.get("obs"),
         key=_loc.get("key"),
         h=_loc.get("h") if _loc.get("recurrent") else None)


if __name__ == "__main__":
    main()
