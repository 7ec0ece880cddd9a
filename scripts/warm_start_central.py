"""Warm-start a MAPPO (central) checkpoint from a trained mlp artifact.

The CentralizedActorCritic's actor tower shares the flagship family's module
names (torso_*, pi_mean, log_std — models/central.py vs models/actor_critic.py)
by design, so a converged decentralized policy transplants directly; only the
centralized critic (critic_embed / critic_joint / vf) starts fresh. Empirically
(CLAUDE.md) warm-starting beats curriculum-from-scratch on this task.

  python scripts/warm_start_central.py \
      --source artifacts/policy_mlp_cfg1 --out /tmp/central_warm --agents 4

The output is a full train.py-compatible checkpoint (params + fresh opt_state
+ update=0): resume with
  python train.py --model central --resume /tmp/central_warm ...
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", default="artifacts/policy_mlp_cfg1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--agents", type=int, default=4)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # host-side param surgery only

    from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
    from marl_traffic_intersection_tpu.envs.vector import VectorEnv
    from marl_traffic_intersection_tpu.models import make_model
    from marl_traffic_intersection_tpu.parallel.ppo import PPOConfig, PPOLearner
    from marl_traffic_intersection_tpu.utils.checkpoint import (
        restore_checkpoint, save_checkpoint)

    env = IntersectionEnv(EnvConfig(num_agents=args.agents))
    venv = VectorEnv(env, num_envs=8)
    learner = PPOLearner(venv, make_model("central"), PPOConfig())
    ts = learner.init(jax.random.PRNGKey(0))

    src = restore_checkpoint(args.source)["params"]["params"]
    dst = jax.device_get(ts.params)
    shared = [k for k in dst["params"]
              if k.startswith("torso_") or k in ("pi_mean", "log_std")]
    missing = [k for k in shared if k not in src]
    if missing:
        raise SystemExit(f"source checkpoint lacks actor modules {missing}")
    for k in shared:
        dst["params"][k] = src[k]
    ts = ts._replace(params=dst)
    # fresh optimizer state sized for the transplanted params
    ts = ts._replace(opt_state=learner.tx.init(ts.params))

    save_checkpoint(args.out, {"params": ts.params,
                               "opt_state": ts.opt_state, "update": 0})
    print(f"transplanted {shared} from {args.source} -> {args.out}")


if __name__ == "__main__":
    main()
