"""Replay a captured obs-bitstream mismatch (exactness_report --dump-mismatch).

Loads the .npz capture (pre-step state + actions + spawn decision), replays
the step on the chosen device(s), and reports per-component agreement: the
same capture replayed on CPU and TPU isolates WHICH obs float the device
computes differently and through which chain (neighbor features / lookahead /
lidar / reward), turning the one-step-in-2000 configs-4/5 residual into a
reproducible single-step probe (VERDICT r4 task 2).

Usage:
  python scripts/replay_mismatch.py /tmp/cfg4_flip.npz --config 4
      [--device tpu] [--exact-trig] [--exact-obs]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--device" in sys.argv:
    _dev = sys.argv[sys.argv.index("--device") + 1]
else:
    _dev = "cpu"
if _dev == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
from marl_traffic_intersection_tpu.core.env import EnvState
from marl_traffic_intersection_tpu.core.env import EgoState
from marl_traffic_intersection_tpu.core.npc import NpcState

from exactness_report import CONFIGS  # noqa: E402 (sibling script import)


def load_state(z) -> EnvState:
    ego = EgoState(**{f: jnp.asarray(z["ego." + f]) for f in EgoState._fields})
    npc = NpcState(**{f: jnp.asarray(z["npc." + f]) for f in NpcState._fields})
    return EnvState(ego=ego, npc=npc, lidar=jnp.asarray(z["lidar"]),
                    step_count=jnp.asarray(z["step_count"]),
                    key=jnp.asarray(z["key"]))


OBS_REGION = [
    (0, 4, "ego pose (x/W, y/H, v/vmax, heading/pi)"),
    (4, 6, "lookahead dist/heading-err"),
    (6, 31, "neighbor top-5 features"),
    (31, 127, "lidar"),
]


def region(i):
    for lo, hi, name in OBS_REGION:
        if lo <= i < hi:
            return name
    return "?"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("capture")
    ap.add_argument("--config", type=int, required=True)
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--exact-trig", action="store_true")
    ap.add_argument("--exact-obs", action="store_true")
    args = ap.parse_args()

    z = np.load(args.capture)
    c = CONFIGS[args.config]
    n = len(c["routes"])
    cfg = EnvConfig(num_agents=n, num_lanes=c.get("lanes", 3),
                    traffic_flow=c["traffic"],
                    traffic_density=c.get("density", 0.5),
                    use_team_reward=c["team"], max_steps=10 ** 9,
                    exact_trig=args.exact_trig, exact_obs=args.exact_obs)
    env = IntersectionEnv(cfg)
    state = load_state(z)
    acts = jnp.asarray(z["acts"])
    if c["traffic"]:
        spawn = (jnp.asarray(bool(z["do_try"])), jnp.int32(int(z["rc"])))
        state2, out = jax.jit(env.step)(state, acts, spawn=spawn)
    else:
        state2, out = jax.jit(env.step)(state, acts)

    mine = np.asarray(out.obs, np.float32)
    ref = np.asarray(z["ref"], np.float32)
    cap_mine = np.asarray(z["mine"], np.float32)

    print(f"replay on {_dev}: t={int(z['t'])} captured mismatches "
          f"{z['mismatch_idx'].tolist()}")
    same_as_capture = np.array_equal(mine.view(np.uint32),
                                     cap_mine.view(np.uint32))
    print(f"replayed obs bit-equal to the CAPTURED device obs: {same_as_capture}")
    diff = mine.view(np.uint32) != ref.view(np.uint32)
    if not diff.any():
        print("replayed obs bit-equal to the ORACLE obs — the flip does NOT "
              "reproduce on this device from the captured state")
        return
    for a, i in np.argwhere(diff):
        mu, ru = mine[a, i].view(np.uint32), ref[a, i].view(np.uint32)
        print(f"  agent {a} obs[{i}] ({region(i)}): mine={mine[a, i]!r} "
              f"(0x{int(mu):08x}) ref={ref[a, i]!r} (0x{int(ru):08x}) "
              f"ulps={abs(int(mu) - int(ru))}")


if __name__ == "__main__":
    main()
