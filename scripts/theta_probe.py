"""Bisect the device theta_err (obs[5]) flip from a --dump-mismatch capture.

Recomputes the lookahead heading-error chain
    tx,ty (one-hot path fetch) -> dxd,dyd -> a0 = atan2f(-dyd, dxd)
    -> s = a0 - heading -> w = wrap_angle(s) -> t = div32(w, pi)
for one agent, evaluating EVERY intermediate twice — host-side numpy/libm
and a tiny per-op jit on the target device — and prints the bit patterns.
The first stage whose device bits differ from the host bits names the op
behind the one-step-in-2000 configs-2/4/5 residual (VERDICT r4 task 2b).

Usage:
  python scripts/theta_probe.py /tmp/flip_cfg4.npz --config 4 --agent 5
      [--device tpu]
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
from marl_traffic_intersection_tpu.core.constants import PATH_LEN, WIDTH
from marl_traffic_intersection_tpu.core.physics import wrap_angle
from marl_traffic_intersection_tpu.ops.exact_trig import _div32
from marl_traffic_intersection_tpu.ops.exact_libm import atan2f_exact

from exactness_report import CONFIGS  # noqa: E402


def bits(v):
    return f"{np.float32(v)!r} (0x{int(np.float32(v).view(np.uint32)):08x})"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("capture")
    ap.add_argument("--config", type=int, required=True)
    ap.add_argument("--agent", type=int, required=True)
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    args = ap.parse_args()

    z = np.load(args.capture)
    c = CONFIGS[args.config]
    cfg = EnvConfig(num_agents=len(c["routes"]), num_lanes=c.get("lanes", 3),
                    traffic_flow=c["traffic"],
                    traffic_density=c.get("density", 0.5),
                    use_team_reward=c["team"], max_steps=10 ** 9,
                    exact_trig=True, exact_obs=True)
    env = IntersectionEnv(cfg)
    a = args.agent

    # The capture stores the PRE-step state; obs is built on the post-step
    # pose. Reconstruct the post-step pose from the captured obs row instead:
    # obs[0]=x/W, obs[1]=y/H, obs[3]=heading/pi are exact on both sides
    # (only obs[5] flipped), so invert via the ORACLE row and the known
    # normalizations -- but inversion reintroduces rounding. Instead rerun
    # the full step once on this device and read the post-step pose (the
    # discrete/pos stream is bit-exact on device, so the pose is trusted).
    from marl_traffic_intersection_tpu.core.env import EnvState, EgoState
    from marl_traffic_intersection_tpu.core.npc import NpcState
    ego = EgoState(**{f: jnp.asarray(z["ego." + f]) for f in EgoState._fields})
    npc = NpcState(**{f: jnp.asarray(z["npc." + f]) for f in NpcState._fields})
    state = EnvState(ego=ego, npc=npc, lidar=jnp.asarray(z["lidar"]),
                     step_count=jnp.asarray(z["step_count"]),
                     key=jnp.asarray(z["key"]))
    acts = jnp.asarray(z["acts"])
    if c["traffic"]:
        spawn = (jnp.asarray(bool(z["do_try"])), jnp.int32(int(z["rc"])))
        state2, _ = jax.jit(env.step)(state, acts, spawn=spawn)
    else:
        state2, _ = jax.jit(env.step)(state, acts)

    x = np.float32(np.asarray(state2.ego.x)[a])
    y = np.float32(np.asarray(state2.ego.y)[a])
    heading = np.float32(np.asarray(state2.ego.heading)[a])
    pi_idx = int(np.asarray(state2.ego.path_index)[a])
    rid = int(np.asarray(state2.ego.route_id)[a])
    print(f"post-step pose: x={bits(x)} y={bits(y)} heading={bits(heading)} "
          f"path_index={pi_idx} route={rid}")

    paths = np.asarray(env._paths)                       # (R, 160, 2) f32
    tgt = min(pi_idx + 10, PATH_LEN - 1)
    tx = np.float32(paths[rid, tgt, 0])
    ty = np.float32(paths[rid, tgt, 1])
    dxd = np.float32(tx - x)
    dyd = np.float32(ty - y)
    print(f"host: tx={bits(tx)} ty={bits(ty)} dxd={bits(dxd)} dyd={bits(dyd)}")

    # host-side libm chain (the oracle's op order)
    import ctypes
    libm = ctypes.CDLL("libm.so.6")
    libm.atan2f.restype = ctypes.c_float
    libm.atan2f.argtypes = [ctypes.c_float, ctypes.c_float]
    libm.fmodf.restype = ctypes.c_float
    libm.fmodf.argtypes = [ctypes.c_float, ctypes.c_float]
    f = np.float32
    PI = f(3.14159265358979323846)
    TWO_PI = f(2.0) * PI
    a0_h = f(libm.atan2f(f(-dyd), dxd))
    s_h = f(a0_h - heading)
    m_h = f(libm.fmodf(f(s_h + PI), TWO_PI))
    m_h = f(m_h + TWO_PI) if m_h < 0 else m_h
    w_h = f(m_h - PI)
    t_h = f(w_h / PI)
    print(f"host: atan2={bits(a0_h)} sub={bits(s_h)} fmod={bits(m_h)} "
          f"wrap={bits(w_h)} theta={bits(t_h)}")

    # device chain, one tiny jit per op (isolated -- no cross-op fusion)
    d_a0 = np.float32(jax.jit(atan2f_exact)(jnp.float32(-dyd),
                                            jnp.float32(dxd)))
    d_s = np.float32(jax.jit(lambda u, v: u - v)(jnp.float32(d_a0),
                                                 jnp.float32(heading)))
    d_fm = np.float32(jax.jit(jnp.fmod)(jnp.float32(np.float32(d_s + PI)),
                                        jnp.float32(TWO_PI)))
    d_w = np.float32(jax.jit(wrap_angle)(jnp.float32(d_s)))
    d_t = np.float32(jax.jit(_div32)(jnp.float32(d_w), jnp.float32(PI)))
    print(f"dev({_dev}) isolated: atan2={bits(d_a0)} sub={bits(d_s)} "
          f"fmod={bits(d_fm)} wrap={bits(d_w)} theta={bits(d_t)}")

    # device chain, ONE fused jit (matches the step's fusion context)
    def chain(ndyd, dxd_, hd):
        a0 = atan2f_exact(ndyd, dxd_)
        return _div32(wrap_angle(a0 - hd), jnp.float32(PI))

    d_full = np.float32(jax.jit(chain)(jnp.float32(-dyd), jnp.float32(dxd),
                                       jnp.float32(heading)))
    print(f"dev({_dev}) fused chain: theta={bits(d_full)}  "
          f"host theta={bits(t_h)}")


if __name__ == "__main__":
    main()
