"""Find the first 1-ulp ego-pose divergence vs the oracle and dissect it.

Replays the test_config1_full_2000_steps lockstep (policy _policy_random,
seed 11) on CPU, tracking x/y/v/heading/steering bit-equality each step. At
the first mismatch, recomputes the physics tick in numpy with strict
separate f32 rounding from the PREVIOUS (agreed) state to attribute which
intermediate diverges from which implementation.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
import numpy as np
import ctypes

from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
from marl_traffic_intersection_tpu.core.constants import (
    MAX_ACC, MAX_STEERING_ANGLE, PHYSICS_MAX_SPEED, WHEELBASE, PI_F)
from tests.oracle import oracle as O

libm = ctypes.CDLL("libm.so.6")
for f in ("cosf", "sinf", "tanf", "fmodf"):
    getattr(libm, f).restype = ctypes.c_float
libm.cosf.argtypes = [ctypes.c_float]
libm.sinf.argtypes = [ctypes.c_float]
libm.tanf.argtypes = [ctypes.c_float]
libm.fmodf.argtypes = [ctypes.c_float] * 2

f32 = np.float32

routes = [("IN_6", "OUT_2")]
cfg = EnvConfig(num_agents=1, max_steps=2000)
env = IntersectionEnv(cfg)
state, obs = env.reset(jax.random.PRNGKey(0), env.table.route_ids(routes))
step = jax.jit(env.step)
oenv = O.OracleEnv(num_lanes=3, max_steps=2000)
oenv.reset(routes)

rng = np.random.RandomState(11)


def pols(t, rng, n):
    return np.stack([rng.choice([0.0, 0.5, 1.0, -0.5], n),
                     np.clip(rng.normal(0, 0.4, n), -1, 1)], 1).astype(np.float32)


prev = None
for t in range(2000):
    acts = pols(t, rng, 1)
    pre = dict(x=f32(np.asarray(state.ego.x)[0]), y=f32(np.asarray(state.ego.y)[0]),
               v=f32(np.asarray(state.ego.v)[0]),
               h=f32(np.asarray(state.ego.heading)[0]),
               s=f32(np.asarray(state.ego.steering_angle)[0]))
    state, out = step(state, jnp.asarray(acts))
    ref = oenv.step(acts)
    egos = oenv.egos()
    mine = dict(x=f32(np.asarray(state.ego.x)[0]), y=f32(np.asarray(state.ego.y)[0]),
                v=f32(np.asarray(state.ego.v)[0]),
                h=f32(np.asarray(state.ego.heading)[0]),
                s=f32(np.asarray(state.ego.steering_angle)[0]))
    oref = dict(x=f32(egos[0, 0]), y=f32(egos[0, 1]), v=f32(egos[0, 2]),
                h=f32(egos[0, 3]), s=None)
    bad = [k for k in ("x", "y", "v", "h") if mine[k] != oref[k]]
    if bad:
        print(f"t={t} diverged fields: {bad}")
        print("pre-state:", {k: v.item() for k, v in pre.items()})
        print("acts:", acts.tolist())
        print("mine:", {k: v.item() for k, v in mine.items()})
        print("ref :", {k: (v.item() if v is not None else None) for k, v in oref.items()})
        # manual strict separate-rounding recompute from pre-state
        throttle, steer = f32(acts[0, 0]), f32(acts[0, 1])
        dt = f32(1.0 / 60.0)
        acc = f32(throttle * f32(MAX_ACC))
        tgt = f32(steer * f32(MAX_STEERING_ANGLE))
        s_new = f32(pre["s"] + f32(f32(tgt - pre["s"]) * f32(0.2)))
        v = pre["v"]
        if throttle == f32(0.0):
            v = f32(v * f32(0.95))
        v = f32(v + f32(acc * dt))
        v = min(max(v, f32(0.0)), f32(PHYSICS_MAX_SPEED))
        ang_vel = f32(f32(v / f32(WHEELBASE)) * libm.tanf(float(s_new)))
        h = pre["h"]
        if abs(v) > f32(0.1):
            h = f32(h + ang_vel)
        pi = f32(PI_F)
        two_pi = f32(f32(2.0) * pi)
        h = libm.fmodf(float(f32(h + pi)), float(two_pi))
        h = f32(h)
        if h < 0:
            h = f32(h + two_pi)
        h = f32(h - pi)
        x = f32(pre["x"] + f32(v * libm.cosf(float(h))))
        y = f32(pre["y"] - f32(v * libm.sinf(float(h))))
        print("manual:", dict(x=x.item(), y=y.item(), v=v.item(), h=h.item(),
                              s=s_new.item()))
        for k, val in (("x", x), ("y", y), ("v", v), ("h", h)):
            mv, rv = mine[k], oref[k]
            tag = ("=mine=ref" if (val == mv and val == rv) else
                   "=mine" if val == mv else "=ref" if val == rv else "NEITHER")
            print(f"  {k}: manual {tag}")
        break
else:
    print("no pose divergence in 2000 steps")
