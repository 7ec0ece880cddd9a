"""Catch one lidar flip vs the oracle and dissect which term diverges."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
import numpy as np
import ctypes

from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
from tests.oracle import oracle as O

libm = ctypes.CDLL("libm.so.6")
for f in ("cosf", "sinf"):
    getattr(libm, f).restype = ctypes.c_float
    getattr(libm, f).argtypes = [ctypes.c_float]

routes = [("IN_6", "OUT_2")]
cfg = EnvConfig(num_agents=1, max_steps=2000)
env = IntersectionEnv(cfg)
state, obs = env.reset(jax.random.PRNGKey(0), env.table.route_ids(routes))
step = jax.jit(env.step)
oenv = O.OracleEnv(num_lanes=3, max_steps=2000)
oenv.reset(routes)

rng = np.random.RandomState(11)
from marl_traffic_intersection_tpu.core.lidar import ray_rel_angles
rel = ray_rel_angles()  # (96,)

for t in range(4000):
    acts = np.stack([rng.choice([0.0, 0.5, 1.0, -0.5], 1),
                     np.clip(rng.normal(0, 0.4, 1), -1, 1)], 1).astype(np.float32)
    prev_x = float(np.asarray(state.ego.x)[0])
    state, out = step(state, jnp.asarray(acts))
    ref = oenv.step(acts)
    mo = np.asarray(out.obs)[0, 31:]
    ro = ref["obs"][0, 31:]
    d = np.abs(mo - ro)
    if d.max() > 0:
        r = int(np.argmax(d))
        print(f"t={t} ray={r} mine={mo[r]*250}, ref={ro[r]*250}")
        hx = np.float32(np.asarray(state.ego.x)[0])
        hy = np.float32(np.asarray(state.ego.y)[0])
        hh = np.float32(np.asarray(state.ego.heading)[0])
        ex, ey, ev, ehead = oenv.egos()[0, :4]
        print("my pose", hx, hy, hh, "oracle pose", ex, ey, ehead,
              "pose equal:", (hx, hy, hh) == (np.float32(ex), np.float32(ey), np.float32(ehead)))
        ang = np.float32(hh + rel[r])
        oang = np.float32(np.float32(ehead) + rel[r])
        print("angle mine/oracle equal:", ang == oang, ang)
        jc = float(np.asarray(jax.jit(jnp.cos)(ang)))
        js = float(np.asarray(jax.jit(jnp.sin)(ang)))
        cc = libm.cosf(float(oang))
        cs = libm.sinf(float(oang))
        print("cos jax/libm:", jc, cc, jc == cc)
        print("sin jax/libm:", js, cs, js == cs)
        # recompute march samples both ways at the hit distance
        for dist in np.arange(0, 250, 4, dtype=np.float32):
            jxp = np.float32(hx + np.float32(jc) * dist)
            jyp = np.float32(hy - np.float32(js) * dist)
            cxp = np.float32(np.float32(ex) + np.float32(cc) * dist)
            cyp = np.float32(np.float32(ey) - np.float32(cs) * dist)
            if int(jxp) != int(cxp) or int(jyp) != int(cyp):
                print(f"sample divergence at dist={dist}: jax px=({int(jxp)},{int(jyp)}) "
                      f"libm px=({int(cxp)},{int(cyp)}) raw=({jxp},{jyp}) vs ({cxp},{cyp})")
                break
        else:
            print("no sample pixel divergence -> flip is in obstacle/road term")
        break
else:
    print("no flip in 4000 steps")
