"""Measured speed-of-light for the lidar march grid (VERDICT r4 task 4a).

The headline step is issue-bound on the (96 rays x 63 samples) masked-sweep
grid (PERF.md roofline section: neither HBM nor FLOP roofline is near, and
removing 36 of ~65 ops/sample — the interval impl — changed nothing). This
script puts a MEASURED number on "speed-of-light at fixed exactness": it
compiles and times

  * full      — the production ``lidar_scan`` (road test + 4 unrolled
                obstacle AABBs + parity-code min-reduce),
  * stripped  — a kernel that traverses the IDENTICAL (R, S) grid doing only
                the irreducible work: per-sample coordinate generation
                (mul+add+trunc per axis), ONE box predicate, the parity-code
                select, and the min-reduce. No road algebra, no obstacles.
                This is the attainable bound at fixed grid: no exact
                implementation can do less per element and still resolve the
                reference's first-event break,
  * stripped32 — the same stripped kernel on HALF the samples (S=32). This
                bounds what ANY exact coarse-stride/fewer-elements scheme
                (stride 2) could deliver end to end, before its own
                refinement overhead.

All three run under the same vmap(B, A) + lax.scan harness as bench.py
(checksum carried so nothing dead-code-eliminates). Ratios full/stripped and
full/stripped32 are the published numbers for PERF.md.

Usage: python scripts/lidar_sol.py [--batch 4096] [--agents 4] [--inner 20]
       [--iters 5] [--device tpu]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--device" in sys.argv:
    _dev = sys.argv[sys.argv.index("--device") + 1]
else:
    _dev = "tpu"
if _dev == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from marl_traffic_intersection_tpu.core.constants import (
    HEIGHT, LIDAR_MAX_DIST, LIDAR_RAYS, LIDAR_SAMPLES, LIDAR_STEP, WIDTH)
from marl_traffic_intersection_tpu.core.lidar import (_DISTS, _REL_ANGLES,
                                                      lidar_scan)


def stripped_scan(self_x, self_y, self_heading, nsamp: int):
    """Minimal exact-shaped grid traversal: coordinate gen + one box
    predicate + parity code + min-reduce. See module docstring."""
    f32 = jnp.float32
    rel = jnp.asarray(_REL_ANGLES)
    dists = jnp.asarray(_DISTS[:nsamp])
    ray_angle = self_heading + rel
    dx = jnp.cos(ray_angle)
    dy = -jnp.sin(ray_angle)
    sx = self_x + dx[:, None] * dists[None, :]
    sy = self_y + dy[:, None] * dists[None, :]
    xf = jnp.trunc(sx)
    yf = jnp.trunc(sy)
    # ONE box predicate standing in for "any hit" — same select/reduce shape
    oob = (xf < f32(0)) | (xf >= f32(WIDTH)) | (yf < f32(0)) | (yf >= f32(HEIGHT))
    hit = (xf > f32(300.0)) & (xf < f32(450.0)) & (yf > f32(300.0)) & (yf < f32(450.0))
    samp2 = jnp.arange(0, 2 * nsamp, 2, dtype=jnp.int32)
    big = jnp.int32(2 * nsamp)
    code = jnp.where(oob, samp2[None, :] + 1, jnp.where(hit, samp2[None, :], big))
    first = jnp.min(code, axis=-1)
    ok = (first < big) & ((first & 1) == 0)
    return jnp.where(ok, (first >> 1).astype(f32) * f32(LIDAR_STEP),
                     f32(LIDAR_MAX_DIST))


def time_kernel(fn, batch, agents, inner, iters):
    """vmap over (B, A) poses, scan `inner` dependent iterations, median of
    `iters` timed blocks."""
    key = jax.random.PRNGKey(0)
    kx, ky, kh = jax.random.split(key, 3)
    x = jax.random.uniform(kx, (batch, agents), jnp.float32, 100.0, 650.0)
    y = jax.random.uniform(ky, (batch, agents), jnp.float32, 100.0, 650.0)
    h = jax.random.uniform(kh, (batch, agents), jnp.float32, -3.14, 3.14)

    vv = jax.vmap(jax.vmap(fn))

    @jax.jit
    def block(x, y, h):
        def body(carry, _):
            x, y, h = carry
            d = vv(x, y, h)                       # (B, A, R)
            # dependent pose drift keeps iterations serialized + alive
            x = x + d[..., 0] * 1e-6
            y = y + d[..., 1] * 1e-6
            h = h + d[..., 2] * 1e-7
            return (x, y, h), d.sum()
        (x, y, h), s = jax.lax.scan(body, (x, y, h), None, length=inner)
        return x, y, h, s.sum()

    out = block(x, y, h)
    _ = float(out[3])   # true sync: on the axon tunnel jax.block_until_ready
    # RETURNS WITHOUT WAITING (measured: 0.1 ms "blocked" vs 60 ms real for
    # the same program; bench.py survives because its 5 chained dispatches
    # serialize on queue backpressure, verified equal to fetch-sync within
    # noise). Single-dispatch timing MUST sync via a scalar fetch.
    vals = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = block(*out[:3])
        _ = float(out[3])
        vals.append((time.perf_counter() - t0) / inner)
    return float(np.median(vals))  # secs per vmapped call


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--agents", type=int, default=4)
    ap.add_argument("--inner", type=int, default=20)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--device", default="tpu", choices=["cpu", "tpu"])
    # IMPORTANT: one kernel per process. Timing three freshly-compiled big
    # programs in one process through the axon tunnel returned dispatch-time
    # artifacts (~us for a ms kernel); CLAUDE.md's one-heavy-program rule
    # applies to measurement too. Default runs all three as subprocesses.
    ap.add_argument("--kernel", default="",
                    choices=["", "full", "stripped", "stripped32"])
    args = ap.parse_args()

    B, A = args.batch, args.agents

    if not args.kernel:
        import subprocess
        res = {}
        for k in ("full", "stripped", "stripped32"):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--kernel", k,
                 "--batch", str(B), "--agents", str(A),
                 "--inner", str(args.inner), "--iters", str(args.iters),
                 "--device", args.device],
                capture_output=True, text=True, timeout=2400)
            line = out.stdout.strip().splitlines()[-1]
            res[k] = json.loads(line)["ms"]
        rays = B * A * LIDAR_RAYS
        print(json.dumps({
            "batch": B, "agents": A,
            "full_ms": round(res["full"], 3),
            "stripped_ms": round(res["stripped"], 3),
            "stripped_half_ms": round(res["stripped32"], 3),
            "full_vs_bound_pct": round(100.0 * res["stripped"] / res["full"], 1),
            "half_grid_speedup": round(res["full"] / res["stripped32"], 2),
            "grays_per_s_full": round(rays / (res["full"] / 1e3) / 1e9, 2),
        }))
        return

    # full production kernel: 4-obstacle set (the no-traffic headline's
    # obstacle count — the other egos)
    def full(x, y, h):
        ox = jnp.array([200.0, 400.0, 500.0, 300.0], jnp.float32)
        oy = jnp.array([300.0, 350.0, 200.0, 500.0], jnp.float32)
        oh = jnp.array([0.1, 1.3, -2.0, 0.7], jnp.float32)
        om = jnp.ones((4,), bool)
        return lidar_scan(x, y, h, ox, oy, oh, om)

    fn = {"full": full,
          "stripped": lambda x, y, h: stripped_scan(x, y, h, LIDAR_SAMPLES),
          "stripped32": lambda x, y, h: stripped_scan(x, y, h, 32),
          }[args.kernel]
    t = time_kernel(fn, B, A, args.inner, args.iters)
    print(json.dumps({"kernel": args.kernel, "ms": round(t * 1e3, 4)}))


if __name__ == "__main__":
    main()
