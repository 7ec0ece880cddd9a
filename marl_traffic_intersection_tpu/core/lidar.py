"""Beam lidar ray-march, vectorized for TPU.

The reference marches each of 96 rays in 4-px steps from the car center,
breaking at the first event (reference: cpp/Lidar.cpp:22-90):

  1. sample out of screen            -> break, NO hit (ray shoots into void)
  2. dist > 0 and off-road           -> hit
  3. dist > 0 and inside another car's axis-aligned bounding box (of its
     rotated rect)                   -> hit

TPU-native formulation: evaluate the full (rays, samples) grid — plus an
(obstacles,) axis for the car tests — as masked boolean tensors, then resolve
the sequential ``break`` with an argmax-of-first-event reduction. Bit-match
details reproduced:

  - sample coords are ``int()``-truncated before *both* the bounds test and
    the road test (Lidar.cpp:34-35, the road test receives ``float(check_x)``)
  - the ``dist > 0`` skip for road/car tests (Lidar.cpp:44, 53)
  - obstacles whose pose is within 1e-3 of the scanning car's own pose are
    skipped — the reference's self/duplicate exclusion (Lidar.cpp:55-63);
    note dead cars are NOT excluded (no ``alive`` check in the reference)
  - ray angles: 96 rays spanning [-180 deg, +180 deg] inclusive
    (fov/(rays-1) spacing, Lidar.cpp:5-14 with the 96-ray override of
    IntersectionEnv.cpp:113-127)
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .constants import (
    CAR_LENGTH,
    CAR_WIDTH,
    HEIGHT,
    LIDAR_FOV_DEG,
    LIDAR_MAX_DIST,
    LIDAR_RAYS,
    LIDAR_SAMPLES,
    LIDAR_STEP,
    WIDTH,
)
from .geometry import off_road_grid_fast


def ray_rel_angles(rays: int = LIDAR_RAYS, fov_deg: float = LIDAR_FOV_DEG) -> np.ndarray:
    """Relative ray angles in radians (reference: cpp/Lidar.cpp:5-14).

    Replicates the reference's float32 op chain exactly:
    ``deg = start + i*step`` (f32 mul, f32 add) and ``deg * PI_F / 180.0f``
    (f32 mul, then f32 DIVIDE — g++ keeps the division). A former f64
    precompute of the same table was 1 ulp off on some rays, which surfaced
    as one-in-a-million lidar pixel flips vs the oracle (found via the
    t=898/ray=23 dissection in scripts/pose_probe.py + flip_probe.py).
    """
    f = np.float32
    start = f(-f(fov_deg) * f(0.5))
    step = f(f(fov_deg) / f(float(rays - 1))) if rays > 1 else f(0.0)
    pi_f = f(3.14159265358979323846)
    deg = start + np.arange(rays, dtype=np.float32) * step
    return (deg * pi_f / f(180.0)).astype(np.float32)


_REL_ANGLES = ray_rel_angles()
_DISTS = (np.arange(LIDAR_SAMPLES, dtype=np.float32) * np.float32(LIDAR_STEP))  # 0, 4, ..., 248


# FMA-contraction guard shared with the physics step (see its docstring):
# the sample coordinate p0 + d*t and the AABB extents |cos|*hl + |sin|*hw
# must round the product separately on CPU to match the baseline-ISA
# reference (root-caused by scripts/flip_probe.py: the tail is FMA, not
# trig ulp — XLA-CPU vectorized cos/sin match libm bit-for-bit).
from .physics import mul_unfused as _mul_unfused


def _trig_fns(exact: bool):
    """(cos, sin) — exact=True uses the bit-replica libm trig
    (ops/exact_trig.py): the chip's transcendentals differ from glibc's on
    ~40% of inputs by a ulp, and a ray-direction ulp flips a sample's
    int-cell truncation whenever a sample lands within ~1e-5 px of a cell
    boundary (~once per 10M readings — the EXACTNESS.md config-4 tail)."""
    if exact:
        from ..ops.exact_trig import cosf_exact, sinf_exact
        return cosf_exact, sinf_exact
    return jnp.cos, jnp.sin


def lidar_scan(self_x, self_y, self_heading, obs_x, obs_y, obs_heading, obs_mask,
               num_lanes: int = 3, rays: int = LIDAR_RAYS,
               fov_deg: float = LIDAR_FOV_DEG, max_dist: float = LIDAR_MAX_DIST,
               step_size: float = LIDAR_STEP, exact_trig: bool = False):
    """Scan one car against a masked obstacle set.

    self_*: scalars (vmap over agents/envs outside); obs_*: (M,) obstacle car
    poses with obs_mask (M,) bool for present slots. Returns (rays,) float32
    distances (max_dist where no hit). Defaults are the env's 96-ray sensor;
    pass rays=72 etc. for the reference's standalone Lidar defaults
    (cpp/Lidar.h:10-14).
    """
    f32 = jnp.float32
    if (rays, fov_deg, max_dist, step_size) == (LIDAR_RAYS, LIDAR_FOV_DEG,
                                                LIDAR_MAX_DIST, LIDAR_STEP):
        rel = jnp.asarray(_REL_ANGLES)
        dists = jnp.asarray(_DISTS)
    else:
        rel = jnp.asarray(ray_rel_angles(rays, fov_deg))
        nsamp = int(np.ceil(max_dist / step_size))
        dists = jnp.asarray(np.arange(nsamp, dtype=np.float32)
                            * np.float32(step_size))

    ray_angle = self_heading + rel                       # (R,)
    _cos, _sin = _trig_fns(exact_trig)
    dx = _cos(ray_angle)
    dy = -_sin(ray_angle)                                # y-down screen coords (Lidar.cpp:27)

    # Sample positions, truncated exactly like the C++ int() casts. The int
    # round-trip int(x) -> float(int) is a single float trunc (values are
    # far inside the int32 range), which avoids materializing separate s32
    # grids on the device.
    sx = self_x + _mul_unfused(dx[:, None], dists[None, :])  # (R, S)
    sy = self_y + _mul_unfused(dy[:, None], dists[None, :])
    xf = jnp.trunc(sx)
    yf = jnp.trunc(sy)

    # Screen-bounds test min/max-folded (bit-equal boolean identity for the
    # finite sample coords; requires the square screen WIDTH == HEIGHT):
    # (x<0)|(y<0) == min(x,y)<0 and (x>=W)|(y>=W) == max(x,y)>=W — two grid
    # ops cheaper per sample than the 4-compare/3-or form (Lidar.cpp:38-40).
    assert WIDTH == HEIGHT
    oob = (jnp.minimum(xf, yf) < f32(0)) | (jnp.maximum(xf, yf) >= f32(WIDTH))

    pos_dist = dists > f32(0.0)                          # (S,)

    road_hit = off_road_grid_fast(xf, yf, num_lanes)     # pos_dist folded below

    # Obstacle AABB tests. Self/duplicate exclusion by eps pose compare;
    # excluded/absent obstacles get inverted (+inf/-inf) box bounds so the
    # mask costs nothing inside the (R, S, M) grid.
    eps = f32(1e-3)
    not_self = ~(
        (jnp.abs(obs_x - self_x) < eps)
        & (jnp.abs(obs_y - self_y) < eps)
        & (jnp.abs(obs_heading - self_heading) < eps)
    )
    active = obs_mask & not_self                          # (M,)

    cosA = _cos(obs_heading)
    sinA = _sin(obs_heading)
    hl = f32(CAR_LENGTH * 0.5)
    hw = f32(CAR_WIDTH * 0.5)
    ex = _mul_unfused(jnp.abs(cosA), hl) + _mul_unfused(jnp.abs(sinA), hw)  # (M,)
    ey = _mul_unfused(jnp.abs(sinA), hl) + _mul_unfused(jnp.abs(cosA), hw)
    inf = f32(jnp.inf)
    lox = jnp.where(active, obs_x - ex, inf)
    hix = jnp.where(active, obs_x + ex, -inf)
    loy = jnp.where(active, obs_y - ey, inf)
    hiy = jnp.where(active, obs_y + ey, -inf)

    # Statically unrolled obstacle loop on (R, S) masks instead of an
    # (R, S, M) grid + any-reduce: the grid's separate reduce fusion forced
    # XLA to materialize the truncated xf/yf sample grids to HBM (~0.8 GB
    # round-trip per step at 4096x4); with only elementwise (R, S) work
    # feeding the final min-reduce, the whole march fuses into one kernel.
    hit_any = road_hit
    for m_i in range(obs_x.shape[0]):
        hit_any |= (
            (xf >= lox[m_i]) & (xf <= hix[m_i])
            & (yf >= loy[m_i]) & (yf <= hiy[m_i])
        )
    # the reference's `dist > 0` skip (Lidar.cpp:44,53) applies to the road
    # AND every car test; boolean distribution folds the per-term ANDs into
    # ONE grid AND (saves ~(M+1)-1 ops/sample, bit-equal decisions)
    hit_any &= pos_dist[None, :]

    # Resolve the sequential break with ONE fused min-reduction over a parity
    # code: hit samples (not-oob ∧ (road ∨ car)) encode as 2s, oob samples as
    # 2s+1, everything else as BIG. A sample cannot be both (hit requires
    # ~oob), so min(code) is even iff the first event along the ray is a hit
    # — exactly the reference's sequential break (cpp/Lidar.cpp:33-86). One
    # code grid instead of two halves the reduce traffic and leaves XLA a
    # single consumer chain to fuse the whole sample grid into.
    nsamp = dists.shape[0]
    samp2 = jnp.arange(0, 2 * nsamp, 2, dtype=jnp.int32)
    big = jnp.int32(2 * nsamp)
    code = jnp.where(oob, samp2[None, :] + 1,
                     jnp.where(hit_any, samp2[None, :], big))
    first = jnp.min(code, axis=-1)                        # (R,)
    hit = (first < big) & ((first & 1) == 0)
    return jnp.where(hit, (first >> 1).astype(f32) * f32(step_size),
                     f32(max_dist))


def lidar_scan_sweep(self_x, self_y, self_heading, obs_x, obs_y, obs_heading,
                     obs_mask, num_lanes: int = 3, exact_trig: bool = False):
    """All-agent dense march in a lane-packed ``(S, A*R)`` layout.

    Bit-identical to ``jax.vmap(lidar_scan)`` over agents — every per-element
    f32 op and its operand order is unchanged — but the grid tensors are laid
    out with the flattened (agents x rays) axis MINOR-MOST and the 63-sample
    axis in sublanes. The production layout ``(..., R=96, S=63)`` puts S in
    the VPU's 128-wide lanes (63/128 = 49% utilization, padding executed as
    real issue slots in the fused loop); ``(S, A*R)`` packs A*R = 384 lanes
    (3 full lane groups at the 4-agent headline config) with S padding only
    1/64 of sublanes — the same trick that bought 20% on the NPC ghost scan
    (path axis minor-most, PERF.md round 2).

    self_*: (A,) ego poses. obs_*: (M,) obstacle set shared by all agents
    (the same set every ``lidar_scan`` call in the env step receives).
    Returns (A, R) distances. vmap over the env batch outside.
    """
    f32 = jnp.float32
    rel = jnp.asarray(_REL_ANGLES)                 # (R,)
    dists = jnp.asarray(_DISTS)                    # (S,)
    A = self_x.shape[0]
    R = rel.shape[0]
    nsamp = dists.shape[0]

    ray_angle = self_heading[:, None] + rel        # (A, R)
    _cos, _sin = _trig_fns(exact_trig)
    dx = _cos(ray_angle)
    dy = -_sin(ray_angle)                          # (A, R)

    dxf = jnp.reshape(dx, (A * R,))
    dyf = jnp.reshape(dy, (A * R,))
    px = jnp.reshape(jnp.broadcast_to(self_x[:, None], (A, R)), (A * R,))
    py = jnp.reshape(jnp.broadcast_to(self_y[:, None], (A, R)), (A * R,))

    d_col = dists[:, None]                         # (S, 1)
    sx = px[None, :] + _mul_unfused(dxf[None, :], d_col)   # (S, A*R)
    sy = py[None, :] + _mul_unfused(dyf[None, :], d_col)
    xf = jnp.trunc(sx)
    yf = jnp.trunc(sy)

    # same min/max-folded square-screen bounds test as lidar_scan
    assert WIDTH == HEIGHT
    oob = (jnp.minimum(xf, yf) < f32(0)) | (jnp.maximum(xf, yf) >= f32(WIDTH))
    pos_dist = dists > f32(0.0)                    # (S,)
    road_hit = pos_dist[:, None] & off_road_grid_fast(xf, yf, num_lanes)

    eps = f32(1e-3)
    not_self = ~(
        (jnp.abs(obs_x[None, :] - self_x[:, None]) < eps)
        & (jnp.abs(obs_y[None, :] - self_y[:, None]) < eps)
        & (jnp.abs(obs_heading[None, :] - self_heading[:, None]) < eps)
    )                                              # (A, M)
    active = obs_mask[None, :] & not_self          # (A, M)

    cosA = _cos(obs_heading)
    sinA = _sin(obs_heading)
    hl = f32(CAR_LENGTH * 0.5)
    hw = f32(CAR_WIDTH * 0.5)
    ex = _mul_unfused(jnp.abs(cosA), hl) + _mul_unfused(jnp.abs(sinA), hw)  # (M,)
    ey = _mul_unfused(jnp.abs(sinA), hl) + _mul_unfused(jnp.abs(cosA), hw)
    inf = f32(jnp.inf)
    # per-(agent, obstacle) masked bounds (same values lidar_scan computes
    # from its scalars), broadcast per ray into the packed lanes
    lox = jnp.where(active, (obs_x - ex)[None, :], inf)   # (A, M)
    hix = jnp.where(active, (obs_x + ex)[None, :], -inf)
    hiy = jnp.where(active, (obs_y + ey)[None, :], -inf)
    loy = jnp.where(active, (obs_y - ey)[None, :], inf)

    per_ray = lambda col: jnp.reshape(
        jnp.broadcast_to(col[:, None], (A, R)), (A * R,))   # (A,) -> (A*R,)

    hit_any = road_hit
    for m_i in range(obs_x.shape[0]):
        lox_m = per_ray(lox[:, m_i])[None, :]
        hix_m = per_ray(hix[:, m_i])[None, :]
        loy_m = per_ray(loy[:, m_i])[None, :]
        hiy_m = per_ray(hiy[:, m_i])[None, :]
        hit_any |= (
            (xf >= lox_m) & (xf <= hix_m)
            & (yf >= loy_m) & (yf <= hiy_m)
            & pos_dist[:, None]
        )

    samp2 = jnp.arange(0, 2 * nsamp, 2, dtype=jnp.int32)   # (S,)
    big = jnp.int32(2 * nsamp)
    code = jnp.where(oob, samp2[:, None] + 1,
                     jnp.where(hit_any, samp2[:, None], big))
    first = jnp.min(code, axis=-2)                          # (A*R,)
    hit = (first < big) & ((first & 1) == 0)
    out = jnp.where(hit, (first >> 1).astype(f32) * f32(LIDAR_STEP),
                    f32(LIDAR_MAX_DIST))
    return jnp.reshape(out, (A, R))


def _first_true(pred, shape, domain_pow2: int):
    """Branchless binary search: smallest k in [0, domain_pow2) where the
    monotone-nondecreasing boolean ``pred(k)`` is True; domain_pow2 if none.

    ``pred`` receives an i32 array of the given shape and must be exact and
    weakly monotone in k — which trunc(p0 + d·t(k)) comparisons are, because
    f32 multiply/add by a constant and trunc are all weakly monotone under
    round-to-nearest. 1 + log2(domain) predicate evaluations.
    """
    idx = jnp.zeros(shape, jnp.int32)
    s = domain_pow2 // 2
    while s >= 1:
        idx = jnp.where(pred(idx + (s - 1)), idx, idx + s)
        s //= 2
    return jnp.where(pred(idx), idx, idx + 1)


def lidar_scan_interval(self_x, self_y, self_heading, obs_x, obs_y,
                        obs_heading, obs_mask, num_lanes: int = 3,
                        rays: int = LIDAR_RAYS,
                        fov_deg: float = LIDAR_FOV_DEG,
                        max_dist: float = LIDAR_MAX_DIST,
                        step_size: float = LIDAR_STEP,
                        exact_trig: bool = False):
    """``lidar_scan`` with the obstacle tests lifted OUT of the sample grid.

    The truncated sample coordinate trunc(p0 + d·(step·k)) is weakly monotone
    in k even under f32 rounding, so each obstacle AABB's hit set along a ray
    is ONE contiguous k-interval whose boundaries are found by binary search
    on the exact per-sample predicate (_first_true) — unconditionally
    bit-identical to the dense test, at 4·(1+log2 S) predicate evaluations
    per (ray, obstacle) instead of S box tests.

    The screen-bounds break (cpp/Lidar.cpp:38-40) is searched the same way:
    the screen is a box, so {k : sample in-bounds} is the intersection of two
    per-axis preimages of intervals under weakly-monotone maps — ONE
    contiguous k-interval — and the first out-of-bounds sample is its
    endpoint (0 if the interval misses k=0). Only the road test (non-convex
    region: hit set is not an interval) stays dense over the sample grid.
    Event-priority encoding: oob → 2k, hits → 2k+1, so at the SAME sample
    oob beats a hit, while any earlier sample still wins the min.
    """
    f32 = jnp.float32
    if (rays, fov_deg, max_dist, step_size) == (LIDAR_RAYS, LIDAR_FOV_DEG,
                                                LIDAR_MAX_DIST, LIDAR_STEP):
        rel = jnp.asarray(_REL_ANGLES)
        dists = jnp.asarray(_DISTS)
    else:
        rel = jnp.asarray(ray_rel_angles(rays, fov_deg))
        nsamp_ = int(np.ceil(max_dist / step_size))
        dists = jnp.asarray(np.arange(nsamp_, dtype=np.float32)
                            * np.float32(step_size))
    nsamp = dists.shape[0]
    pow2 = 1
    while pow2 < nsamp + 1:
        pow2 *= 2

    ray_angle = self_heading + rel                       # (R,)
    _cos, _sin = _trig_fns(exact_trig)
    dx = _cos(ray_angle)
    dy = -_sin(ray_angle)

    sx = self_x + _mul_unfused(dx[:, None], dists[None, :])  # (R, S)
    sy = self_y + _mul_unfused(dy[:, None], dists[None, :])
    xf = jnp.trunc(sx)
    yf = jnp.trunc(sy)

    pos_dist = dists > f32(0.0)
    road_hit = pos_dist[None, :] & off_road_grid_fast(xf, yf, num_lanes)

    samp2 = jnp.arange(0, 2 * nsamp, 2, dtype=jnp.int32)
    big = jnp.int32(2 * nsamp)
    code = jnp.where(road_hit, samp2[None, :] + 1, big)
    first = jnp.min(code, axis=-1)                        # (R,)

    # ---- obstacle AABBs as exact k-intervals per ray
    eps = f32(1e-3)
    not_self = ~(
        (jnp.abs(obs_x - self_x) < eps)
        & (jnp.abs(obs_y - self_y) < eps)
        & (jnp.abs(obs_heading - self_heading) < eps)
    )
    active = obs_mask & not_self
    cosA = _cos(obs_heading)
    sinA = _sin(obs_heading)
    hl = f32(CAR_LENGTH * 0.5)
    hw = f32(CAR_WIDTH * 0.5)
    ex = _mul_unfused(jnp.abs(cosA), hl) + _mul_unfused(jnp.abs(sinA), hw)  # (M,)
    ey = _mul_unfused(jnp.abs(sinA), hl) + _mul_unfused(jnp.abs(cosA), hw)
    inf = f32(jnp.inf)
    lox = jnp.where(active, obs_x - ex, inf)
    hix = jnp.where(active, obs_x + ex, -inf)
    loy = jnp.where(active, obs_y - ey, inf)
    hiy = jnp.where(active, obs_y + ey, -inf)

    step_f = f32(step_size)

    def axis_interval(p0, d, lo, hi):
        """[enter, exit_excl) of k with trunc(p0 + d·(step·k)) in [lo, hi].

        Sign-folded so both searched predicates are monotone NONDECREASING;
        the inner evaluation replicates the dense grid's op order
        (p0 + d * dist, then trunc) bit-for-bit.
        """
        sgn = jnp.where(d >= f32(0.0), f32(1.0), f32(-1.0))
        u_lo = jnp.where(d >= f32(0.0), lo, -hi)
        u_hi = jnp.where(d >= f32(0.0), hi, -lo)

        def u(k):
            t = k.astype(f32) * step_f
            return sgn * jnp.trunc(p0 + _mul_unfused(d, t))

        enter = _first_true(lambda k: u(k) >= u_lo, d.shape, pow2)
        exit_ = _first_true(lambda k: u(k) > u_hi, d.shape, pow2)
        return enter, exit_

    # screen-bounds break as a searched index: inside-set is one k-interval
    # (see docstring); oob(k) is its complement, so the first oob sample is 0
    # when the interval misses k=0, else the interval's exclusive end. The
    # integer-valued xf makes `xf >= WIDTH` ⟺ `xf > WIDTH-1`, so the [0, W-1]
    # box bounds reproduce the reference's `< 0 || >= WIDTH` test exactly.
    sx_in, sx_out = axis_interval(self_x, dx, f32(0.0), f32(WIDTH - 1))
    sy_in, sy_out = axis_interval(self_y, dy, f32(0.0), f32(HEIGHT - 1))
    inside_start = jnp.maximum(sx_in, sy_in)
    inside_end = jnp.minimum(sx_out, sy_out)
    first_oob = jnp.where(inside_start > 0, 0, inside_end)  # (R,)
    first = jnp.minimum(first, 2 * first_oob)

    last_k = jnp.int32(nsamp - 1)
    for m_i in range(obs_x.shape[0]):
        kx_in, kx_out = axis_interval(self_x, dx, lox[m_i], hix[m_i])
        ky_in, ky_out = axis_interval(self_y, dy, loy[m_i], hiy[m_i])
        start = jnp.maximum(jnp.maximum(kx_in, ky_in), 1)   # pos_dist: k >= 1
        end = jnp.minimum(kx_out, ky_out) - 1
        valid = (start <= end) & (start <= last_k)
        obs_code = jnp.where(valid, 2 * start + 1, big)
        first = jnp.minimum(first, obs_code)

    hit = (first < big) & ((first & 1) == 1)
    return jnp.where(hit, (first >> 1).astype(f32) * f32(step_size),
                     f32(max_dist))
