"""NPC traffic flow: masked fixed-slot spawn/despawn + P/ACC/ghost-scan control.

TPU-native redesign of the reference's dynamic ``std::vector<Car>`` NPC system
(reference: cpp/TrafficFlow.cpp). Key transformations:

  - Dynamic vector with erase -> ``MAX_NPCS`` fixed slots with an ``alive``
    mask; spawn writes the first free slot, despawn clears the mask.
  - Vector order (insertion order; erase preserves it) -> monotonically
    increasing per-NPC ``uid``. The reference's pointer-address yield
    tie-break (TrafficFlow.cpp:171-175) compares addresses *within one
    contiguous vector*, which is exactly insertion order — so ``uid``
    comparison reproduces it deterministically.
  - The reference updates NPCs sequentially — NPC j sees NPC i<j's already
    updated state within the same tick (TrafficFlow.cpp:337-344) — so the
    controller phase is a ``lax.fori_loop`` over slots in uid order, with the
    per-NPC planning fully vectorized inside.
  - NPC-NPC collision removal iterates ordered pairs with live alive checks
    (TrafficFlow.cpp:346-356); reproduced as a fori_loop over rows with a
    vectorized inner sweep.

Spawning (TrafficFlow.cpp:321-328): Bernoulli(1 - exp(-density*dt)) then a
uniform route choice. The reference RNG is an unseedable mt19937; here the
decision comes from a jax.random key threaded through EnvState, and the
differential-test harness injects identical decisions into the C++ oracle.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .constants import (
    CAR_LENGTH,
    CAR_WIDTH,
    HEIGHT,
    LANE_WIDTH_PX,
    PATH_LEN,
    PHYSICS_MAX_SPEED,
    PI_F,
    WIDTH,
)
from .physics import car_physics_step, car_corners, sat_overlap, update_path_index, wrap_angle

_F = jnp.float32
_PI32 = np.float32(PI_F)
_DEG45 = np.float32(45.0) * _PI32 / np.float32(180.0)
_DEG60 = np.float32(60.0) * _PI32 / np.float32(180.0)
_DEG30 = np.float32(30.0) * _PI32 / np.float32(180.0)
_DEG150 = np.float32(150.0) * _PI32 / np.float32(180.0)
_SAFE_RADIUS = np.float32(CAR_WIDTH * 2.0)            # 48 px
_SAFE_RADIUS_SQ = _SAFE_RADIUS * _SAFE_RADIUS
_SCAN_STEPS = 120
_CX = np.float32(WIDTH * 0.5)
_CY = np.float32(HEIGHT * 0.5)
_UID_MAX = np.int32(np.iinfo(np.int32).max)


class NpcState(NamedTuple):
    """Fixed-slot NPC pool. All arrays have leading dim MAX_NPCS."""

    alive: jnp.ndarray          # (M,) bool
    x: jnp.ndarray              # (M,) f32
    y: jnp.ndarray              # (M,) f32
    v: jnp.ndarray              # (M,) f32
    heading: jnp.ndarray        # (M,) f32
    steering_angle: jnp.ndarray # (M,) f32
    route_id: jnp.ndarray       # (M,) i32
    path_index: jnp.ndarray     # (M,) i32
    uid: jnp.ndarray            # (M,) i32 — insertion order; dead slots stale
    next_uid: jnp.ndarray       # () i32


def init_npc_state(max_npcs: int) -> NpcState:
    z = jnp.zeros((max_npcs,), jnp.float32)
    return NpcState(
        alive=jnp.zeros((max_npcs,), bool),
        x=z, y=z, v=z, heading=z, steering_angle=z,
        route_id=jnp.zeros((max_npcs,), jnp.int32),
        path_index=jnp.zeros((max_npcs,), jnp.int32),
        uid=jnp.zeros((max_npcs,), jnp.int32),
        next_uid=jnp.int32(0),
    )


def spawn_decision(key, num_traffic_routes: int, density, dt) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Draw (do_try, route_choice) like TrafficFlow.cpp:321-328 / 275-279."""
    k1, k2 = jax.random.split(key)
    spawn_prob = _F(1.0) - jnp.exp(-jnp.asarray(density, _F) * jnp.asarray(dt, _F))
    u = jax.random.uniform(k1, (), _F)
    do_try = u < spawn_prob
    route_choice = jax.random.randint(k2, (), 0, max(num_traffic_routes, 1), jnp.int32)
    return do_try, route_choice


def _plan_npc_action(sx, sy, sv, sh, my_uid, others, pi0, x, y, v, heading, uid, path,
                     exact_trig: bool = False):
    """Plan one NPC's (throttle, steer) — TrafficFlow.cpp:50-196, fully masked.

    ``sx/sy/sv/sh`` are the planner's own pose, ``my_uid`` its uid, ``others``
    the (M,) mask of alive NPCs excluding itself; the slot arrays hold the
    *current* (possibly mid-tick-updated) poses. ``path`` is this NPC's
    (PATH_LEN, 2) polyline, ``pi0`` its refreshed path index. Own-pose scalars
    are passed in (not read via ``x[slot]``) so the exact mode's sequential
    loop stays free of per-iteration dynamic gathers.
    """

    # --- 1) lateral: P-control on lookahead heading error (TrafficFlow.cpp:52-64)
    tgt_idx = jnp.minimum(pi0 + 12, PATH_LEN - 1)
    tx, ty = path[tgt_idx, 0], path[tgt_idx, 1]
    if exact_trig:
        # the steer command is CONTINUOUS (feeds the steering integral), so
        # NPC heading bit-exactness needs the libm atan2f here; every other
        # transcendental in the planner only feeds threshold comparisons
        from ..ops.exact_libm import atan2f_exact
        angle_to_target = atan2f_exact(-(ty - sy), tx - sx)
    else:
        angle_to_target = jnp.arctan2(-(ty - sy), tx - sx)
    heading_err = wrap_angle(angle_to_target - sh)
    steer_cmd = jnp.clip(heading_err * _F(3.0), _F(-1.0), _F(1.0))

    # --- 2) longitudinal: cruise + front-car braking (TrafficFlow.cpp:66-75)
    target_speed = _F(PHYSICS_MAX_SPEED * 0.4)
    acc_throttle = jnp.where(
        sv < target_speed, _F(0.5), jnp.where(sv > target_speed + _F(1.0), _F(-0.1), _F(0.0))
    )

    vx_dir = jnp.cos(sh)
    vy_dir = -jnp.sin(sh)
    dx = x - sx
    dy = y - sy
    dist = jnp.hypot(dx, dy)
    dot = (dx * vx_dir + dy * vy_dir) / (dist + _F(1e-5))
    angle_diff = jnp.abs(wrap_angle(sh - heading))
    front_ok = others & (dist <= _F(80.0)) & (dot > _F(0.8)) & (angle_diff < _DEG45)
    front_dist = jnp.min(jnp.where(front_ok, dist, _F(1e9)))
    acc_throttle = jnp.where(front_dist < _F(30.0), _F(-1.0),
                             jnp.where(front_dist < _F(50.0), jnp.minimum(acc_throttle, _F(-0.2)),
                                       acc_throttle))

    # --- 3) ghost path scan (TrafficFlow.cpp:77-185)
    # Dense masked sweep over ALL path points with a [pi0, pi0+K) window mask
    # instead of gathering the 120-point window (TPU gathers are slow; the
    # full-path sweep is pure VPU work). Layout: the big tensors are (M, K)
    # with the K=160 path axis minor-most — K in lanes keeps the VPU's
    # 128-wide registers full, where a (K, M) layout would run at 32/128
    # lane utilization.
    iota = jnp.arange(PATH_LEN, dtype=jnp.int32)
    scan_valid = (iota >= pi0) & (iota < pi0 + _SCAN_STEPS)  # (K,)
    gx, gy = path[:, 0], path[:, 1]                          # (K,)

    # per-other x per-point proximity
    dxk = x[:, None] - gx[None, :]
    dyk = y[:, None] - gy[None, :]
    close = dxk * dxk + dyk * dyk < _SAFE_RADIUS_SQ       # (M, K)

    # same-direction exclusion (handled by ACC): angle_diff < 60 deg
    same_dir = angle_diff < _DEG60                        # (M,)

    # side-by-side exclusion (TrafficFlow.cpp:101-160) — depends only on poses
    adn = jnp.minimum(angle_diff, _F(2.0) * _PI32 - angle_diff)
    is_parallel = (adn < _DEG30) | (adn > _DEG150)
    longi = dx * vx_dir + dy * vy_dir
    lat = jnp.sqrt(jnp.maximum(_F(0.0), dist * dist - longi * longi))
    sideways = jnp.abs(lat) < _F(LANE_WIDTH_PX * 1.5)
    not_far = jnp.abs(longi) < _F(CAR_LENGTH * 2.0)

    fdist = _F(20.0)
    mfx = sx + vx_dir * fdist
    mfy = sy + vy_dir * fdist
    ofx = x + jnp.cos(heading) * fdist
    ofy = y - jnp.sin(heading) * fdist
    fdx = ofx - mfx
    fdy = ofy - mfy
    fmag = jnp.hypot(fdx, fdy)
    flong = fdx * vx_dir + fdy * vy_dir
    flat = jnp.sqrt(jnp.maximum(_F(0.0), fmag * fmag - flong * flong))
    stable = jnp.abs(flat - lat) < _F(LANE_WIDTH_PX * 0.5)
    skip_parallel = (
        (dist > _F(1e-5)) & is_parallel & sideways & not_far & (fmag > _F(1e-5)) & stable
    )                                                      # (M,)

    # yield rules (TrafficFlow.cpp:162-177). Factorized: should_yield(k, o) =
    # rule1(k) | rules234(o), so the (K, M) combine collapses to two
    # any-over-others reductions on (M, K) instead of a dense rule tensor —
    # boolean algebra only, decisions unchanged bit for bit.
    my_dc = jnp.hypot(sx - _CX, sy - _CY)
    other_dc = jnp.hypot(x - _CX, y - _CY)                 # (M,)
    dtc = jnp.hypot(gx - sx, gy - sy)                      # (K,) dist to would-be crash point

    rule1 = dtc < _F(15.0)                                 # (K,)
    rule2 = (sv < _F(1.0)) & (v > _F(3.0)) & (other_dc < my_dc + _F(25.0))
    rule3 = other_dc < my_dc - _F(5.0)
    rule4 = (jnp.abs(other_dc - my_dc) <= _F(5.0)) & (my_uid < uid)
    rules234 = rule2 | rule3 | rule4                       # (M,)

    okm = others & ~same_dir & ~skip_parallel              # (M,) considered others
    any_considered = jnp.any(close & okm[:, None], axis=0)            # (K,)
    any_rule234 = jnp.any(close & (okm & rules234)[:, None], axis=0)  # (K,)
    point_conflict = scan_valid & ((rule1 & any_considered) | any_rule234)

    conflict = jnp.any(point_conflict)
    first_k = jnp.argmax(point_conflict)
    # one-hot contraction instead of dtc[first_k]: a per-lane dynamic gather
    # under vmap stages badly on TPU; the masked sum picks the same float.
    min_conflict_dist = jnp.sum(jnp.where(iota == first_k, dtc, _F(0.0)))

    # --- 4) combine (TrafficFlow.cpp:187-195)
    braked = jnp.where(min_conflict_dist < _F(35.0), _F(-1.0),
                       jnp.where(min_conflict_dist < _F(60.0), _F(-0.8),
                                 jnp.minimum(acc_throttle, _F(0.0))))
    throttle = jnp.where(conflict, braked, acc_throttle)
    return throttle, steer_cmd


def npc_controller_update_serial(npc: NpcState, paths_table, dt,
                                 exact_acc: bool = False,
                                 exact_trig: bool = False) -> NpcState:
    """Sequential per-NPC plan+update pass (TrafficFlow.cpp:330-344).

    ``paths_table``: (R, PATH_LEN, 2) route polyline table.

    This is the direct transcription of the reference's one-NPC-at-a-time
    loop; ``npc_controller_update`` (the default exact mode) produces
    bitwise-identical results with conflict-graph wave scheduling and is
    much faster on TPU. Kept as the semantic ground truth for the
    serial-vs-waves differential test (tests/test_npc.py).
    """
    max_npcs = npc.alive.shape[0]
    order_key = jnp.where(npc.alive, npc.uid, _UID_MAX)
    perm = jnp.argsort(order_key).astype(jnp.int32)
    # all slot paths fetched once per tick with one MXU contraction; inside
    # the loop each slot's row comes from a (M,)x(M,P*2) one-hot matmul —
    # per-iteration dynamic gathers/scatters (paths_table[route_id[slot]],
    # .at[slot].set) serialize badly on TPU
    from .physics import gather_rows_matmul
    paths_all = gather_rows_matmul(paths_table, npc.route_id)  # (M, P, 2)
    paths_flat = paths_all.reshape(max_npcs, -1)
    miota = jnp.arange(max_npcs, dtype=jnp.int32)

    def body(p, carry):
        x, y, v, heading, steering, path_index = carry
        slot = perm[p]
        oh = miota == slot                                # (M,) one-hot
        present = jnp.any(oh & npc.alive)

        def sel(a):
            return jnp.sum(jnp.where(oh, a, jnp.zeros_like(a)))

        path = jnp.matmul(oh.astype(_F), paths_flat,
                          precision=jax.lax.Precision.HIGHEST).reshape(PATH_LEN, 2)
        sx, sy, sv, sh = sel(x), sel(y), sel(v), sel(heading)
        pi0 = update_path_index(path, PATH_LEN, sel(path_index), sx, sy)
        throttle, steer = _plan_npc_action(
            sx, sy, sv, sh, sel(npc.uid), npc.alive & ~oh, pi0,
            x, y, v, heading, npc.uid, path, exact_trig=exact_trig)
        out = car_physics_step(sx, sy, sv, sh, sel(steering), throttle,
                               steer, dt, exact_acc=exact_acc,
                               exact_trig=exact_trig)
        pi1 = update_path_index(path, PATH_LEN, pi0, out.x, out.y)

        write = oh & present
        x = jnp.where(write, out.x, x)
        y = jnp.where(write, out.y, y)
        v = jnp.where(write, out.v, v)
        heading = jnp.where(write, out.heading, heading)
        steering = jnp.where(write, out.steering_angle, steering)
        path_index = jnp.where(write, pi1, path_index)
        return (x, y, v, heading, steering, path_index)

    x, y, v, heading, steering, path_index = jax.lax.fori_loop(
        0, max_npcs, body,
        (npc.x, npc.y, npc.v, npc.heading, npc.steering_angle, npc.path_index),
    )
    return npc._replace(x=x, y=y, v=v, heading=heading, steering_angle=steering,
                        path_index=path_index)


def npc_collisions_serial(npc: NpcState) -> NpcState:
    """Ordered pairwise NPC-NPC SAT removal (TrafficFlow.cpp:346-356).

    Row i kills every later still-alive j it overlaps, and dies itself if any;
    rows run in vector (uid) order with live alive flags, matching the
    sequential reference loop exactly. Ground-truth twin of the default
    ``npc_collisions`` (sparse killer-row cascade, bitwise identical).
    """
    max_npcs = npc.alive.shape[0]
    corners = car_corners(npc.x, npc.y, npc.heading)       # (M, 4, 2)
    collide = sat_overlap(
        corners[:, None], npc.heading[:, None], corners[None, :], npc.heading[None, :]
    )                                                      # (M, M)

    order_key = jnp.where(npc.alive, npc.uid, _UID_MAX)
    perm = jnp.argsort(order_key).astype(jnp.int32)
    later = npc.uid[:, None] < npc.uid[None, :]            # uid order == vector order
    miota = jnp.arange(max_npcs, dtype=jnp.int32)

    def body(p, alive):
        i = perm[p]
        oh = miota == i                                    # one-hot row select:
        row_active = jnp.any(oh & alive)                   # no dynamic gather/
        later_i = jnp.any(later & oh[:, None], axis=0)     # scatter inside the
        collide_i = jnp.any(collide & oh[:, None], axis=0)  # sequential loop
        j_kill = row_active & alive & later_i & collide_i
        alive = alive & ~j_kill
        return jnp.where(oh, alive & ~jnp.any(j_kill), alive)

    alive = jax.lax.fori_loop(0, max_npcs, body, npc.alive)
    return npc._replace(alive=alive)


# --------------------------------------------- conflict-graph hybrid mode
#
# The reference updates NPCs one at a time in vector order, each seeing the
# already-moved poses of earlier NPCs (TrafficFlow.cpp:337-344). That does
# NOT force full serialization: NPC j's (throttle, steer) reads NPC i's pose
# only through gates that require i to be near j —
#   * ACC front check: dist(i, j) <= 80 px      (get_front_car_dist_tf)
#   * ghost scan:      dist(i, scan point of j) < 48 px (SAFE_RADIUS)
# and every pose moves at most PHYSICS_MAX_SPEED = 8 px per tick. So a
# conservative interaction graph built from PRE-tick poses with radii
# 80+8+1 / 48+8+1 covers every pair that could possibly read each other
# mid-tick. Slots with NO interacting earlier-order neighbor see a world
# where every earlier slot's update is invisible to them — their sequential
# result is bitwise identical to planning against the pre-tick snapshot, so
# they all update in ONE vectorized pass. The (rare) dependent slots are
# then replayed one at a time in uid order, which reproduces the sequential
# semantics exactly: when a dependent slot plans, every earlier-order slot
# has already been written (independent ones in the dense pass, dependent
# ones earlier in the cleanup loop), and every later-order slot that could
# read it is itself dependent (the graph is symmetric) and thus still
# unwritten. Typical cleanup depth at density 1.0 is 0-3 vs a full
# MAX_NPCS=32 sequential sweep.

_ACC_REACH_SQ = np.float32((80.0 + PHYSICS_MAX_SPEED + 1.0) ** 2)
_SCAN_REACH = np.float32(float(_SAFE_RADIUS) + PHYSICS_MAX_SPEED + 1.0)
_SCAN_REACH_SQ = _SCAN_REACH * _SCAN_REACH
_CHUNK = 16  # path points per AABB chunk in the conservative graph


def _interaction_graph(npc: NpcState, paths_all, pi0):
    """Symmetric conservative could-read matrix from pre-tick poses.

    paths_all: (M, P, 2) per-slot route polylines; pi0: (M,) refreshed path
    indices (own-pose only, so identical pre/mid tick). Returns (M, M) bool.

    The ghost-scan reach test uses per-chunk path AABBs (point-to-box
    distance is a lower bound on point-to-scan-point distance, and the chunk
    window is a superset of the scan window), so the graph build touches
    (M, P/CHUNK, M) elements instead of (M, P, M) — conservativeness is all
    that's needed here, exactness lives in the planner itself.
    """
    max_npcs = npc.alive.shape[0]
    dx = npc.x[:, None] - npc.x[None, :]
    dy = npc.y[:, None] - npc.y[None, :]
    acc_reach = dx * dx + dy * dy <= _ACC_REACH_SQ

    nchunk = PATH_LEN // _CHUNK
    pc = paths_all.reshape(max_npcs, nchunk, _CHUNK, 2)
    cmin = pc.min(axis=2)                                     # (M, C, 2)
    cmax = pc.max(axis=2)
    cstart = jnp.arange(nchunk, dtype=jnp.int32) * _CHUNK
    win = (cstart[None, :] + _CHUNK > pi0[:, None]) & \
          (cstart[None, :] < pi0[:, None] + _SCAN_STEPS)      # (M, C)

    ox = npc.x[None, None, :]
    oy = npc.y[None, None, :]
    ddx = jnp.maximum(jnp.maximum(cmin[:, :, 0][:, :, None] - ox,
                                  ox - cmax[:, :, 0][:, :, None]), _F(0.0))
    ddy = jnp.maximum(jnp.maximum(cmin[:, :, 1][:, :, None] - oy,
                                  oy - cmax[:, :, 1][:, :, None]), _F(0.0))
    near = ddx * ddx + ddy * ddy <= _SCAN_REACH_SQ            # (M, C, M)
    scan_reach = jnp.any(win[:, :, None] & near, axis=1)      # [j, i]: i near j's scan

    both = npc.alive[:, None] & npc.alive[None, :]
    eye = jnp.eye(max_npcs, dtype=bool)
    return (acc_reach | scan_reach | scan_reach.T) & both & ~eye


def npc_controller_update(npc: NpcState, paths_table, dt,
                          wave_cleanup: bool = False,
                          exact_acc: bool = False,
                          exact_trig: bool = False) -> NpcState:
    """Exact controller pass: one dense synchronous plan+integrate for every
    slot with no interacting earlier-order neighbor, then a uid-ordered
    cleanup for the dependent rest (see block comment above). Bitwise
    identical to ``npc_controller_update_serial`` (asserted by
    tests/test_npc.py's serial-vs-hybrid differential).

    wave_cleanup selects the cleanup schedule (VERDICT r3 task 5):
      * False — one slot per while iteration (min-uid pending). Iteration
        body is cheap (one (M,K) plan), but under vmap the trip count is
        the BATCH max of per-env dependent counts, which grows with batch
        size (PERF.md: the exact mode's B=8192 ceiling).
      * True — one WAVE per iteration: every pending slot whose interacting
        earlier-uid neighbors are all settled plans against the current
        arrays and writes. Within a wave, ready slots never interact (an
        interacting later one is blocked by its earlier partner), and
        non-interacting state is invisible to a plan by the graph's
        distance gates — so the wave replay is bitwise equal to the serial
        order. The body costs a full dense (M,M,K) plan, but the trip
        count is the batch max of DAG DEPTHS (typically 1-2) instead of
        dependent counts.
    """
    max_npcs = npc.alive.shape[0]
    from .physics import gather_rows_matmul
    paths = gather_rows_matmul(paths_table, npc.route_id)      # (M, P, 2)
    pi0 = update_path_index(paths, PATH_LEN, npc.path_index, npc.x, npc.y)

    interact = _interaction_graph(npc, paths, pi0)
    earlier = npc.uid[:, None] < npc.uid[None, :]
    dependent = npc.alive & jnp.any(interact & earlier, axis=0)

    # dense pass: plan everyone against the pre-tick snapshot, write the
    # independent slots (dependent slots' plans are recomputed below)
    eye = jnp.eye(max_npcs, dtype=bool)

    def plan_one(sx, sy, sv, sh, su, pi, path, oh):
        return _plan_npc_action(sx, sy, sv, sh, su, npc.alive & ~oh, pi,
                                npc.x, npc.y, npc.v, npc.heading, npc.uid,
                                path, exact_trig=exact_trig)

    throttle, steer = jax.vmap(plan_one)(npc.x, npc.y, npc.v, npc.heading,
                                         npc.uid, pi0, paths, eye)
    out = car_physics_step(npc.x, npc.y, npc.v, npc.heading,
                           npc.steering_angle, throttle, steer, dt,
                           exact_acc=exact_acc, exact_trig=exact_trig)
    pi1 = update_path_index(paths, PATH_LEN, pi0, out.x, out.y)
    write0 = npc.alive & ~dependent
    x = jnp.where(write0, out.x, npc.x)
    y = jnp.where(write0, out.y, npc.y)
    v = jnp.where(write0, out.v, npc.v)
    heading = jnp.where(write0, out.heading, npc.heading)
    steering = jnp.where(write0, out.steering_angle, npc.steering_angle)
    path_index = jnp.where(write0, pi1, npc.path_index)

    # uid-ordered cleanup of dependent slots
    paths_flat = paths.reshape(max_npcs, -1)

    def cond(carry):
        return jnp.any(carry[0])

    def body_wave(carry):
        pending, x, y, v, heading, steering, path_index = carry
        ready = pending & ~jnp.any(interact & earlier & pending[:, None],
                                   axis=0)

        def plan_cur(sx, sy, sv, sh, su, pi, path, oh):
            return _plan_npc_action(sx, sy, sv, sh, su, npc.alive & ~oh, pi,
                                    x, y, v, heading, npc.uid, path,
                                    exact_trig=exact_trig)

        th, st = jax.vmap(plan_cur)(x, y, v, heading, npc.uid, pi0, paths, eye)
        o = car_physics_step(x, y, v, heading, steering, th, st, dt,
                             exact_acc=exact_acc, exact_trig=exact_trig)
        p1 = update_path_index(paths, PATH_LEN, pi0, o.x, o.y)
        return (
            pending & ~ready,
            jnp.where(ready, o.x, x),
            jnp.where(ready, o.y, y),
            jnp.where(ready, o.v, v),
            jnp.where(ready, o.heading, heading),
            jnp.where(ready, o.steering_angle, steering),
            jnp.where(ready, p1, path_index),
        )

    def body(carry):
        pending, x, y, v, heading, steering, path_index = carry
        first_uid = jnp.min(jnp.where(pending, npc.uid, _UID_MAX))
        oh = pending & (npc.uid == first_uid)                  # (M,) one-hot

        def sel(a):
            return jnp.sum(jnp.where(oh, a, jnp.zeros_like(a)))

        path = jnp.matmul(oh.astype(_F), paths_flat,
                          precision=jax.lax.Precision.HIGHEST).reshape(PATH_LEN, 2)
        sx, sy, sv, sh = sel(x), sel(y), sel(v), sel(heading)
        th, st = _plan_npc_action(sx, sy, sv, sh, sel(npc.uid),
                                  npc.alive & ~oh, sel(pi0),
                                  x, y, v, heading, npc.uid, path,
                                  exact_trig=exact_trig)
        o = car_physics_step(sx, sy, sv, sh, sel(steering), th, st, dt,
                             exact_acc=exact_acc, exact_trig=exact_trig)
        p1 = update_path_index(path, PATH_LEN, sel(pi0), o.x, o.y)
        return (
            pending & ~oh,
            jnp.where(oh, o.x, x),
            jnp.where(oh, o.y, y),
            jnp.where(oh, o.v, v),
            jnp.where(oh, o.heading, heading),
            jnp.where(oh, o.steering_angle, steering),
            jnp.where(oh, p1, path_index),
        )

    init = (dependent, x, y, v, heading, steering, path_index)
    _, x, y, v, heading, steering, path_index = jax.lax.while_loop(
        cond, body_wave if wave_cleanup else body, init)
    return npc._replace(x=x, y=y, v=v, heading=heading, steering_angle=steering,
                        path_index=path_index)


def npc_collisions(npc: NpcState) -> NpcState:
    """Sparse killer-row cascade, bitwise equal to the ordered serial loop.

    The sequential semantics (TrafficFlow.cpp:346-356) only change state at
    "killer rows" — rows still alive that overlap a later still-alive row.
    Rows that kill nothing leave the alive vector untouched, so processing
    killer rows alone, lowest uid first with live recomputation, reproduces
    the full ordered cascade. Collisions are rare (spawn blocking keeps NPCs
    apart), so the while_loop usually runs zero iterations instead of the
    serial version's MAX_NPCS."""
    corners = car_corners(npc.x, npc.y, npc.heading)           # (M, 4, 2)
    collide = sat_overlap(
        corners[:, None], npc.heading[:, None], corners[None, :], npc.heading[None, :]
    )                                                          # (M, M)
    later = npc.uid[:, None] < npc.uid[None, :]

    def killer_rows(alive):
        return jnp.any(collide & later & alive[None, :], axis=1) & alive

    def cond(alive):
        return jnp.any(killer_rows(alive))

    def body(alive):
        k = killer_rows(alive)
        first_uid = jnp.min(jnp.where(k, npc.uid, _UID_MAX))
        is_i = k & (npc.uid == first_uid)
        victims = jnp.any(collide & later & is_i[:, None], axis=0) & alive
        return alive & ~victims & ~is_i

    alive = jax.lax.while_loop(cond, body, npc.alive)
    return npc._replace(alive=alive)


def npc_despawn(npc: NpcState, goal_xy) -> NpcState:
    """Remove arrived / out-of-screen NPCs (TrafficFlow.cpp:358-366).

    ``goal_xy``: (R, 2) per-route goal points (path[-1]).
    """
    gx = goal_xy[npc.route_id, 0]
    gy = goal_xy[npc.route_id, 1]
    arrived = jnp.hypot(npc.x - gx, npc.y - gy) < _F(20.0)
    margin = _F(100.0)
    oos = (
        (npc.x < -margin) | (npc.x > _F(WIDTH) + margin)
        | (npc.y < -margin) | (npc.y > _F(HEIGHT) + margin)
    )
    return npc._replace(alive=npc.alive & ~arrived & ~oos)


def npc_try_spawn(npc: NpcState, do_try, route_choice, ego_x, ego_y, ego_present,
                  traffic_route_ids, spawn_xy, spawn_heading) -> Tuple[NpcState, jnp.ndarray]:
    """One spawn attempt (TrafficFlow.cpp:240-315): blocked within 2.5*CAR_LENGTH
    of any ego or NPC; writes the first free slot. Returns (state, spawned)."""
    num_routes = traffic_route_ids.shape[0]
    if num_routes == 0:
        return npc, jnp.asarray(False)

    rid = traffic_route_ids[jnp.clip(route_choice, 0, num_routes - 1)]
    sx = spawn_xy[rid, 0]
    sy = spawn_xy[rid, 1]

    min_d2 = _F(CAR_LENGTH * 2.5) ** 2
    blocked_ego = jnp.any(ego_present & (((ego_x - sx) ** 2 + (ego_y - sy) ** 2) < min_d2))
    blocked_npc = jnp.any(npc.alive & (((npc.x - sx) ** 2 + (npc.y - sy) ** 2) < min_d2))

    has_free = jnp.any(~npc.alive)
    slot = jnp.argmax(~npc.alive).astype(jnp.int32)
    spawned = do_try & ~blocked_ego & ~blocked_npc & has_free

    def set1(a, val):
        return jnp.where(spawned, a.at[slot].set(val), a)

    npc = NpcState(
        alive=set1(npc.alive, True),
        x=set1(npc.x, sx),
        y=set1(npc.y, sy),
        v=set1(npc.v, _F(0.0)),
        heading=set1(npc.heading, spawn_heading[rid]),
        steering_angle=set1(npc.steering_angle, _F(0.0)),
        route_id=set1(npc.route_id, rid),
        path_index=set1(npc.path_index, jnp.int32(0)),
        uid=set1(npc.uid, npc.next_uid),
        next_uid=jnp.where(spawned, npc.next_uid + 1, npc.next_uid),
    )
    return npc, spawned


def npc_traffic_update(npc: NpcState, paths_table, goal_xy, spawn_xy, spawn_heading,
                       traffic_route_ids, ego_x, ego_y, ego_present,
                       do_try, route_choice, dt, wave_cleanup: bool = False,
                       exact_acc: bool = False, exact_trig: bool = False):
    """Full per-tick NPC pipeline (TrafficFlow.cpp:318-367): spawn attempt ->
    sequential controller updates -> ordered collision removal -> despawn."""
    npc, spawned = npc_try_spawn(npc, do_try, route_choice, ego_x, ego_y, ego_present,
                                 traffic_route_ids, spawn_xy, spawn_heading)
    npc = npc_controller_update(npc, paths_table, dt, wave_cleanup=wave_cleanup,
                                exact_acc=exact_acc, exact_trig=exact_trig)
    npc = npc_collisions(npc)
    npc = npc_despawn(npc, goal_xy)
    return npc, spawned


def npc_traffic_update_serial(npc: NpcState, paths_table, goal_xy, spawn_xy,
                              spawn_heading, traffic_route_ids, ego_x, ego_y,
                              ego_present, do_try, route_choice, dt,
                              exact_acc: bool = False,
                              exact_trig: bool = False):
    """Ground-truth serial per-tick NPC pipeline: the direct transcription of
    the reference's sequential loops. ``npc_traffic_update`` (wave-scheduled)
    must match this bitwise; see tests/test_npc.py."""
    npc, spawned = npc_try_spawn(npc, do_try, route_choice, ego_x, ego_y,
                                 ego_present, traffic_route_ids, spawn_xy,
                                 spawn_heading)
    npc = npc_controller_update_serial(npc, paths_table, dt,
                                       exact_acc=exact_acc,
                                       exact_trig=exact_trig)
    npc = npc_collisions_serial(npc)
    npc = npc_despawn(npc, goal_xy)
    return npc, spawned


# ----------------------------------------------------------------- fast mode
def npc_controller_update_fast(npc: NpcState, paths_table, dt,
                               exact_acc: bool = False,
                               exact_trig: bool = False) -> NpcState:
    """Synchronous (vectorized) controller pass — the opt-in training-speed
    variant of npc_controller_update. All NPCs plan against the same pre-tick
    snapshot instead of the reference's sequential in-place updates
    (TrafficFlow.cpp:337-344), then integrate together. Behavior differs from
    the exact mode only through same-tick pose deltas (<= v_max px); use
    EnvConfig.npc_mode='fast' for throughput, 'exact' for bit-match work."""
    max_npcs = npc.alive.shape[0]
    slots = jnp.arange(max_npcs, dtype=jnp.int32)

    # one-hot matmul row fetch (TPU gathers of table rows are slow)
    from .physics import gather_rows_matmul
    paths = gather_rows_matmul(paths_table, npc.route_id)
    pi0 = update_path_index(paths, PATH_LEN, npc.path_index, npc.x, npc.y)

    def plan_one(slot, pi, path):
        others = npc.alive & (slots != slot)
        return _plan_npc_action(npc.x[slot], npc.y[slot], npc.v[slot],
                                npc.heading[slot], npc.uid[slot], others, pi,
                                npc.x, npc.y, npc.v, npc.heading, npc.uid,
                                path, exact_trig=exact_trig)

    throttle, steer = jax.vmap(plan_one)(slots, pi0, paths)
    out = car_physics_step(npc.x, npc.y, npc.v, npc.heading, npc.steering_angle,
                           throttle, steer, dt, exact_acc=exact_acc,
                           exact_trig=exact_trig)
    pi1 = update_path_index(paths, PATH_LEN, pi0, out.x, out.y)

    keep = npc.alive
    return npc._replace(
        x=jnp.where(keep, out.x, npc.x),
        y=jnp.where(keep, out.y, npc.y),
        v=jnp.where(keep, out.v, npc.v),
        heading=jnp.where(keep, out.heading, npc.heading),
        steering_angle=jnp.where(keep, out.steering_angle, npc.steering_angle),
        path_index=jnp.where(keep, pi1, npc.path_index),
    )


def npc_collisions_fast(npc: NpcState) -> NpcState:
    """Synchronous pairwise removal: any alive NPC overlapping another alive
    NPC dies (approximates the ordered row semantics of npc_collisions; they
    differ only in chained-kill corner cases)."""
    corners = car_corners(npc.x, npc.y, npc.heading)
    collide = sat_overlap(
        corners[:, None], npc.heading[:, None], corners[None, :], npc.heading[None, :])
    m = npc.alive.shape[0]
    off_diag = ~jnp.eye(m, dtype=bool)
    hit = jnp.any(collide & off_diag & npc.alive[None, :], axis=-1) & npc.alive
    return npc._replace(alive=npc.alive & ~hit)


def npc_traffic_update_fast(npc: NpcState, paths_table, goal_xy, spawn_xy,
                            spawn_heading, traffic_route_ids, ego_x, ego_y,
                            ego_present, do_try, route_choice, dt,
                            exact_acc: bool = False,
                            exact_trig: bool = False):
    """Fast-mode per-tick NPC pipeline (see npc_traffic_update)."""
    npc, spawned = npc_try_spawn(npc, do_try, route_choice, ego_x, ego_y,
                                 ego_present, traffic_route_ids, spawn_xy,
                                 spawn_heading)
    npc = npc_controller_update_fast(npc, paths_table, dt,
                                     exact_acc=exact_acc,
                                     exact_trig=exact_trig)
    npc = npc_collisions_fast(npc)
    npc = npc_despawn(npc, goal_xy)
    return npc, spawned
