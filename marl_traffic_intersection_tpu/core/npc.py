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


def _plan_npc_action(sx, sy, sv, sh, my_uid, others, pi0, x, y, v, heading, uid, path):
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
    # full-path sweep is pure VPU work).
    iota = jnp.arange(PATH_LEN, dtype=jnp.int32)
    scan_valid = (iota >= pi0) & (iota < pi0 + _SCAN_STEPS)  # (P,)
    gx, gy = path[:, 0], path[:, 1]                          # (P,)

    # per-point x per-other proximity
    d_og_sq = (x[None, :] - gx[:, None]) ** 2 + (y[None, :] - gy[:, None]) ** 2
    close = d_og_sq < _SAFE_RADIUS_SQ                     # (K, M)

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

    # yield rules (TrafficFlow.cpp:162-177)
    my_dc = jnp.hypot(sx - _CX, sy - _CY)
    other_dc = jnp.hypot(x - _CX, y - _CY)                 # (M,)
    dtc = jnp.hypot(gx - sx, gy - sy)                      # (K,) dist to would-be crash point

    rule1 = dtc[:, None] < _F(15.0)
    rule2 = (sv < _F(1.0)) & (v[None, :] > _F(3.0)) & (other_dc[None, :] < my_dc + _F(25.0))
    rule3 = other_dc[None, :] < my_dc - _F(5.0)
    rule4 = (jnp.abs(other_dc - my_dc)[None, :] <= _F(5.0)) & (my_uid < uid)[None, :]
    should_yield = rule1 | rule2 | rule3 | rule4

    consider = close & others[None, :] & ~same_dir[None, :] & ~skip_parallel[None, :]
    point_conflict = scan_valid & jnp.any(consider & should_yield, axis=-1)  # (K,)

    conflict = jnp.any(point_conflict)
    first_k = jnp.argmax(point_conflict)
    min_conflict_dist = dtc[first_k]

    # --- 4) combine (TrafficFlow.cpp:187-195)
    braked = jnp.where(min_conflict_dist < _F(35.0), _F(-1.0),
                       jnp.where(min_conflict_dist < _F(60.0), _F(-0.8),
                                 jnp.minimum(acc_throttle, _F(0.0))))
    throttle = jnp.where(conflict, braked, acc_throttle)
    return throttle, steer_cmd


def npc_controller_update(npc: NpcState, paths_table, dt) -> NpcState:
    """Sequential per-NPC plan+update pass (TrafficFlow.cpp:330-344).

    ``paths_table``: (R, PATH_LEN, 2) route polyline table.
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
            x, y, v, heading, npc.uid, path)
        out = car_physics_step(sx, sy, sv, sh, sel(steering), throttle, steer, dt)
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


def npc_collisions(npc: NpcState) -> NpcState:
    """Ordered pairwise NPC-NPC SAT removal (TrafficFlow.cpp:346-356).

    Row i kills every later still-alive j it overlaps, and dies itself if any;
    rows run in vector (uid) order with live alive flags, matching the
    sequential reference loop exactly.
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
                       do_try, route_choice, dt):
    """Full per-tick NPC pipeline (TrafficFlow.cpp:318-367): spawn attempt ->
    sequential controller updates -> ordered collision removal -> despawn."""
    npc, spawned = npc_try_spawn(npc, do_try, route_choice, ego_x, ego_y, ego_present,
                                 traffic_route_ids, spawn_xy, spawn_heading)
    npc = npc_controller_update(npc, paths_table, dt)
    npc = npc_collisions(npc)
    npc = npc_despawn(npc, goal_xy)
    return npc, spawned


# ----------------------------------------------------------------- fast mode
def npc_controller_update_fast(npc: NpcState, paths_table, dt) -> NpcState:
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
                                npc.x, npc.y, npc.v, npc.heading, npc.uid, path)

    throttle, steer = jax.vmap(plan_one)(slots, pi0, paths)
    out = car_physics_step(npc.x, npc.y, npc.v, npc.heading, npc.steering_angle,
                           throttle, steer, dt)
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
                            ego_present, do_try, route_choice, dt):
    """Fast-mode per-tick NPC pipeline (see npc_traffic_update)."""
    npc, spawned = npc_try_spawn(npc, do_try, route_choice, ego_x, ego_y,
                                 ego_present, traffic_route_ids, spawn_xy,
                                 spawn_heading)
    npc = npc_controller_update_fast(npc, paths_table, dt)
    npc = npc_collisions_fast(npc)
    npc = npc_despawn(npc, goal_xy)
    return npc, spawned
