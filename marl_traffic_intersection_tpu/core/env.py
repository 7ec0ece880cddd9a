"""Pure-functional intersection environment: fixed-shape pytree state + jit step.

TPU-native redesign of the reference step orchestrator
(reference: cpp/IntersectionEnv.cpp:133-392). The mutable OO world
(``std::vector<Car>``, erase/respawn, pointer identity) becomes an immutable
``EnvState`` pytree and a pure ``step(state, actions) -> (state, StepOutput)``
that is fully jit/vmap-able: batch thousands of intersections by ``vmap`` over
a leading env axis and shard that axis over a device mesh (see envs/vector.py
and parallel/).

Per-tick pipeline, in exact reference order (IntersectionEnv.cpp:133-392):
  1. NPC traffic update (spawn -> sequential controllers -> collisions ->
     despawn)                                       [traffic mode]
  2. ego physics + path index + progress/stuck/smooth base reward
  3. per-ego status: SUCCESS -> out-of-screen -> off-road -> line crossing
  4. ordered ego-ego / ego-NPC SAT collisions -> CRASH_CAR
  5. terminal bonuses (k_cv / k_co / k_succ), team reward mixing
  6. respawn (crashes only) or terminated-on-any-done
  7. terminated-when-all-alive-succeeded, truncation at max_steps
  8. lidar scan (sees post-respawn state), observations (N, 127)

The snapshot API of the reference (EnvState.h, IntersectionEnv.cpp:394-416)
falls out for free: ``EnvState`` is a value — hold it, step it, restore it.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .constants import (
    DT_DEFAULT,
    FPS,
    HEIGHT,
    LIDAR_MAX_DIST,
    LIDAR_RAYS,
    MAX_ACC,
    MAX_STEERING_ANGLE,
    NEIGHBOR_COUNT,
    OBS_DIM,
    PATH_LEN,
    PI_F,
    PHYSICS_MAX_SPEED,
    SCALE,
    STATUS_ALIVE,
    STATUS_CRASH_CAR,
    STATUS_CRASH_LINE,
    STATUS_CRASH_WALL,
    STATUS_DEAD,
    STATUS_SUCCESS,
    WIDTH,
)
from .geometry import hits_yellow_line, is_line_pixel, is_on_road
from .lidar import lidar_scan, lidar_scan_interval, lidar_scan_sweep
from .npc import NpcState, init_npc_state, npc_traffic_update, spawn_decision
from .physics import (car_corners, car_physics_step, gather_rows_matmul,
                      sat_overlap, update_path_index, wrap_angle)
from .routes import RouteTable, build_route_table, default_ego_routes

_F = jnp.float32
_PI32 = np.float32(PI_F)


class RewardParams(NamedTuple):
    """Reward knobs (reference: cpp/Reward.h:5-14 defaults)."""

    k_prog: jnp.ndarray = np.float32(10.0)
    v_min_ms: jnp.ndarray = np.float32(1.0)
    k_stuck: jnp.ndarray = np.float32(-0.01)
    k_cv: jnp.ndarray = np.float32(-10.0)
    k_co: jnp.ndarray = np.float32(-5.0)
    k_succ: jnp.ndarray = np.float32(10.0)
    k_sm: jnp.ndarray = np.float32(-0.02)
    alpha: jnp.ndarray = np.float32(0.2)

    @classmethod
    def from_dict(cls, d: dict) -> "RewardParams":
        """Accept the reference's Python reward-config keys (env.py:57-77)."""
        m = {
            "progress_scale": "k_prog",
            "stuck_speed_threshold": "v_min_ms",
            "stuck_penalty": "k_stuck",
            "crash_vehicle_penalty": "k_cv",
            "crash_object_penalty": "k_co",
            "success_reward": "k_succ",
            "action_smoothness_scale": "k_sm",
            "team_alpha": "alpha",
        }
        kw = {m[k]: np.float32(v) for k, v in d.items() if k in m}
        return cls(**kw)


@dataclass(frozen=True)
class EnvConfig:
    """Static environment configuration (hashable -> jit constants).

    Mirrors the reference config dict (env.py:85-131) plus MAX_NPCS, the
    fixed-slot capacity replacing the unbounded NPC vector.
    """

    num_agents: int = 1
    num_lanes: int = 3
    traffic_flow: bool = False
    traffic_density: float = 0.5
    use_team_reward: bool = False
    respawn_enabled: bool = True
    max_steps: int = 2000
    max_npcs: int = 32
    lidar_impl: str = "auto"  # "auto" (interval when traffic_flow — the
    #   binary-search obstacle intervals beat the dense march once 32 NPC
    #   slots join the obstacle set, +22% on the full traffic step; dense
    #   "xla" otherwise) | "xla" (fused jnp dense march) | "interval" |
    #   "pallas" (TPU kernel). All impls are bit-identical (tests/test_lidar_fuzz.py).
    npc_cleanup: str = "slot"  # exact-mode cleanup schedule (core/npc.py
    #   npc_controller_update): "slot" = one min-uid slot per while
    #   iteration (cheap body; batch-max DEPENDENT-COUNT trip count) |
    #   "wave" = all unblocked pending slots per iteration (dense body;
    #   batch-max DAG-DEPTH trip count — wins when the batch is large
    #   enough that some env has a deep dependent chain every tick).
    #   Bitwise identical either way (tests/test_npc.py).
    npc_mode: str = "exact"  # "exact" (wave-scheduled, bit-match) |
    #                          "serial" (reference-shaped sequential loop,
    #                          bitwise equal to "exact", kept for diff tests) |
    #                          "fast" (synchronous approximation)
    npc_tier: int = -1  # batched-step NPC slot-prefix tier (envs/vector.py):
    #   spawns always fill the lowest free slot, so at moderate densities the
    #   alive set lives in a low slot prefix. When NO env in the batch has an
    #   alive NPC at slot >= tier (and no env's first `tier` slots are all
    #   full), the whole batched step runs on a [:, :tier] slice of the NPC
    #   pool — bitwise identical (dead tail slots are masked everywhere) but
    #   the ghost-scan planning, NPC-NPC SAT, interaction graph, and the
    #   lidar obstacle set all shrink. A batch-level lax.cond falls back to
    #   the full-width program the rare tick any env overflows the prefix.
    #   -1 = auto (two nested tiers max_npcs//4 and max_npcs//2: at density
    #   1.0 the batch maximum alive count measured over 1024 envs is 6, so
    #   the 8-slot program carries nearly every tick); >0 = that single
    #   tier; 0 = disabled.
    exact_trig: bool = False  # evaluate the EGO pose integrator's tan/cos/
    #   sin through ops/exact_trig.py (bit replicas of the host libm the
    #   reference oracle calls, f64 emulated on f32/int32 — softfloat.py)
    #   instead of the device transcendentals. Closes the last TPU pose-
    #   drift ulp (EXACTNESS.md config-4 lidar tail). Scope: the ego pose
    #   integrator (trig + the v/WHEELBASE division — TPU f32 divide is a
    #   non-IEEE reciprocal refinement), the lidar ray-direction /
    #   obstacle-extent trig, AND (round 4) the NPC chain — the planner's
    #   atan2f (its steer command is continuous and feeds the steering
    #   integral) and the NPC pose integrator's trig — which the TPU
    #   traffic obs bitstream needs (NPC headings appear in the neighbor
    #   dtheta features). SAT corners stay on XLA trig (measured bit-exact
    #   on device). Opt-in for exactness verification — ~10^4 flops per
    #   emulated trig call on device; host-libm callbacks on CPU.
    exact_obs: bool = False  # bit-exact REWARD and OBSERVATION float
    #   streams (VERDICT r3 task 2 — the (N,127) obs vector IS the contract,
    #   SURVEY §2). Routes the reward helpers' hypotf and the obs builder's
    #   atan2f/sqrtf through ops/exact_libm.py (replicas of the host libm
    #   the oracle links), pins every non-power-of-2 division with
    #   exact_trig._div32 (TPU divide is a non-IEEE refinement), guards the
    #   squared-sum adds against LLVM FMA contraction (physics.mul_unfused),
    #   and runs the team-reward average as the reference's ORDERED scalar
    #   accumulation (IntersectionEnv.cpp:330-333) instead of jnp.sum.
    #   Opt-in verification mode like exact_trig; combine both for a fully
    #   bit-exact step-output bitstream vs the C++ oracle (EXACTNESS.md).

    # NOTE: the reference *Python wrapper* forces single-agent + no team reward
    # when traffic_flow is on (env.py:85-99); its C++ core supports multi-ego +
    # traffic just fine (BASELINE config 4 requires it). That wrapper-level
    # restriction lives in envs/gym.py, not here.


class EgoState(NamedTuple):
    """Per-ego-agent arrays, leading dim N = num_agents."""

    route_id: jnp.ndarray        # (N,) i32
    x: jnp.ndarray               # (N,) f32
    y: jnp.ndarray               # (N,) f32
    v: jnp.ndarray               # (N,) f32
    heading: jnp.ndarray         # (N,) f32
    steering_angle: jnp.ndarray  # (N,) f32
    path_index: jnp.ndarray      # (N,) i32
    prev_dist_to_goal: jnp.ndarray  # (N,) f32
    prev_acc_norm: jnp.ndarray   # (N,) f32
    prev_steer_norm: jnp.ndarray # (N,) f32
    alive: jnp.ndarray           # (N,) bool


class EnvState(NamedTuple):
    """Complete env snapshot — a value; copy/rollback is free (cf. EnvState.h)."""

    ego: EgoState
    npc: NpcState
    lidar: jnp.ndarray           # (N, LIDAR_RAYS) f32 distances
    step_count: jnp.ndarray      # () i32
    key: jnp.ndarray             # PRNG key


class StepOutput(NamedTuple):
    obs: jnp.ndarray             # (N, OBS_DIM) f32
    reward: jnp.ndarray          # (N,) f32
    done: jnp.ndarray            # (N,) bool
    status: jnp.ndarray          # (N,) i32 (STATUS_*)
    terminated: jnp.ndarray      # () bool
    truncated: jnp.ndarray       # () bool
    agents_alive: jnp.ndarray    # () i32
    step: jnp.ndarray            # () i32
    spawned: jnp.ndarray         # () bool — NPC spawn happened this tick


class IntersectionEnv:
    """Functional environment core. All methods are pure; jit-wrap at will."""

    def __init__(self, config: EnvConfig = EnvConfig(),
                 reward: Optional[RewardParams] = None,
                 table: Optional[RouteTable] = None):
        self.config = config
        self.reward = reward if reward is not None else RewardParams()
        self.table = table if table is not None else build_route_table(config.num_lanes)
        # Host numpy constants; closed over by jit as embedded constants.
        t = self.table
        self._paths = t.paths
        self._spawn_xy = t.spawn_xy
        self._spawn_heading = t.spawn_heading
        self._intent = t.intent
        self._goal_xy = t.goal_xy
        self._goal_prev_xy = t.goal_prev_xy
        self._traffic_ids = t.traffic_route_ids
        # fused per-route auxiliary table: one one-hot matmul fetches
        # goal(2) | goal_prev(2) | spawn_xy(2) | spawn_heading(1) | intent(1)
        self._aux = np.concatenate([
            t.goal_xy, t.goal_prev_xy, t.spawn_xy,
            t.spawn_heading[:, None], t.intent[:, None].astype(np.float32),
        ], axis=1).astype(np.float32)

    # ------------------------------------------------------------------ reset
    def default_route_ids(self) -> np.ndarray:
        routes = default_ego_routes(self.config.num_agents, self.config.num_lanes)
        return self.table.route_ids(routes)

    def reset(self, key, route_ids=None) -> Tuple[EnvState, jnp.ndarray]:
        """Fresh state with egos spawned on their routes
        (reference: env.py:147-161, cpp/IntersectionEnv.cpp:66-131)."""
        state = self.reset_state(key, route_ids)
        return state, self.observe(state)

    def reset_state(self, key, route_ids=None) -> EnvState:
        """reset() without building the observation (see envs/vector.py)."""
        cfg = self.config
        if route_ids is None:
            route_ids = self.default_route_ids()
        rid = jnp.asarray(route_ids, jnp.int32)
        n = cfg.num_agents
        ego = EgoState(
            route_id=rid,
            x=jnp.asarray(self._spawn_xy[:, 0])[rid],
            y=jnp.asarray(self._spawn_xy[:, 1])[rid],
            v=jnp.zeros((n,), _F),
            heading=jnp.asarray(self._spawn_heading)[rid],
            steering_angle=jnp.zeros((n,), _F),
            path_index=jnp.zeros((n,), jnp.int32),
            prev_dist_to_goal=jnp.zeros((n,), _F),
            prev_acc_norm=jnp.zeros((n,), _F),
            prev_steer_norm=jnp.zeros((n,), _F),
            alive=jnp.ones((n,), bool),
        )
        state = EnvState(
            ego=ego,
            # No NPC slots without traffic flow: carrying empty (max_npcs,)
            # buffers through scan/while loops costs real copy bandwidth.
            npc=init_npc_state(cfg.max_npcs if cfg.traffic_flow else 0),
            # First obs sees all-max lidar from init (IntersectionEnv.cpp:117)
            lidar=jnp.full((n, LIDAR_RAYS), _F(LIDAR_MAX_DIST)),
            step_count=jnp.int32(0),
            key=key,
        )
        return state

    # ------------------------------------------------------------------- step
    def step(self, state: EnvState, actions, dt=DT_DEFAULT,
             spawn: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
             with_obs: bool = True) -> Tuple[EnvState, StepOutput]:
        cfg = self.config
        rw = self.reward
        n = cfg.num_agents
        ego = state.ego
        npc = state.npc
        key = state.key
        step_count = state.step_count + 1
        dt = jnp.asarray(dt, _F)

        paths = jnp.asarray(self._paths)
        goal_xy = jnp.asarray(self._goal_xy)

        # --- 1) NPC traffic flow (IntersectionEnv.cpp:140-142)
        spawned = jnp.asarray(False)
        if cfg.traffic_flow:
            if spawn is None:
                key, sub = jax.random.split(key)
                do_try, route_choice = spawn_decision(
                    sub, int(self._traffic_ids.shape[0]), cfg.traffic_density, dt)
            else:
                do_try, route_choice = spawn
            from functools import partial as _partial
            # exact_acc pins the reference's separate acc*dt rounding in the
            # NPC v chain (physics.car_physics_step) — exactness modes only
            _ea = cfg.exact_trig or cfg.exact_obs
            if cfg.npc_mode == "fast":
                from .npc import npc_traffic_update_fast
                _npc_update = _partial(npc_traffic_update_fast, exact_acc=_ea,
                                       exact_trig=cfg.exact_trig)
            elif cfg.npc_mode == "serial":
                from .npc import npc_traffic_update_serial
                _npc_update = _partial(npc_traffic_update_serial, exact_acc=_ea,
                                       exact_trig=cfg.exact_trig)
            else:
                _npc_update = _partial(
                    npc_traffic_update,
                    wave_cleanup=cfg.npc_cleanup == "wave", exact_acc=_ea,
                    exact_trig=cfg.exact_trig)
            npc, spawned = _npc_update(
                npc, paths, goal_xy,
                jnp.asarray(self._spawn_xy), jnp.asarray(self._spawn_heading),
                jnp.asarray(self._traffic_ids),
                ego.x, ego.y, jnp.ones_like(ego.alive),  # ALL egos block spawns
                # (reference checks every car regardless of life state,
                #  TrafficFlow.cpp:245-250)
                do_try, route_choice, dt,
            )

        # --- 2) ego physics + base rewards (IntersectionEnv.cpp:151-163)
        actions = jnp.asarray(actions, _F).reshape(n, 2)
        alive = ego.alive
        ph = car_physics_step(ego.x, ego.y, ego.v, ego.heading, ego.steering_angle,
                              actions[:, 0], actions[:, 1], dt,
                              exact_trig=cfg.exact_trig,
                              exact_acc=cfg.exact_trig or cfg.exact_obs)
        x = jnp.where(alive, ph.x, ego.x)
        y = jnp.where(alive, ph.y, ego.y)
        v = jnp.where(alive, ph.v, ego.v)
        heading = jnp.where(alive, ph.heading, ego.heading)
        steering = jnp.where(alive, ph.steering_angle, ego.steering_angle)
        acc = ph.acc  # recomputed every tick; only used by the smooth term

        ego_paths = gather_rows_matmul(paths, ego.route_id)  # (N, P, 2)
        pi = update_path_index(ego_paths, PATH_LEN, ego.path_index, x, y)
        pi = jnp.where(alive, pi, ego.path_index)

        aux = gather_rows_matmul(jnp.asarray(self._aux), ego.route_id)  # (N, 8)
        goal = aux[:, 0:2]                                # (N, 2)
        # max_progress = hypotf(750, 750) evaluated host-side with the same
        # libm the oracle links (IntersectionEnv.cpp:22)
        max_prog = np.float32(np.hypot(np.float32(WIDTH), np.float32(HEIGHT)))
        if cfg.exact_obs:
            # bit replicas of the oracle's reward float chain (EnvConfig)
            from ..core.physics import mul_unfused as _mu
            from ..ops.exact_libm import hypotf_exact
            from ..ops.exact_trig import _div32
            cur_dist = hypotf_exact(x - goal[:, 0], y - goal[:, 1])
            r_prog = jnp.where(
                ego.prev_dist_to_goal > _F(0.0),
                rw.k_prog * _div32(ego.prev_dist_to_goal - cur_dist, max_prog),
                _F(0.0))
            speed_ms = _div32(_mu(v, _F(FPS)), _F(SCALE))
            acc_norm = _div32(acc, _F(MAX_ACC))
            steer_norm = _div32(steering, _F(MAX_STEERING_ANGLE))
            d0 = acc_norm - ego.prev_acc_norm
            d1 = steer_norm - ego.prev_steer_norm
            # the k_sm product feeds the base-reward sum — guard it too, or
            # LLVM contracts k_sm*diff2 into the (r_prog+r_stuck)+r_smooth add
            r_smooth = _mu(rw.k_sm, _mu(d0, d0) + _mu(d1, d1))
        else:
            cur_dist = jnp.hypot(x - goal[:, 0], y - goal[:, 1])
            r_prog = jnp.where(
                ego.prev_dist_to_goal > _F(0.0),
                rw.k_prog * ((ego.prev_dist_to_goal - cur_dist) / max_prog),
                _F(0.0))
            speed_ms = (v * _F(FPS)) / _F(SCALE)
            acc_norm = acc / _F(MAX_ACC)
            steer_norm = steering / _F(MAX_STEERING_ANGLE)
            d0 = acc_norm - ego.prev_acc_norm
            d1 = steer_norm - ego.prev_steer_norm
            r_smooth = rw.k_sm * (d0 * d0 + d1 * d1)
        r_stuck = jnp.where(speed_ms < rw.v_min_ms, rw.k_stuck, _F(0.0))
        rewards = jnp.where(alive, r_prog + r_stuck + r_smooth, _F(0.0))

        prev_dist = jnp.where(alive, cur_dist, ego.prev_dist_to_goal)
        prev_acc_norm = jnp.where(alive, acc_norm, ego.prev_acc_norm)
        prev_steer_norm = jnp.where(alive, steer_norm, ego.prev_steer_norm)

        # --- 3) per-ego status (IntersectionEnv.cpp:166-290)
        goal_prev = aux[:, 2:4]
        dxr = goal[:, 0] - goal_prev[:, 0]
        dyr = goal[:, 1] - goal_prev[:, 1]
        horiz = jnp.abs(dxr) > jnp.abs(dyr)
        lat_err = jnp.where(horiz, jnp.abs(y - goal[:, 1]), jnp.abs(x - goal[:, 0]))
        lon_err = jnp.where(horiz, jnp.abs(x - goal[:, 0]), jnp.abs(y - goal[:, 1]))
        succ = (lat_err < _F(15.0)) & (lon_err < _F(40.0))

        cn = car_corners(x, y, heading)                   # (N, 4, 2)
        cx_, cy_ = cn[..., 0], cn[..., 1]
        margin = _F(100.0)
        oos = jnp.any((cx_ < -margin) | (cx_ > _F(WIDTH) + margin)
                      | (cy_ < -margin) | (cy_ > _F(HEIGHT) + margin), axis=-1)
        offroad = jnp.any(~is_on_road(cx_, cy_, cfg.num_lanes), axis=-1)

        line_a = jnp.any(hits_yellow_line(cx_, cy_, cfg.num_lanes), axis=-1)
        mx = _F(0.5) * (cx_ + jnp.roll(cx_, -1, axis=-1))
        my = _F(0.5) * (cy_ + jnp.roll(cy_, -1, axis=-1))
        line_m = jnp.any(is_line_pixel(mx.astype(jnp.int32), my.astype(jnp.int32),
                                       cfg.num_lanes), axis=-1)
        line_c = jnp.any(is_line_pixel(cx_.astype(jnp.int32), cy_.astype(jnp.int32),
                                       cfg.num_lanes), axis=-1)
        hit_line = line_a | line_m | line_c

        status_new = jnp.where(
            succ, STATUS_SUCCESS,
            jnp.where(oos | offroad, STATUS_CRASH_WALL,
                      jnp.where(hit_line, STATUS_CRASH_LINE, STATUS_ALIVE)))
        done_new = succ | oos | offroad | hit_line
        status = jnp.where(alive, status_new, STATUS_DEAD).astype(jnp.int32)
        done = jnp.where(alive, done_new, True)

        # --- 4) ordered car-car collisions (IntersectionEnv.cpp:293-318)
        collide_ee = sat_overlap(cn[:, None], heading[:, None], cn[None, :], heading[None, :])
        if cfg.traffic_flow:
            npc_cn = car_corners(npc.x, npc.y, npc.heading)
            collide_en = sat_overlap(cn[:, None], heading[:, None],
                                     npc_cn[None, :], npc.heading[None, :])
            npc_hit_any = jnp.any(collide_en & npc.alive[None, :], axis=-1)
        else:
            npc_hit_any = jnp.zeros((n,), bool)

        # Unrolled (n is static and small): avoids per-iteration loop overhead
        # and lets XLA fuse the whole cascade. one_i selects row i without
        # scatters.
        jidx = jnp.arange(n)
        for i in range(n):
            row_ok = alive[i] & ~done[i]
            jm = row_ok & (jidx > i) & alive & ~done & collide_ee[i]
            hit_i = row_ok & (jnp.any(jm) | npc_hit_any[i])
            upd = jm | ((jidx == i) & hit_i)
            done = done | upd
            status = jnp.where(upd, STATUS_CRASH_CAR, status)

        # --- 5) terminal bonuses + team mixing (IntersectionEnv.cpp:321-336)
        is_crash_car = status == STATUS_CRASH_CAR
        is_crash_obj = (status == STATUS_CRASH_WALL) | (status == STATUS_CRASH_LINE)
        is_success = status == STATUS_SUCCESS
        rewards = rewards + jnp.where(done & is_crash_car, rw.k_cv, _F(0.0))
        rewards = rewards + jnp.where(done & is_crash_obj, rw.k_co, _F(0.0))
        rewards = rewards + jnp.where(done & is_success, rw.k_succ, _F(0.0))
        if cfg.use_team_reward and n > 0:
            if cfg.exact_obs:
                # the reference accumulates the average as an ORDERED scalar
                # chain (cpp:330-332) — replicate the rounding order; pin the
                # division and both mix products (FMA contraction on CPU)
                from ..core.physics import mul_unfused as _mu
                from ..ops.exact_trig import _div32
                # seed with 0.0f + r0 exactly as the reference's accumulator
                # (cpp:330 starts `avg = 0.0f`): 0.0 + (-0.0) = +0.0, so a
                # bare `rewards[0]` seed would keep a negative zero the
                # reference drops. Barrier the zero so algsimp can't fold
                # the add away and restore the -0.0.
                total = jax.lax.optimization_barrier(_F(0.0)) + rewards[0]
                for i in range(1, n):
                    total = total + rewards[i]
                avg = _div32(total, _F(n))
                rewards = _mu(_F(1.0) - rw.alpha, rewards) + _mu(rw.alpha, avg)
            else:
                avg = jnp.sum(rewards) / _F(n)  # mean incl. dead (cpp:330-333)
                rewards = (_F(1.0) - rw.alpha) * rewards + rw.alpha * avg

        # --- 6) respawn / terminated-on-done (IntersectionEnv.cpp:339-351)
        terminated = jnp.asarray(False)
        if cfg.respawn_enabled:
            crash = alive & done & (is_crash_car | is_crash_obj)
            sp_xy = aux[:, 4:6]
            sp_h = aux[:, 6]
            if cfg.exact_obs:
                # the one-hot MATMUL row fetch sums 1*(-0.0) + 0*... = +0.0,
                # losing the NEGATIVE ZERO east-bound spawn headings carry
                # (atan2f(-0.0, dx) = -0.0 — IntersectionEnv.cpp:91); the
                # respawn-tick obs[3] = heading/pi must read -0.0. Refetch
                # the heading through its int32 BIT pattern (integer
                # masked-sum is sign-bit-exact).
                hb_table = jnp.asarray(
                    np.ascontiguousarray(self._spawn_heading).view(np.int32))
                onehot_r = (jnp.arange(hb_table.shape[0], dtype=jnp.int32)
                            == ego.route_id[:, None])
                h_bits = jnp.sum(jnp.where(onehot_r, hb_table[None, :], 0),
                                 axis=-1, dtype=jnp.int32)
                sp_h = jax.lax.bitcast_convert_type(h_bits, _F)
            x = jnp.where(crash, sp_xy[:, 0], x)
            y = jnp.where(crash, sp_xy[:, 1], y)
            v = jnp.where(crash, _F(0.0), v)
            heading = jnp.where(crash, sp_h, heading)
            steering = jnp.where(crash, _F(0.0), steering)
            pi = jnp.where(crash, 0, pi)
            prev_dist = jnp.where(crash, _F(0.0), prev_dist)
            prev_acc_norm = jnp.where(crash, _F(0.0), prev_acc_norm)
            prev_steer_norm = jnp.where(crash, _F(0.0), prev_steer_norm)
        else:
            terminated = jnp.any(done)

        # --- 7) success-termination + truncation (IntersectionEnv.cpp:353-370)
        agents_alive = jnp.sum(alive).astype(jnp.int32)
        if cfg.respawn_enabled:
            succ_cnt = jnp.sum(alive & done & is_success)
            terminated = (succ_cnt > 0) & (succ_cnt == agents_alive)

        truncated = jnp.asarray(cfg.max_steps > 0) & (step_count >= cfg.max_steps)

        new_ego = EgoState(
            route_id=ego.route_id, x=x, y=y, v=v, heading=heading,
            steering_angle=steering, path_index=pi,
            prev_dist_to_goal=prev_dist, prev_acc_norm=prev_acc_norm,
            prev_steer_norm=prev_steer_norm, alive=alive,
        )

        # --- 8) lidar on post-respawn state (IntersectionEnv.cpp:372-388)
        if cfg.traffic_flow:
            ox = jnp.concatenate([x, npc.x])
            oy = jnp.concatenate([y, npc.y])
            oh = jnp.concatenate([heading, npc.heading])
            om = jnp.concatenate([jnp.ones((n,), bool), npc.alive])
        else:
            ox, oy, oh, om = x, y, heading, jnp.ones((n,), bool)
        impl = cfg.lidar_impl
        if impl == "auto":  # interval wins once the 32 NPC slots join the set
            impl = "interval" if cfg.traffic_flow else "xla"
        if impl == "pallas":
            from ..ops.lidar_pallas import make_lidar_batch
            scan = make_lidar_batch(cfg.num_lanes)(x, y, heading, ox, oy, oh, om)
        elif impl == "interval":
            scan = jax.vmap(lambda a, b, c: lidar_scan_interval(
                a, b, c, ox, oy, oh, om, cfg.num_lanes,
                exact_trig=cfg.exact_trig))(x, y, heading)
        elif impl == "sweep":
            # lane-packed (S, A*R) dense march — bit-identical to the vmapped
            # dense path; minor-most axis fills the VPU lanes (lidar.py)
            scan = lidar_scan_sweep(x, y, heading, ox, oy, oh, om,
                                    cfg.num_lanes, exact_trig=cfg.exact_trig)
        else:
            # Static self-slot drop (dense path only — the no-traffic
            # headline): obstacle slot i IS ego i, and the eps self-test
            # (lidar.py not_self) excludes it with certainty at runtime
            # (|x-x| = 0 < eps), so removing the slot from agent i's set
            # cannot change any hit decision — it deletes one dead
            # per-obstacle AABB block (1 of 4 at the 4-agent headline)
            # from the (rays x samples) grid. The eps test still runs for
            # the remaining slots (duplicate-pose exclusion,
            # cpp/Lidar.cpp:55-63). The gather index matrix is a trace-time
            # constant, so no dynamic gather reaches the hot path.
            M = int(ox.shape[0])
            if M >= 2:
                idx = np.asarray([[j for j in range(M) if j != i]
                                  for i in range(n)], dtype=np.int32)
                ox_r, oy_r, oh_r, om_r = ox[idx], oy[idx], oh[idx], om[idx]
                scan = jax.vmap(lambda a, b, c, px, py, ph, pm: lidar_scan(
                    a, b, c, px, py, ph, pm, cfg.num_lanes,
                    exact_trig=cfg.exact_trig))(x, y, heading,
                                                ox_r, oy_r, oh_r, om_r)
            else:
                scan = jax.vmap(lambda a, b, c: lidar_scan(
                    a, b, c, ox, oy, oh, om, cfg.num_lanes,
                    exact_trig=cfg.exact_trig))(x, y, heading)
        lidar = jnp.where(alive[:, None], scan, state.lidar)

        new_state = EnvState(ego=new_ego, npc=npc, lidar=lidar,
                             step_count=step_count, key=key)
        obs = self.observe(new_state) if with_obs else \
            jnp.zeros((n, OBS_DIM), _F)
        out = StepOutput(
            obs=obs, reward=rewards, done=done, status=status,
            terminated=terminated, truncated=truncated,
            agents_alive=agents_alive, step=step_count, spawned=spawned,
        )
        return new_state, out

    # ------------------------------------------------------------ observation
    def observe(self, state: EnvState) -> jnp.ndarray:
        """Build the (N, 127) observation (reference: IntersectionEnv.cpp:418-520).

        Layout: [0:4] ego x/W, y/H, v/vmax, heading/pi; [4:6] lookahead target
        distance/W and heading error/pi (lookahead=10); [6:31] five nearest
        neighbors x {dx/W, dy/H, dv/vmax, dtheta/pi, intention}; [31:127] 96
        normalized lidar ranges. Dead agents -> all-zero rows.
        """
        cfg = self.config
        n = cfg.num_agents
        ego = state.ego
        paths = jnp.asarray(self._paths)
        intent_t = jnp.asarray(self._intent)

        x, y, v, heading = ego.x, ego.y, ego.v, ego.heading

        if cfg.exact_obs:
            # bit replicas of the oracle's obs float chain (EnvConfig):
            # libm atan2f/sqrtf replicas, pinned divisions, unfused squares
            from ..core.physics import mul_unfused as _mu
            from ..ops.exact_libm import atan2f_exact, sqrtf_exact
            from ..ops.exact_trig import _div32
            div = _div32
            sq2 = lambda a, b: sqrtf_exact(_mu(a, a) + _mu(b, b))
            at2 = atan2f_exact
        else:
            div = lambda a, b: a / b
            sq2 = lambda a, b: jnp.sqrt(a * a + b * b)
            at2 = jnp.arctan2

        o_base = jnp.stack([
            div(x, _F(WIDTH)), div(y, _F(HEIGHT)),
            div(v, _F(PHYSICS_MAX_SPEED)), div(heading, _PI32),
        ], axis=-1)

        tgt_idx = jnp.minimum(ego.path_index + 10, PATH_LEN - 1)
        ego_paths = gather_rows_matmul(paths, ego.route_id)
        # one-hot contraction instead of a dynamic gather (slow on TPU)
        onehot = (jnp.arange(PATH_LEN, dtype=jnp.int32) == tgt_idx[:, None])
        tx = jnp.sum(jnp.where(onehot, ego_paths[..., 0], _F(0.0)), axis=-1)
        ty = jnp.sum(jnp.where(onehot, ego_paths[..., 1], _F(0.0)), axis=-1)
        dxd = tx - x
        dyd = ty - y
        d_dst = div(sq2(dxd, dyd), _F(WIDTH))
        theta_err = div(wrap_angle(at2(-dyd, dxd) - heading), _PI32)
        o_target = jnp.stack([d_dst, theta_err], axis=-1)

        # Neighbor pool: other egos (+ NPCs in traffic mode)
        if cfg.traffic_flow:
            npc = state.npc
            kx = jnp.concatenate([x, npc.x])
            ky = jnp.concatenate([y, npc.y])
            kv = jnp.concatenate([v, npc.v])
            kh = jnp.concatenate([heading, npc.heading])
            ki = jnp.concatenate([intent_t[ego.route_id], intent_t[npc.route_id]])
            kmask = jnp.concatenate([ego.alive, npc.alive])
        else:
            kx, ky, kv, kh = x, y, v, heading
            ki = intent_t[ego.route_id]
            kmask = ego.alive
        if kx.shape[0] < NEIGHBOR_COUNT:  # pad pool so top-5 selection is static
            padn = NEIGHBOR_COUNT - kx.shape[0]
            zpad = jnp.zeros((padn,), _F)
            kx = jnp.concatenate([kx, zpad])
            ky = jnp.concatenate([ky, zpad])
            kv = jnp.concatenate([kv, zpad])
            kh = jnp.concatenate([kh, zpad])
            ki = jnp.concatenate([ki, jnp.zeros((padn,), ki.dtype)])
            kmask = jnp.concatenate([kmask, jnp.zeros((padn,), bool)])
        k_tot = kx.shape[0]

        dx = kx[None, :] - x[:, None]                       # (N, K)
        dy = ky[None, :] - y[:, None]
        dist = sq2(dx, dy)
        not_self = jnp.arange(k_tot)[None, :] != jnp.arange(n)[:, None]
        nmask = kmask[None, :] & not_self

        # Top-5-nearest via 5 rounds of masked argmin + one-hot contraction
        # instead of argsort + take_along_axis: XLA's sort/gather lowering
        # staged hundreds of tiny S(1) copies per step (the single biggest
        # cost of the whole batched step at 4096x4 — see PERF.md). Ties break
        # to the lowest index (== stable ascending argsort == the order the
        # reference's std::sort produces, IntersectionEnv.cpp:490); unfilled
        # slots contract against an all-false one-hot and come out zero,
        # matching the reference's zero padding.
        dmasked = jnp.where(nmask, dist, jnp.inf)
        kint = ki.astype(_F)
        rows = []
        taken = jnp.zeros_like(nmask)
        for _ in range(NEIGHBOR_COUNT):
            d = jnp.where(taken, jnp.inf, dmasked)          # (N, K)
            m = jnp.min(d, axis=-1, keepdims=True)
            oh = (d == m) & jnp.isfinite(d)
            oh &= jnp.cumsum(oh.astype(jnp.int32), axis=-1) == 1
            taken |= oh
            ohf = oh.astype(_F)
            pick = lambda a: jnp.sum(ohf * a[None, :], axis=-1)   # (N,)
            valid = jnp.any(oh, axis=-1)
            feat = jnp.stack([
                div(pick(kx) - x, _F(WIDTH)),
                div(pick(ky) - y, _F(HEIGHT)),
                div(pick(kv) - v, _F(PHYSICS_MAX_SPEED)),
                div(wrap_angle(pick(kh) - heading), _PI32),
                pick(kint),
            ], axis=-1)                                     # (N, 5)
            rows.append(jnp.where(valid[:, None], feat, _F(0.0)))
        nfeat = jnp.stack(rows, axis=-2).reshape(n, 5 * NEIGHBOR_COUNT)

        # the reference normalizes by a PRECOMPUTED RECIPROCAL, not a
        # division (Lidar.cpp:95-97: d * (1.0f / max_dist)) — in exact mode
        # replicate that product; the default path's /250 happens to lower
        # to the same reciprocal multiply under XLA's strength reduction
        if cfg.exact_obs:
            inv = np.float32(1.0) / np.float32(LIDAR_MAX_DIST)
            o_lidar = _mu(state.lidar, _F(inv))
        else:
            o_lidar = state.lidar / _F(LIDAR_MAX_DIST)

        obs = jnp.concatenate([o_base, o_target, nfeat, o_lidar], axis=-1)
        assert obs.shape == (n, OBS_DIM)
        return jnp.where(ego.alive[:, None], obs, _F(0.0))
