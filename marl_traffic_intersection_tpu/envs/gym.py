"""Gym-style stateful wrapper with the reference's Python API surface.

Drop-in analogue of the reference ``IntersectionEnv`` (reference: env.py:80-221):
config-dict construction, ``reset() -> (obs, info)``,
``step(actions, dt) -> (obs, rewards, terminated, truncated, info)`` with the
single-agent-vs-multi-agent return-shape switch, and ``render()`` delegating to
the host-side debug renderer. Internally it drives the pure-functional jitted
core and keeps the EnvState as its only mutable slot.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import DT_DEFAULT, STATUS_NAMES
from ..core.env import EnvConfig, IntersectionEnv, RewardParams
from ..core.routes import default_ego_routes

# Mirrors the reference DEFAULT_REWARD_CONFIG (env.py:41-54)
DEFAULT_REWARD_CONFIG = {
    "use_team_reward": False,
    "traffic_flow": False,
    "reward_config": {
        "progress_scale": 10.0,
        "stuck_speed_threshold": 1.0,
        "stuck_penalty": -0.01,
        "crash_vehicle_penalty": -10.0,
        "crash_object_penalty": -5.0,
        "success_reward": 10.0,
        "action_smoothness_scale": -0.02,
        "team_alpha": 0.2,
    },
}


class RawEnvView:
    """The raw binding's attribute + event surface (cpp/bindings.cpp:64-82).

    The reference's pybind11 env object exposes ``cars``, ``traffic_cars``,
    ``lidars`` and ``step_count`` as live attributes (bindings.cpp:66-69)
    alongside the GLFW queries (``poll_events``/``key_pressed``/
    ``window_should_close``, bindings.cpp:80-82). This view reproduces the
    whole idiom on ``GymIntersectionEnv.env``: attribute reads materialize
    object-level ``compat.Car``/``compat.Lidar`` snapshots from the current
    ``EnvState`` pytree (value semantics — the TPU-native state is immutable,
    so the attributes are per-read snapshots, not aliased references; a
    documented deviation, PARITY.md). Event queries inherit EventSurface.
    """

    def __init__(self, owner: "GymIntersectionEnv"):
        from .events import EventSurface
        self._owner = owner
        self._events = EventSurface()

    # ----------------------------------------------- event surface delegation
    def poll_events(self) -> None:
        self._events.poll_events()

    def key_pressed(self, glfw_key: int) -> bool:
        return self._events.key_pressed(glfw_key)

    def window_should_close(self) -> bool:
        return self._events.window_should_close()

    def __getattr__(self, name):
        # anything else (inject_press, attach_canvas, request_close, ...)
        # falls through to the event surface
        return getattr(self._events, name)

    # ----------------------------------------------- raw attribute surface
    def _state(self):
        o = self._owner
        if o._native is not None:
            return o._native_state_view()
        return o._state

    @property
    def cars(self):
        """Ego fleet as compat.Car objects (bindings.cpp:66)."""
        from ..compat import Car
        st = self._state()
        paths = self._owner._core.table.paths
        return [Car.from_env_state(st, i, paths)
                for i in range(self._owner.num_agents)]

    @property
    def traffic_cars(self):
        """Alive NPCs as compat.Car objects in spawn (uid) order — the
        reference's ``traffic_cars`` vector order (bindings.cpp:67)."""
        from ..compat import Car
        st = self._state()
        paths = self._owner._core.table.paths
        alive = np.asarray(st.npc.alive)
        idx = np.nonzero(alive)[0]
        if hasattr(st.npc, "uid"):
            uid = np.asarray(st.npc.uid)
            idx = idx[np.argsort(uid[idx], kind="stable")]
        return [Car.from_npc_state(st, int(i), paths) for i in idx]

    @property
    def lidars(self):
        """Per-ego sensors with the env's 96-ray config and the latest
        distances (bindings.cpp:68, IntersectionEnv.cpp:113-127)."""
        from ..compat import Lidar
        st = self._state()
        dists = np.asarray(st.lidar)
        out = []
        for i in range(self._owner.num_agents):
            s = Lidar.env_sensor()
            s.distances = [float(d) for d in dists[i]]
            out.append(s)
        return out

    @property
    def step_count(self) -> int:
        return int(np.asarray(self._state().step_count))


class GymIntersectionEnv:
    def __init__(self, config: Optional[Dict[str, Any]] = None):
        if config is None:
            config = {}
        self.traffic_flow = bool(config.get("traffic_flow", False))
        self.num_agents = 1 if self.traffic_flow else int(config.get("num_agents", 1))
        self.num_lanes = int(config.get("num_lanes", 3))
        self.render_mode = config.get("render_mode", None)
        self.show_lane_ids = bool(config.get("show_lane_ids", False))
        self.show_lidar = bool(config.get("show_lidar", False))

        use_team = bool(config.get("use_team_reward",
                                   DEFAULT_REWARD_CONFIG["use_team_reward"]))
        if self.traffic_flow:
            use_team = False

        reward_cfg = config.get("reward_config")
        if reward_cfg is None:
            reward_cfg = DEFAULT_REWARD_CONFIG["reward_config"]
        reward = RewardParams.from_dict(reward_cfg) if isinstance(reward_cfg, dict) \
            else RewardParams()

        self._cfg = EnvConfig(
            num_agents=self.num_agents,
            num_lanes=self.num_lanes,
            traffic_flow=self.traffic_flow,
            traffic_density=float(config.get("traffic_density", 0.5)),
            use_team_reward=use_team,
            respawn_enabled=bool(config.get("respawn_enabled", True)),
            max_steps=int(config.get("max_steps", 2000)),
            max_npcs=int(config.get("max_npcs", 32)),
            # opt-in bit-exactness modes (EXACTNESS.md): libm-replica trig
            # for the pose/lidar chain, and the bit-exact reward/obs stream
            exact_trig=bool(config.get("exact_trig", False)),
            exact_obs=bool(config.get("exact_obs", False)),
        )
        # backend: 'jax' (device engine) or 'native' (C++ host engine —
        # microsecond per-step latency, like the reference's cpp_backend)
        self.backend = str(config.get("backend", "jax"))
        self._core = IntersectionEnv(self._cfg, reward=reward)
        self._reward = reward
        self._native = None
        if self.backend == "native":
            from ..native import NativeEngine
            r = reward
            self._native = NativeEngine(
                num_lanes=self.num_lanes, use_team=use_team,
                respawn=self._cfg.respawn_enabled, max_steps=self._cfg.max_steps,
                traffic=self.traffic_flow, density=self._cfg.traffic_density,
                max_npcs=self._cfg.max_npcs, seed=int(config.get("seed", 0)),
                reward=[float(r.k_prog), float(r.v_min_ms), float(r.k_stuck),
                        float(r.k_cv), float(r.k_co), float(r.k_succ),
                        float(r.k_sm), float(r.alpha)])
        self.lane_layout = self._core.table.layout
        self.points = self.lane_layout["points"]

        self.ego_routes: List[Tuple[str, str]] = config.get("ego_routes") or \
            default_ego_routes(self.num_agents, self.num_lanes)

        self._seed = int(config.get("seed", 0))
        self._jit_step = jax.jit(self._core.step)
        self._state = None
        self._renderer = None

        # GLFW-style event surface + raw attribute surface: the reference
        # harness reaches through the wrapper for input polling
        # (`env.env.poll_events()` / `.key_pressed(k)` /
        # `.window_should_close()` — test.py:110-145, cpp/bindings.cpp:80-82)
        # and the raw binding exposes `cars` / `traffic_cars` / `lidars` /
        # `step_count` as live attributes (cpp/bindings.cpp:66-70).
        # RawEnvView provides both on the same object.
        self.env = RawEnvView(self)

        self.reset()

    # ------------------------------------------------------------------- api
    @property
    def state(self):
        """Current EnvState snapshot (value semantics; cf. get_state/set_state)."""
        return self._state

    @state.setter
    def state(self, s):
        self._state = s

    def reset(self, seed: Optional[int] = None):
        if seed is not None:
            self._seed = seed
        rids = self._core.table.route_ids(self.ego_routes)
        key = jax.random.PRNGKey(self._seed)
        self._state, obs_j = self._core.reset(key, rids)
        if self._native is not None:
            # the native engine answers the whole native-backend API, reset
            # included: its own reset-time observation (all-max lidar,
            # reference env.py:158 / IntersectionEnv.cpp:117). The JAX state
            # above is kept only as the renderer/snapshot mirror.
            self._native.reset([int(r) for r in rids])
            obs = self._native.observations()
        else:
            obs = np.asarray(obs_j)
        self._seed += 1
        if self.traffic_flow:
            return obs[0], {}
        return obs, {}

    def step(self, actions: Union[np.ndarray, List], dt: float = DT_DEFAULT):
        actions = np.asarray(actions, dtype=np.float32)
        if self.traffic_flow:
            actions = actions.reshape(1, 2)
        elif actions.ndim == 1:
            if actions.size == 2 and self.num_agents == 1:
                actions = actions.reshape(1, 2)
            else:
                raise ValueError(
                    f"Expected actions shape (N,2) for multi-agent, got {actions.shape}")

        if self._native is not None:
            r = self._native.step(actions, dt=float(dt))
            obs = r["obs"]
            rewards = r["reward"]
            terminated = r["terminated"]
            truncated = r["truncated"]
            status = [STATUS_NAMES[int(s)] for s in r["status"]]
            done = [int(d) for d in r["done"]]
            step_no = r["step"]
            agents_alive = r["agents_alive"]
        else:
            self._state, out = self._jit_step(self._state, jnp.asarray(actions),
                                              jnp.float32(dt))
            obs = np.asarray(out.obs)
            rewards = np.asarray(out.reward)
            terminated = bool(out.terminated)
            truncated = bool(out.truncated)
            status = [STATUS_NAMES[int(s)] for s in np.asarray(out.status)]
            done = [int(d) for d in np.asarray(out.done)]
            step_no = int(out.step)
            agents_alive = int(out.agents_alive)

        # agent ids are stable slot indices + 1 (reference ids start at 1,
        # IntersectionEnv.cpp:130; egos are never removed so they coincide)
        collisions = {i + 1: status[i] for i in range(self.num_agents)}

        info = {
            "step": step_no,
            "rewards": rewards.tolist() if not self.traffic_flow else float(rewards[0]),
            "collisions": collisions,
            "agents_alive": agents_alive,
            "terminated": terminated,
            "truncated": truncated,
            "done": done,
            "status": status,
        }
        if self.traffic_flow:
            return obs[0], float(rewards[0]), terminated, truncated, info
        return obs, rewards, terminated, truncated, info

    def render(self, show_lane_ids: Optional[bool] = None,
               show_lidar: Optional[bool] = None):
        if self.render_mode not in ("human", "rgb_array"):
            return None
        if show_lane_ids is None:
            show_lane_ids = self.show_lane_ids
        if show_lidar is None:
            show_lidar = self.show_lidar
        if self._renderer is None:
            from ..render.draw import Renderer
            self._renderer = Renderer(self._core)
        state = self._native_state_view() if self._native is not None else self._state
        frame = self._renderer.render(state, show_lane_ids=show_lane_ids,
                                      show_lidar=show_lidar)
        if self.render_mode == "human":
            self._renderer.show(frame)
        return frame

    def _native_state_view(self):
        """Minimal EnvState-shaped view over the native engine, for rendering."""
        from types import SimpleNamespace

        eg = self._native.egos()
        npcs = self._native.npcs()
        ego = SimpleNamespace(
            x=eg[:, 0], y=eg[:, 1], v=eg[:, 2], heading=eg[:, 3],
            alive=eg[:, 6] > 0.5,
            route_id=self._core.table.route_ids(self.ego_routes),
            path_index=eg[:, 5].astype(np.int32))
        npc = SimpleNamespace(
            alive=np.ones(len(npcs), bool), x=npcs[:, 0], y=npcs[:, 1],
            heading=npcs[:, 3])
        lidar = np.stack([self._native.lidar(i) for i in range(self.num_agents)]) \
            if self.num_agents else np.zeros((0, 96), np.float32)
        return SimpleNamespace(ego=ego, npc=npc, lidar=lidar,
                               step_count=self._native._lib.mti_step_count(
                                   self._native._h))

    def close(self):
        if self._renderer is not None:
            self._renderer.close()
            self._renderer = None
