"""Strict Gymnasium adapters over the jitted core.

The reference exposes a Gym-*style* API but is not registrable with the
Gymnasium ecosystem (reference env.py returns bespoke tuples; no spaces, no
``gymnasium.Env`` base). These adapters make the TPU env a first-class citizen
for external tooling (SB3/CleanRL-style trainers, wrappers, env checkers):

  - ``GymnasiumIntersectionEnv``: single-agent ``gymnasium.Env`` (passes
    ``gymnasium.utils.env_checker.check_env``). Gymnasium's API is
    single-agent by design — multi-agent users should use
    ``envs.gym.GymIntersectionEnv`` (reference API parity) or the batched
    ``envs.vector.VectorEnv`` directly.
  - ``GymnasiumVectorEnv``: ``gymnasium.vector.VectorEnv`` over the jitted
    batched core with SAME_STEP autoreset (the device batch resets done envs
    in the same fused step — envs/vector.py), one jitted program per step
    for any ``num_envs``.

Both hold JAX state internally and speak numpy at the boundary.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import DT_DEFAULT, STATUS_NAMES
from ..core.env import EnvConfig, IntersectionEnv, RewardParams
from ..core.routes import default_ego_routes
from .vector import VectorEnv

try:  # gate on gymnasium availability (baked into this image; stubbed if not)
    import gymnasium
    from gymnasium import spaces
except ImportError:  # pragma: no cover
    gymnasium = None
    spaces = None


def _require_gymnasium():
    if gymnasium is None:  # pragma: no cover
        raise ImportError("gymnasium is not installed")


def _build_core(config: Optional[Dict[str, Any]]):
    config = dict(config or {})
    reward_cfg = config.get("reward_config")
    reward = (RewardParams.from_dict(reward_cfg)
              if isinstance(reward_cfg, dict) else None)
    cfg = EnvConfig(
        num_agents=int(config.get("num_agents", 1)),
        num_lanes=int(config.get("num_lanes", 3)),
        traffic_flow=bool(config.get("traffic_flow", False)),
        traffic_density=float(config.get("traffic_density", 0.5)),
        use_team_reward=bool(config.get("use_team_reward", False)),
        respawn_enabled=bool(config.get("respawn_enabled", True)),
        max_steps=int(config.get("max_steps", 2000)),
        max_npcs=int(config.get("max_npcs", 32)),
    )
    core = IntersectionEnv(cfg, reward=reward)
    routes = config.get("ego_routes") or default_ego_routes(
        cfg.num_agents, cfg.num_lanes)
    return core, cfg, routes


class GymnasiumIntersectionEnv(*([] if gymnasium is None else [gymnasium.Env])):
    """Single-agent strict ``gymnasium.Env`` over the jitted core."""

    metadata = {"render_modes": ["rgb_array"], "render_fps": 60}

    def __init__(self, config: Optional[Dict[str, Any]] = None,
                 render_mode: Optional[str] = None):
        _require_gymnasium()
        config = dict(config or {})
        if int(config.get("num_agents", 1)) != 1:
            raise ValueError(
                "GymnasiumIntersectionEnv is single-agent (gymnasium API); "
                "use envs.gym.GymIntersectionEnv or envs.vector.VectorEnv "
                "for multi-agent")
        config["num_agents"] = 1
        self._core, self._cfg, self._routes = _build_core(config)
        self._rids = self._core.table.route_ids(self._routes)
        self._jit_step = jax.jit(self._core.step)
        self._jit_reset = jax.jit(self._core.reset)
        self._state = None
        self._seed = int(config.get("seed", 0))
        self.render_mode = render_mode
        self._renderer = None

        self.observation_space = spaces.Box(
            low=-np.inf, high=np.inf, shape=(127,), dtype=np.float32)
        self.action_space = spaces.Box(
            low=-1.0, high=1.0, shape=(2,), dtype=np.float32)

    def reset(self, *, seed: Optional[int] = None,
              options: Optional[dict] = None):
        super().reset(seed=seed)
        if seed is not None:
            self._seed = seed
        self._state, obs = self._jit_reset(
            jax.random.PRNGKey(self._seed), self._rids)
        self._seed += 1
        return np.asarray(obs)[0], {}

    def step(self, action):
        if self._state is None:
            raise RuntimeError("call reset() before step()")
        a = jnp.asarray(np.asarray(action, np.float32).reshape(1, 2))
        self._state, out = self._jit_step(self._state, a)
        status = STATUS_NAMES[int(np.asarray(out.status)[0])]
        info = {"status": status, "step": int(out.step),
                "agents_alive": int(out.agents_alive)}
        return (np.asarray(out.obs)[0], float(np.asarray(out.reward)[0]),
                bool(out.terminated), bool(out.truncated), info)

    def render(self):
        if self.render_mode != "rgb_array":
            return None
        if self._state is None:
            raise RuntimeError("call reset() before render()")
        if self._renderer is None:
            from ..render.draw import Renderer
            self._renderer = Renderer(self._core)
        return np.asarray(self._renderer.render(self._state))

    def close(self):
        self._renderer = None


class GymnasiumVectorEnv(
        *([] if gymnasium is None else [gymnasium.vector.VectorEnv])):
    """``gymnasium.vector.VectorEnv`` over the fused batched step.

    One jitted XLA program steps all ``num_envs`` instances (envs/vector.py);
    done envs are re-initialized inside the same program (SAME_STEP
    autoreset).
    """

    metadata: Dict[str, Any] = {"autoreset_mode": None}

    def __init__(self, num_envs: int, config: Optional[Dict[str, Any]] = None,
                 seed: int = 0):
        _require_gymnasium()
        config = dict(config or {})
        if int(config.get("num_agents", 1)) != 1:
            raise ValueError("GymnasiumVectorEnv is single-agent-per-env; "
                             "use envs.vector.VectorEnv for multi-agent")
        config["num_agents"] = 1
        core, cfg, routes = _build_core(config)
        pool = core.table.route_ids(routes) if config.get("ego_routes") \
            else None
        self._venv = VectorEnv(core, num_envs=num_envs, route_pool=pool)
        import functools
        self._jit_step = jax.jit(functools.partial(self._venv.step,
                                                   final_obs=True))
        self._state = None
        self._key = jax.random.PRNGKey(seed)

        self.num_envs = num_envs
        self.single_observation_space = spaces.Box(
            low=-np.inf, high=np.inf, shape=(127,), dtype=np.float32)
        self.single_action_space = spaces.Box(
            low=-1.0, high=1.0, shape=(2,), dtype=np.float32)
        self.observation_space = gymnasium.vector.utils.batch_space(
            self.single_observation_space, num_envs)
        self.action_space = gymnasium.vector.utils.batch_space(
            self.single_action_space, num_envs)
        try:
            from gymnasium.vector import AutoresetMode
            self.metadata = {"autoreset_mode": AutoresetMode.SAME_STEP}
        except ImportError:  # older gymnasium
            pass

    def reset(self, *, seed: Optional[int] = None,
              options: Optional[dict] = None):
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._key, kr = jax.random.split(self._key)
        self._state, obs = self._venv.reset(kr)
        return np.asarray(obs)[:, 0], {}

    def step(self, actions):
        if self._state is None:
            raise RuntimeError("call reset() before step()")
        a = jnp.asarray(np.asarray(actions, np.float32)
                        .reshape(self.num_envs, 1, 2))
        self._state, out, term_obs = self._jit_step(self._state, a)
        term = np.asarray(out.terminated)
        trunc = np.asarray(out.truncated)
        infos = {}
        done = term | trunc
        if done.any():
            # gymnasium SAME_STEP contract: the TERMINAL observation of each
            # finished episode rides in infos (the returned obs is already
            # the fresh post-reset one) — object arrays + boolean mask, same
            # layout as gymnasium.vector.SyncVectorEnv._add_info
            fo = np.full(self.num_envs, None, dtype=object)
            fi = np.full(self.num_envs, None, dtype=object)
            t_obs = np.asarray(term_obs)[:, 0]
            for i in np.nonzero(done)[0]:
                fo[i] = t_obs[i]
                fi[i] = {}
            infos = {"final_obs": fo, "_final_obs": done.copy(),
                     "final_info": fi, "_final_info": done.copy()}
        return (np.asarray(out.obs)[:, 0],
                np.asarray(out.reward)[:, 0],
                term, trunc, infos)

    def close_extras(self, **kwargs):
        pass
