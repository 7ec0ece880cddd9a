"""ctypes wrapper over the reference-C++ oracle (see build.py / shim.cpp)."""
from __future__ import annotations

import ctypes as ct
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .build import build_oracle

_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


def _load():
    lib = ct.CDLL(str(build_oracle()))
    lib.env_create.restype = ct.c_void_p
    lib.env_create.argtypes = [ct.c_int]
    lib.env_destroy.argtypes = [ct.c_void_p]
    lib.env_configure.argtypes = [ct.c_void_p, ct.c_int, ct.c_int, ct.c_int]
    lib.env_configure_traffic.argtypes = [ct.c_void_p, ct.c_int, ct.c_float]
    lib.env_set_reward.argtypes = [ct.c_void_p] + [ct.c_float] * 8
    lib.env_reset.argtypes = [ct.c_void_p]
    lib.env_add_car.argtypes = [ct.c_void_p, ct.c_char_p, ct.c_char_p]
    lib.env_num_traffic_routes.restype = ct.c_int
    lib.env_num_traffic_routes.argtypes = [ct.c_void_p]
    lib.env_get_traffic_route.argtypes = [ct.c_void_p, ct.c_int, ct.c_char_p, ct.c_char_p]
    lib.env_force_spawn.restype = ct.c_int
    lib.env_force_spawn.argtypes = [ct.c_void_p, ct.c_int]
    lib.env_step.restype = ct.c_int
    lib.env_step.argtypes = [ct.c_void_p, _f32p, _f32p, ct.c_int, ct.c_float,
                             _f32p, _f32p, _i32p, _i32p, _i32p]
    lib.env_get_obs.argtypes = [ct.c_void_p, _f32p]
    lib.env_num_egos.restype = ct.c_int
    lib.env_num_egos.argtypes = [ct.c_void_p]
    lib.env_num_npcs.restype = ct.c_int
    lib.env_num_npcs.argtypes = [ct.c_void_p]
    lib.env_get_egos.argtypes = [ct.c_void_p, _f32p]
    lib.env_get_npcs.argtypes = [ct.c_void_p, _f32p]
    lib.env_get_lidar.argtypes = [ct.c_void_p, ct.c_int, _f32p]
    lib.oracle_gen_path.argtypes = [ct.c_int, ct.c_char_p, ct.c_char_p, _f32p,
                                    ct.POINTER(ct.c_int)]
    lib.oracle_layout_point.argtypes = [ct.c_int, ct.c_char_p, _f32p]
    lib.oracle_car_update.argtypes = [_f32p, ct.POINTER(ct.c_int), _f32p, ct.c_int,
                                      ct.c_float, ct.c_float, ct.c_float]
    lib.oracle_on_road.restype = ct.c_int
    lib.oracle_on_road.argtypes = [ct.c_int, ct.c_float, ct.c_float]
    lib.oracle_yellow_line.restype = ct.c_int
    lib.oracle_yellow_line.argtypes = [ct.c_int, ct.c_float, ct.c_float]
    lib.oracle_line_pixel.restype = ct.c_int
    lib.oracle_line_pixel.argtypes = [ct.c_int, ct.c_int, ct.c_int]
    lib.oracle_sat.restype = ct.c_int
    lib.oracle_sat.argtypes = [_f32p, _f32p]
    lib.oracle_lidar.argtypes = [ct.c_int, _f32p, _f32p, ct.c_int, _f32p]
    return lib


_LIB = None


def lib():
    global _LIB
    if _LIB is None:
        _LIB = _load()
    return _LIB


def gen_path(num_lanes: int, start_id: str, end_id: str) -> Tuple[np.ndarray, int]:
    out = np.zeros((160, 2), np.float32)
    intent = ct.c_int(-1)
    lib().oracle_gen_path(num_lanes, start_id.encode(), end_id.encode(), out,
                          ct.byref(intent))
    return out, intent.value


def layout_point(num_lanes: int, name: str) -> np.ndarray:
    out = np.zeros((2,), np.float32)
    lib().oracle_layout_point(num_lanes, name.encode(), out)
    return out


def car_update(state5: np.ndarray, throttle: float, steer: float, dt: float,
               path: Optional[np.ndarray] = None, path_index: int = 0
               ) -> Tuple[np.ndarray, int]:
    s = np.array(state5, np.float32)
    pi = ct.c_int(path_index)
    if path is None:
        p = np.zeros((0, 2), np.float32)
        lib().oracle_car_update(s, ct.byref(pi), p, 0, throttle, steer, dt)
    else:
        p = np.ascontiguousarray(path, np.float32)
        lib().oracle_car_update(s, ct.byref(pi), p, len(p), throttle, steer, dt)
    return s, pi.value


def on_road(num_lanes: int, x: float, y: float) -> bool:
    return bool(lib().oracle_on_road(num_lanes, x, y))


def yellow_line(num_lanes: int, x: float, y: float) -> bool:
    return bool(lib().oracle_yellow_line(num_lanes, x, y))


def line_pixel(num_lanes: int, x: int, y: int) -> bool:
    return bool(lib().oracle_line_pixel(num_lanes, x, y))


def sat(pose_a, pose_b) -> bool:
    a = np.asarray(pose_a, np.float32)
    b = np.asarray(pose_b, np.float32)
    return bool(lib().oracle_sat(a, b))


def lidar(num_lanes: int, self_pose, others) -> np.ndarray:
    sp = np.asarray(self_pose, np.float32)
    ot = np.ascontiguousarray(np.asarray(others, np.float32).reshape(-1, 3))
    out = np.zeros((96,), np.float32)
    lib().oracle_lidar(num_lanes, sp, ot, len(ot), out)
    return out


class OracleEnv:
    """Stateful wrapper over the reference IntersectionEnv for lockstep tests."""

    def __init__(self, num_lanes: int = 3, use_team: bool = False,
                 respawn: bool = True, max_steps: int = 2000,
                 traffic: bool = False,
                 reward: Optional[Sequence[float]] = None):
        self._lib = lib()
        self._h = self._lib.env_create(num_lanes)
        self._lib.env_configure(self._h, int(use_team), int(respawn), max_steps)
        # density=0: the oracle's internal RNG can never spawn; use force_spawn.
        self._lib.env_configure_traffic(self._h, int(traffic), 0.0)
        if reward is not None:
            self._lib.env_set_reward(self._h, *[float(r) for r in reward])
        self.n = 0

    def __del__(self):
        try:
            self._lib.env_destroy(self._h)
        except Exception:
            pass

    def reset(self, routes: List[Tuple[str, str]]):
        self._lib.env_reset(self._h)
        for s, e in routes:
            self._lib.env_add_car(self._h, s.encode(), e.encode())
        self.n = len(routes)

    def traffic_routes(self) -> List[Tuple[str, str]]:
        cnt = self._lib.env_num_traffic_routes(self._h)
        out = []
        for i in range(cnt):
            s = ct.create_string_buffer(32)
            e = ct.create_string_buffer(32)
            self._lib.env_get_traffic_route(self._h, i, s, e)
            out.append((s.value.decode(), e.value.decode()))
        return out

    def force_spawn(self, route_idx: int) -> bool:
        return bool(self._lib.env_force_spawn(self._h, route_idx))

    def step(self, actions: np.ndarray, dt: float = 1.0 / 60.0):
        a = np.asarray(actions, np.float32).reshape(self.n, 2)
        thr = np.ascontiguousarray(a[:, 0])
        st = np.ascontiguousarray(a[:, 1])
        obs = np.zeros((self.n, 127), np.float32)
        rew = np.zeros((self.n,), np.float32)
        done = np.zeros((self.n,), np.int32)
        status = np.zeros((self.n,), np.int32)
        flags = np.zeros((3,), np.int32)
        step = self._lib.env_step(self._h, thr, st, self.n, dt, obs, rew, done,
                                  status, flags)
        return dict(obs=obs, reward=rew, done=done, status=status,
                    terminated=bool(flags[0]), truncated=bool(flags[1]),
                    agents_alive=int(flags[2]), step=step)

    def get_obs(self) -> np.ndarray:
        obs = np.zeros((self.n, 127), np.float32)
        self._lib.env_get_obs(self._h, obs)
        return obs

    def egos(self) -> np.ndarray:
        n = self._lib.env_num_egos(self._h)
        out = np.zeros((n, 7), np.float32)
        self._lib.env_get_egos(self._h, out)
        return out

    def npcs(self) -> np.ndarray:
        m = self._lib.env_num_npcs(self._h)
        out = np.zeros((m, 7), np.float32)
        if m:
            self._lib.env_get_npcs(self._h, out)
        return out

    def lidar(self, agent: int) -> np.ndarray:
        out = np.zeros((96,), np.float32)
        self._lib.env_get_lidar(self._h, agent, out)
        return out
