"""marl_traffic_intersection_tpu — TPU-native MARL unsignalized-intersection framework.

A ground-up JAX/XLA rebuild of the capabilities of the reference
ShamG1/marl-traffic-intersection C++/pybind11 environment: pure-functional,
fixed-shape, jit/vmap-batched simulation (physics, Bezier routes, beam lidar,
SAT/line collision, NPC traffic, rewards), sharded over TPU device meshes, with
a Gym-compatible wrapper, vectorized env stack, PPO learner, and host-side
debug rendering.
"""
from .core.constants import OBS_DIM, STATUS_NAMES
from .core.env import EnvConfig, EnvState, IntersectionEnv, RewardParams, StepOutput
from .core.routes import (
    DEFAULT_ROUTE_MAPPING_2LANES,
    DEFAULT_ROUTE_MAPPING_3LANES,
    RouteTable,
    build_lane_layout,
    build_route_table,
    default_ego_routes,
)

__version__ = "0.1.0"

__all__ = [
    "EnvConfig",
    "EnvState",
    "IntersectionEnv",
    "RewardParams",
    "StepOutput",
    "RouteTable",
    "build_route_table",
    "build_lane_layout",
    "default_ego_routes",
    "DEFAULT_ROUTE_MAPPING_2LANES",
    "DEFAULT_ROUTE_MAPPING_3LANES",
    "OBS_DIM",
    "STATUS_NAMES",
]
