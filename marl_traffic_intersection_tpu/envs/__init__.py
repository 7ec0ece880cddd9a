"""Environment wrappers: Gym-compatible single env + vmap-batched vector env."""
from .gym import GymIntersectionEnv
from .vector import VectorEnv

__all__ = ["GymIntersectionEnv", "VectorEnv"]
