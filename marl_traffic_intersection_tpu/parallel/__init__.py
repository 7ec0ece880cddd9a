"""Device-mesh sharding and the distributed PPO learner."""
from .mesh import make_mesh, data_sharding, replicate, param_shardings
from .ppo import PPOConfig, PPOLearner

__all__ = ["make_mesh", "data_sharding", "replicate", "param_shardings",
           "PPOConfig", "PPOLearner"]
