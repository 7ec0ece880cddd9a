"""Decision-making algorithms on top of the batched env."""
from .mcts import random_shooting_plan

__all__ = ["random_shooting_plan"]
