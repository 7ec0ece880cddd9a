"""Policy/value model families for the intersection MARL task."""
from .actor_critic import ActorCriticMLP, sample_action, logp_and_entropy
from .attention import SceneTransformerPolicy

__all__ = ["ActorCriticMLP", "SceneTransformerPolicy", "sample_action",
           "logp_and_entropy"]
