"""Policy/value model families for the intersection MARL task."""
from .actor_critic import ActorCriticMLP, sample_action, logp_and_entropy
from .attention import SceneTransformerPolicy
from .central import CentralizedActorCritic
from .conv import LidarConvPolicy
from .recurrent import RecurrentActorCritic

MODEL_FAMILIES = {
    "mlp": ActorCriticMLP,
    "attention": SceneTransformerPolicy,
    "conv": LidarConvPolicy,
    "gru": RecurrentActorCritic,  # recurrent: needs RecurrentPPOLearner
    "central": CentralizedActorCritic,  # MAPPO-style centralized critic
}


def make_model(kind: str):
    """Instantiate a model family by name
    ('mlp' | 'attention' | 'conv' | 'gru' | 'central')."""
    try:
        return MODEL_FAMILIES[kind]()
    except KeyError:
        raise ValueError(f"unknown model family {kind!r}; "
                         f"choose from {sorted(MODEL_FAMILIES)}") from None


__all__ = ["ActorCriticMLP", "SceneTransformerPolicy", "LidarConvPolicy",
           "RecurrentActorCritic", "CentralizedActorCritic", "MODEL_FAMILIES",
           "make_model", "sample_action", "logp_and_entropy"]
