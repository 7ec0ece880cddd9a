"""Checkpoint/restore for train state + env state.

The reference's only persistence is the in-memory EnvState snapshot for MCTS
rollback (reference: cpp/EnvState.h, IntersectionEnv.cpp:394-416). Here every
state is a pytree, so disk checkpointing falls out via orbax; in-memory
snapshot/rollback is just holding the pytree value.
"""
from __future__ import annotations

import pathlib
from typing import Any

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def _pad_empty(leaf):
    """Orbax refuses zero-size arrays (e.g. the 0-slot NPC buffers of a
    traffic-off EnvState); stand in a 1-element placeholder of the same
    dtype. Restored values are swapped back from the template's shape."""
    a = np.asarray(leaf)
    if a.size == 0:
        return np.zeros((1,), a.dtype)
    return leaf


def save_checkpoint(path: str, tree: Any) -> None:
    p = pathlib.Path(path).absolute()
    ckpt = _checkpointer()
    ckpt.save(p, jax.tree.map(_pad_empty, jax.device_get(tree)), force=True)


def restore_checkpoint(path: str, template: Any = None) -> Any:
    p = pathlib.Path(path).absolute()
    ckpt = _checkpointer()
    if template is not None:
        restored = ckpt.restore(p, item=jax.tree.map(_pad_empty, template))
        return jax.tree.map(
            lambda t, r: t if np.asarray(t).size == 0 else r, template, restored)
    return ckpt.restore(p)


def load_policy(checkpoint: str, model_kind: str):
    """Load a trained policy of any family for deterministic inference.

    Single place for the per-family checkpoint layout (PPO families store
    {"params": ...}; SAC stores {"actor_params": ...}) shared by
    eval.py / play.py / serve.py. Returns ``(model, params, mean_fn)`` where
    ``mean_fn(params, obs) -> pre-tanh action mean`` for the feedforward
    families; ``mean_fn`` is None for 'gru' (callers thread the hidden state
    through ``model.apply(params, obs, h)`` themselves).
    """
    if model_kind == "sac":
        from ..models.sac import SquashedGaussianActor
        model = SquashedGaussianActor()
        params = restore_checkpoint(checkpoint)["actor_params"]
        mean_fn = lambda p, o: model.apply(p, o)[0]
    else:
        from ..models import make_model
        model = make_model(model_kind)
        params = restore_checkpoint(checkpoint)["params"]
        mean_fn = (None if model_kind == "gru"
                   else (lambda p, o: model.apply(p, o)[0]))
    return model, params, mean_fn
