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
