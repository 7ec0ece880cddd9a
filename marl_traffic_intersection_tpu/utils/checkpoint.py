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


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, tree: Any) -> None:
    p = pathlib.Path(path).absolute()
    ckpt = _checkpointer()
    ckpt.save(p, jax.device_get(tree), force=True)


def restore_checkpoint(path: str, template: Any = None) -> Any:
    p = pathlib.Path(path).absolute()
    ckpt = _checkpointer()
    if template is not None:
        return ckpt.restore(p, item=template)
    return ckpt.restore(p)
