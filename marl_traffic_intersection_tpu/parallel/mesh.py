"""Device mesh + sharding helpers.

TPU-native scaling design (net-new vs the single-process reference; SURVEY.md
§5.8): a 2-D ``(data, model)`` mesh. The env batch is sharded along ``data``
(env instances are fully independent — stepping needs zero communication);
policy parameters are optionally tensor-sharded along ``model``. Gradient
reduction across ``data`` is *implicit*: the loss mean contracts the sharded
batch axis, and XLA inserts the psum over ICI. Multi-host: call
``jax.distributed.initialize()`` before ``make_mesh`` and the same code runs
on a pod slice — ``jax.devices()`` spans all hosts.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (n_data, n_model, len(devices))
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def make_hybrid_mesh(n_model: int = 1, devices: Optional[Sequence] = None
                     ) -> Mesh:
    """Multi-slice mesh for pods connected over DCN: axes
    ``('replica', 'data', 'model')`` where ``replica`` spans slices (DCN) and
    ``data``/``model`` stay inside a slice (ICI).

    Env stepping is embarrassingly parallel (zero communication), so the only
    DCN traffic is the once-per-update gradient psum over the loss reduction —
    a few hundred KB for these model families — which DCN absorbs trivially:
    shard the env batch over ``('replica', 'data')`` jointly and scaling
    across slices is linear. Falls back to a single-slice ``(data, model)``
    mesh (with a size-1 replica axis) when the runtime exposes no slice
    topology (CPU, single slice).
    """
    devices = list(devices if devices is not None else jax.devices())
    slice_ids = {getattr(d, "slice_index", 0) for d in devices}
    n_slices = max(len(slice_ids), 1)
    per_slice = len(devices) // n_slices
    if n_slices > 1:
        from jax.experimental import mesh_utils
        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, per_slice // n_model, n_model),
            dcn_mesh_shape=(n_slices, 1, 1), devices=devices)
        return Mesh(arr, ("replica", "data", "model"))
    arr = np.asarray(devices).reshape(1, len(devices) // n_model, n_model)
    return Mesh(arr, ("replica", "data", "model"))


def hybrid_data_sharding(mesh: Mesh) -> NamedSharding:
    """Env-batch sharding over both the DCN replica and ICI data axes."""
    return NamedSharding(mesh, P(("replica", "data")))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis (env batch)."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_tree(mesh: Mesh, tree):
    """Apply leading-axis data sharding to every array in a pytree."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


# --------------------------------------------------------------------- tensor
def _mlp_rule(path: str) -> P:
    """Tensor-parallel layout for ActorCriticMLP: first torso layer column-
    sharded, second row-sharded (XLA inserts the psum on the contraction);
    heads replicated."""
    if "torso_0" in path:
        return P(None, "model") if path.endswith("kernel") else P("model")
    if "torso_1" in path:
        return P("model", None) if path.endswith("kernel") else P()
    return P()


def _transformer_rule(path: str) -> P:
    """Megatron-style layout for SceneTransformerPolicy blocks: QKV/MLP-up
    column-sharded, attention-out/MLP-down row-sharded."""
    k = path.endswith("kernel")
    if any(s in path for s in ("query", "key", "value")):
        return P(None, "model", None) if k else P("model", None)
    if "attention/out" in path or "out/kernel" in path and "block" in path:
        return P("model", None, None) if k else P()
    if "block" in path and "Dense_0" in path:
        return P(None, "model") if k else P("model")
    if "block" in path and "Dense_1" in path:
        return P("model", None) if k else P()
    return P()


def _conv_rule(path: str) -> P:
    """LidarConvPolicy: the wide fused layer column-sharded (the ray convs are
    tiny and stay replicated); XLA inserts the psum at the head contraction."""
    if "fuse" in path:
        return P(None, "model") if path.endswith("kernel") else P("model")
    return P()


def _gru_rule(path: str) -> P:
    """RecurrentActorCritic: the input torso column-sharded; the GRU cell and
    heads replicated (the recurrent carry must stay whole per device)."""
    if "torso_0" in path:
        return P(None, "model") if path.endswith("kernel") else P("model")
    return P()


def _central_rule(path: str) -> P:
    """CentralizedActorCritic: the actor torso shards like the MLP family;
    the critic's pooled-embed path is small (embed=128) and stays replicated
    so the agent-axis mean-pool never crosses devices."""
    return _mlp_rule(path)


def _sac_rule(path: str) -> P:
    """SquashedGaussianActor: plain MLP torso — same megatron split as the
    MLP family (first torso column-sharded, second row-sharded)."""
    return _mlp_rule(path)


def _sac_q_rule(path: str) -> P:
    """Twin-stacked QCritic (leading axis 2 over the two critics, applied
    under vmap — parallel/sac.py): the TP split rides the *feature* dims
    behind the twin axis. torso_0 column-sharded on the hidden dim, torso_1
    and the scalar head row-sharded on their input dim (XLA inserts the psum
    at each contraction); the twin axis itself stays whole per device. The
    torso_0 input dim (OBS_DIM+act_dim = 129, odd) never divides a tp axis,
    so column-on-output is also the only viable first split."""
    k = path.endswith("kernel")
    if "torso_0" in path:
        return P(None, None, "model") if k else P(None, "model")
    if "torso_1" in path:
        return P(None, "model", None) if k else P()
    if path.endswith("q/kernel"):
        return P(None, "model", None)
    return P()


_RULES = {"mlp": _mlp_rule, "attention": _transformer_rule, "conv": _conv_rule,
          "gru": _gru_rule, "central": _central_rule, "sac": _sac_rule,
          "sac_q": _sac_q_rule}


def param_shardings(mesh: Mesh, params, model_kind: str = "mlp"):
    """NamedSharding tree for a params pytree under the given mesh."""
    rule = _RULES.get(model_kind, _mlp_rule)

    def assign(path, leaf):
        pstr = "/".join(str(getattr(p, "key", p)) for p in path)
        spec = rule(pstr)
        if len([s for s in spec if s is not None]) > 0 and leaf.ndim < len(spec):
            spec = P()
        # drop specs that don't divide the dim evenly
        try:
            for d, s in zip(leaf.shape, spec):
                if s is not None and d % mesh.shape["model"] != 0:
                    return NamedSharding(mesh, P())
        except Exception:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(assign, params)
