"""Device mesh construction and sharding rules (DP + optional TP over ICI).

The reference has no distributed layer at all (single Apple-silicon GPU,
"NO distributed training" — SURVEY §2c); this module is the TPU-native
equivalent it needs: a (data, model) mesh over ICI, batch sharding along
'data', replicated or tensor-sharded parameters, and XLA-inserted
collectives. Gradient all-reduce falls out of GSPMD: the batch is sharded,
parameters are replicated, so XLA emits a psum over 'data' for the grads.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Optional[Mesh]:
    """Build a (data, model) mesh over the available devices.

    data defaults to n_devices // model. Returns None when there is a
    single device and no model parallelism (plain single-chip execution).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model < 1 or n % model != 0:
        raise ValueError(f"model={model} does not divide {n} devices")
    if data is None:
        data = n // model
    if data * model != n:
        devices = devices[: data * model]
    if data * model == 1:
        return None
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(mesh: Optional[Mesh], *arrays):
    """Place arrays with the batch axis sharded over 'data'."""
    if mesh is None:
        return arrays if len(arrays) > 1 else arrays[0]
    out = tuple(
        jax.device_put(a, batch_sharding(mesh, a.ndim)) for a in arrays
    )
    return out if len(out) > 1 else out[0]


def shard_chunk(mesh: Optional[Mesh], *arrays):
    """Place (C, B, ...) multi-step chunks with axis 1 (batch) sharded
    over 'data' — the chunk axis C is a time axis (lax.scan steps in
    train_chunk), never sharded."""
    if mesh is None:
        return arrays if len(arrays) > 1 else arrays[0]
    out = tuple(
        jax.device_put(
            a, NamedSharding(mesh, P(None, "data", *([None] * (a.ndim - 2))))
        )
        for a in arrays
    )
    return out if len(out) > 1 else out[0]


def replicate(mesh: Optional[Mesh], tree):
    """Fully replicate a pytree over the mesh."""
    if mesh is None:
        return tree
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


# -- tensor-parallel sharding rules ---------------------------------------

# param-path regex -> PartitionSpec. Matmul-heavy weights split over the
# 'model' axis: qkv/mlp1 column-sharded, out/mlp2 row-sharded, so each
# block needs one all-reduce per attention/MLP (the Megatron layout).
TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*\.attn\.(query|key|value)\.w$", P(None, "model")),
    (r".*\.attn\.(query|value)\.b$", P("model")),
    (r".*\.cross_attn\.(query|key|value)\.w$", P(None, "model")),
    (r".*\.cross_attn\.(query|value)\.b$", P("model")),
    (r".*\.attn\.out\.w$", P("model", None)),
    (r".*\.cross_attn\.out\.w$", P("model", None)),
    (r".*\.mlp1\.w$", P(None, "model")),
    (r".*\.mlp1\.b$", P("model")),
    (r".*\.mlp2\.w$", P("model", None)),
    (r"decoder\.token_embedding$", P(None, None)),
)


def spec_for_param(path: str, rules=TP_RULES) -> P:
    for pattern, spec in rules:
        if re.fullmatch(pattern, path):
            return spec
    return P()


def param_shardings(mesh: Mesh, params, rules=TP_RULES):
    """Pytree of NamedShardings for tensor-parallel parameter placement."""
    from ..models.convert import flatten_params, unflatten_params

    flat = flatten_params(params)
    specs = {k: NamedSharding(mesh, spec_for_param(k, rules)) for k in flat}
    return unflatten_params(specs)


def shard_params(mesh: Optional[Mesh], params, tensor_parallel: bool = False):
    """Place parameters on the mesh (replicated, or TP-sharded)."""
    if mesh is None:
        return params
    if not tensor_parallel or mesh.shape.get("model", 1) == 1:
        return replicate(mesh, params)
    shardings = param_shardings(mesh, params)
    return jax.tree.map(jax.device_put, params, shardings)
