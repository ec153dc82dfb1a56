"""Device mesh + sharding helpers.

The reference is single-GPU with no distributed support (SURVEY.md §2). The
TPU-native scaling axis is the **ray batch**: a 1-D mesh ('data',) shards rays
across chips; parameters are replicated; gradients and the [K, K] instance-loss
cost matrices reduce over ICI via XLA-inserted psums. No custom transport —
everything is expressed as sharding constraints under jit.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = 0, axis_name: str = "data",
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data mesh over the first n_devices local devices (0 = all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices and n_devices > 0:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def make_mesh_2d(data: int, model: int, devices: Optional[Sequence] = None) -> Mesh:
    """2-D (data, model) mesh: rays shard over 'data', MLP feature dims over
    'model' (tensor parallel). At DM-NeRF's ~1.2 M params TP is not a perf win
    (params fit in a corner of VMEM) — the axis exists so the sharding story
    and its collectives compile and are testable; the XLA partitioner inserts
    the all-gathers/reduce-scatters."""
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= data * model, \
        f"need {data * model} devices, have {len(devices)}"
    arr = np.array(devices[:data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def shard_params_model(params, mesh: Mesh):
    """Constrain parameter leaves over the 'model' axis: 2-D kernels shard the
    output-feature dim, 1-D biases shard outright; replicated over 'data'."""
    m = mesh.shape["model"]

    def cons(leaf):
        if leaf.ndim == 2 and leaf.shape[1] % m == 0:
            spec = P(None, "model")
        elif leaf.ndim == 1 and leaf.shape[0] % m == 0:
            spec = P("model")
        else:
            spec = P()  # tiny heads (e.g. density [W,1]) stay replicated
        return jax.lax.with_sharding_constraint(leaf, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(cons, params)


def shard_batch(x, mesh: Mesh, axis_name: str = "data"):
    """Constrain leading axis of every leaf to be sharded over the mesh."""
    def cons(leaf):
        spec = P(axis_name, *([None] * (leaf.ndim - 1)))
        return jax.lax.with_sharding_constraint(leaf, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(cons, x)


def replicate(x, mesh: Mesh):
    def cons(leaf):
        return jax.lax.with_sharding_constraint(leaf, NamedSharding(mesh, P()))
    return jax.tree_util.tree_map(cons, x)


def put_sharded(x, mesh: Mesh, axis_name: str = "data"):
    """device_put a host array sharded along its leading axis."""
    def put(leaf):
        spec = P(axis_name, *([None] * (leaf.ndim - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, x)


def put_replicated(x, mesh: Mesh):
    def put(leaf):
        return jax.device_put(leaf, NamedSharding(mesh, P()))
    return jax.tree_util.tree_map(put, x)
