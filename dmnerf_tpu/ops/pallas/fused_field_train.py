"""Trainable fused Pallas field (custom VJP), training entry point.

The kernels live in ops/pallas/field_kernels.py; see its docstring for why the
round-2 rewrite (PE hoisted to XLA, pre-packed aligned weights, post-relu
activation reuse, merged head matmuls) beats both the round-1 kernel and the
XLA autodiff path. This module keeps the round-1 public API.
"""

from __future__ import annotations

from dmnerf_tpu.models.fields import FieldConfig
from dmnerf_tpu.ops.pallas.field_kernels import TILE_BWD, make_field


def make_trainable_pallas_field(cfg: FieldConfig, mesh=None):
    """Returns field(params, pts [R,S,3], viewdirs [R,1,3]) -> raw [R,S,C],
    differentiable wrt params (and pts/dirs), drop-in for apply_field.
    Under a mesh the kernel shard_maps over the point axis (grad psum via
    the shard_map transpose)."""
    return make_field(cfg, trainable=True, mesh=mesh)
