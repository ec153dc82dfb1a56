"""Fused Pallas field, forward/eval entry point.

The actual kernels live in ops/pallas/field_kernels.py (shared between the
eval forward and the trainable custom-VJP paths — see that module's docstring
for the TPU design rationale and measured numbers). This module keeps the
round-1 public API used by the eval renderer and tests.
"""

from __future__ import annotations

from dmnerf_tpu.models.fields import FieldConfig
from dmnerf_tpu.ops.pallas.field_kernels import TILE_FWD, make_field

TILE_P = TILE_FWD  # compat alias


def make_pallas_field(cfg: FieldConfig, mesh=None):
    """Returns field(params, pts [R,S,3], viewdirs [R,1,3]) -> raw [R,S,C].
    Under a mesh the kernel shard_maps over the point axis."""
    return make_field(cfg, trainable=False, mesh=mesh)
