"""Host-side dataset container + dispatch.

The reference returns loose tuples from each loader (loader_dmsr.py:115-140 etc.);
here everything lands in one SceneData so train/test/manipulation/mesh paths share
a single interface. Arrays are numpy on host; `to_device_arrays` packs what the
jitted train step needs into SceneArrays (HBM-resident).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class SceneData:
    images: np.ndarray                 # [N, H, W, 3] f32 in [0, 1]
    poses: np.ndarray                  # [N, 4, 4] f32
    H: int
    W: int
    K: np.ndarray                      # [3, 3]
    i_train: np.ndarray
    i_test: np.ndarray
    gt_labels: np.ndarray              # [N, H, W] int
    ins_rgbs: np.ndarray               # [ins_num(, +), 3] palette
    ins_num: int
    # DM-SR manipulation/mesh metadata (loader_dmsr.py:62-74)
    objs: Optional[List[Dict[str, Any]]] = None
    view_poses: Optional[np.ndarray] = None
    ins_map: Optional[Dict[str, int]] = None
    # ScanNet extras (loader_scannet.py:136-168)
    ins_indices: Optional[List[np.ndarray]] = None  # per-image labeled flat pixel ids
    crop_mask: Optional[np.ndarray] = None          # [H, W] 0/1

    @property
    def hwk(self):
        return self.H, self.W, self.K

    def to_device_arrays(self, mesh=None):
        """Pack training arrays for the jitted step (SceneArrays)."""
        import jax.numpy as jnp

        from dmnerf_tpu.train.step import SceneArrays

        labeled_idx = labeled_cnt = crop_idx = None
        if self.ins_indices is not None:
            max_lab = max(max(len(ix) for ix in self.ins_indices), 1)
            n = len(self.ins_indices)
            padded = np.zeros((n, max_lab), np.int32)
            cnt = np.zeros((n,), np.int32)
            for i, ix in enumerate(self.ins_indices):
                padded[i, :len(ix)] = ix
                cnt[i] = len(ix)
            labeled_idx = jnp.asarray(padded)
            labeled_cnt = jnp.asarray(cnt)
        if self.crop_mask is not None:
            crop_idx = jnp.asarray(
                np.where(self.crop_mask.reshape(-1) == 1)[0].astype(np.int32))

        arrs = SceneArrays(
            images=jnp.asarray(self.images, jnp.float32),
            labels=jnp.asarray(self.gt_labels, jnp.int32),
            poses=jnp.asarray(self.poses, jnp.float32),
            K=jnp.asarray(self.K, jnp.float32),
            labeled_idx=labeled_idx,
            labeled_cnt=labeled_cnt,
            crop_idx=crop_idx,
        )
        if mesh is not None:
            from dmnerf_tpu.parallel.mesh import put_replicated
            arrs = put_replicated(arrs, mesh)
        return arrs


def dataset_name_from_dir(datadir: str) -> str:
    parts = [p for p in datadir.replace("\\", "/").split("/") if p and p != "."]
    for p in parts:
        if p in ("dmsr", "replica", "scannet", "synthetic"):
            return p
    # variant dirs keep their family's loader (e.g. replica64 -> replica)
    for p in parts:
        for name in ("dmsr", "replica", "scannet", "synthetic"):
            if p.startswith(name):
                return name
    return parts[-2] if len(parts) >= 2 else "dmsr"


def load_dataset(args) -> SceneData:
    name = dataset_name_from_dir(args.datadir)
    if name == "dmsr":
        from dmnerf_tpu.data.dmsr import load_data
    elif name == "replica":
        from dmnerf_tpu.data.replica import load_data
    elif name == "scannet":
        from dmnerf_tpu.data.scannet import load_data
    elif name == "synthetic":
        from dmnerf_tpu.data.synthetic import load_data
    else:
        raise ValueError(f"unknown dataset for datadir={args.datadir!r}")
    return load_data(args)
