"""Label-map visualization (host-side).

Behavior parity with /root/reference/tools/visualizer.py:57-86,208-223:
- render_label2img: predicted label map -> RGB via the run's pred->gt matching
  (ins_map) composed with the scene's color_dict (gt label -> palette index).
- render_gt_label2img: gt label map -> RGB via color_dict.
- render_label2world: same mapping for per-vertex mesh labels.
Unmapped labels stay black.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def to8b(x: np.ndarray) -> np.ndarray:
    return (255 * np.clip(x, 0, 1)).astype(np.uint8)


def _map_labels(labels: np.ndarray, rgbs: np.ndarray, get_rgb) -> np.ndarray:
    out = np.zeros(labels.shape + (3,), np.float64)
    for lab in np.unique(labels):
        rgb = get_rgb(int(lab))
        if rgb is not None:
            out[labels == lab] = rgb
    return out.astype(np.uint8)


def render_label2img(pred_labels: np.ndarray, ins_rgbs: np.ndarray,
                     color_dict: Dict[str, int], ins_map: Dict[str, int]) -> np.ndarray:
    def get(lab):
        key = str(lab)
        if key in ins_map:
            return ins_rgbs[color_dict[str(ins_map[key])]]
        return None
    return _map_labels(np.asarray(pred_labels), ins_rgbs, get)


def render_gt_label2img(gt_labels: np.ndarray, ins_rgbs: np.ndarray,
                        color_dict: Dict[str, int]) -> np.ndarray:
    def get(lab):
        key = str(lab)
        if key in color_dict:
            return ins_rgbs[color_dict[key]]
        return None
    return _map_labels(np.asarray(gt_labels), ins_rgbs, get)


def render_label2world(pred_labels: np.ndarray, ins_rgbs: np.ndarray,
                       color_dict: Dict[str, int], ins_map: Dict[str, int]) -> np.ndarray:
    """Per-vertex labels [N] -> colors [N, 3]."""
    return render_label2img(pred_labels, ins_rgbs, color_dict, ins_map)


def load_color_dict(path: str, dataset_name: str, scene_name: str) -> Dict[str, int]:
    import json
    with open(path) as f:
        return json.load(f)[dataset_name][scene_name]
