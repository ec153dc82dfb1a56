"""Checkpointing via orbax: params (coarse+fine), optimizer state, step.

The reference saves a torch .tar every i_save=10000 steps (train_dmsr.py:78-86)
but cannot RESUME training from it (SURVEY.md §5); here save/restore round-trips
the full TrainState so --resume works.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from dmnerf_tpu.train.step import TrainState

_CKPT_RE = re.compile(r"^ckpt_(\d{6,})$")


def save_checkpoint(log_dir: str, state: TrainState, step: int) -> str:
    path = os.path.abspath(os.path.join(log_dir, f"ckpt_{step:06d}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        # force=True: re-running into the same log_time overwrites, like the
        # reference's torch.save of {iter}.tar (train_dmsr.py:78-86)
        ckptr.save(path, jax.device_get(state), force=True)
    return path


def latest_checkpoint(log_dir: str) -> Optional[str]:
    if not os.path.isdir(log_dir):
        return None
    steps = []
    for name in os.listdir(log_dir):
        m = _CKPT_RE.match(name)
        if m:
            steps.append((int(m.group(1)), name))
    if not steps:
        return None
    steps.sort()
    return os.path.join(log_dir, steps[-1][1])


def checkpoint_step(path: str) -> int:
    m = _CKPT_RE.match(os.path.basename(path.rstrip("/")))
    return int(m.group(1)) if m else 0


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    with ocp.PyTreeCheckpointer() as ckptr:
        target = jax.device_get(template)
        restored = ckptr.restore(os.path.abspath(path), item=target)
    return jax.tree_util.tree_map(np.asarray, restored)
