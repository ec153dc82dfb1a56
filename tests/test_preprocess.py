"""ScanNet preprocessing: label remap, instance re-index, .sens parsing."""

import os
import struct
import zlib

import numpy as np
import pytest

from dmnerf_tpu.data.scannet_preprocess.preprocess import (
    SEM_IDS_TRAIN_CLS19, map_ins_ids, map_sem_nyu, map_sem_train_ids)
from dmnerf_tpu.data.scannet_preprocess.sensordata import SensorData
from dmnerf_tpu.edit.deform import deform_offsets, deform_rays


def test_sem_remap():
    img = np.array([[10, 20], [30, 5]], np.int16)
    mapping = {10: 3, 20: 4, 30: 99, 5: 5}
    nyu = map_sem_nyu(img, mapping)
    np.testing.assert_array_equal(nyu, [[3, 4], [99, 5]])
    train = map_sem_train_ids(nyu)
    # nyu 3 -> class 0, nyu 4 -> class 1, nyu 5 -> class 2; 99 -> -1
    np.testing.assert_array_equal(train, [[0, 1], [-1, 2]])


def test_ins_reindex():
    sem = np.array([[0, 0, -1], [1, 1, -1]], np.int16)
    ins = np.array([[7, 7, 7], [9, 9, 9]], np.int16)
    out = map_ins_ids(ins, sem)
    np.testing.assert_array_equal(out, [[0, 0, -1], [1, 1, -1]])


def test_ins_reindex_rejects_multi_sem():
    sem = np.array([[0, 1]], np.int16)
    ins = np.array([[7, 7]], np.int16)
    with pytest.raises(ValueError):
        map_ins_ids(ins, sem)


def _write_sens(path, n_frames=2, H=4, W=6):
    """Minimal valid version-4 .sens file."""
    with open(path, "wb") as f:
        f.write(struct.pack("I", 4))
        name = b"testcam"
        f.write(struct.pack("Q", len(name)))
        f.write(name)
        for _ in range(4):  # 4 intrinsic/extrinsic matrices
            f.write(np.eye(4, dtype=np.float32).tobytes())
        f.write(struct.pack("i", 2))  # jpeg color
        f.write(struct.pack("i", 1))  # zlib_ushort depth
        f.write(struct.pack("I", W))
        f.write(struct.pack("I", H))
        f.write(struct.pack("I", W))
        f.write(struct.pack("I", H))
        f.write(struct.pack("f", 1000.0))
        f.write(struct.pack("Q", n_frames))
        rng = np.random.default_rng(0)
        for i in range(n_frames):
            pose = np.eye(4, dtype=np.float32)
            pose[0, 3] = i
            f.write(pose.tobytes())
            f.write(struct.pack("Q", i))
            f.write(struct.pack("Q", i))
            color = b"fakejpegdata" + bytes([i])
            depth = zlib.compress(
                rng.integers(0, 5000, (H, W), dtype=np.uint16).tobytes())
            f.write(struct.pack("Q", len(color)))
            f.write(struct.pack("Q", len(depth)))
            f.write(color)
            f.write(depth)


def test_sensordata_parse(tmp_path):
    p = os.path.join(tmp_path, "scene.sens")
    _write_sens(p)
    sd = SensorData(p)
    assert sd.num_frames == 2
    assert sd.color_compression == "jpeg"
    assert sd.depth_compression == "zlib_ushort"
    assert sd.depth_shift == 1000.0
    frames = list(sd.iter_frames())
    assert len(frames) == 2
    i, pose, color, depth_blob = frames[1]
    assert pose[0, 3] == 1.0
    depth = sd.decode_depth(depth_blob)
    assert depth.shape == (4, 6) and depth.dtype == np.uint16


def test_deform_offsets_shapes():
    for fn in ("sin", "ex", "linear", "abs_linear", "ln"):
        off = deform_offsets(fn, 8, 10, view_idx=1)
        assert off.shape == (80,)
        assert np.isfinite(off).all()
    with pytest.raises(ValueError):
        deform_offsets("bogus", 4, 4)


def test_deform_rays_shifts_x_only():
    rng = np.random.default_rng(0)
    ro = rng.normal(size=(12, 3)).astype(np.float32)
    rd = rng.normal(size=(12, 3)).astype(np.float32)
    o2, d2 = deform_rays(ro, rd, "ex", 3, 4)
    np.testing.assert_array_equal(d2, rd)
    np.testing.assert_array_equal(o2[:, 1:], ro[:, 1:])
    assert (o2[:, 0] != ro[:, 0]).all()
