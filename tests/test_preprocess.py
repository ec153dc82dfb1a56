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
    # id order is the reference's `list(set(...))` hash-slot order, not
    # sorted: {7, 9} iterates as [9, 7] (slots 9%8=1, 7%8=7), so 9 -> 0
    np.testing.assert_array_equal(out, [[1, 1, -1], [0, 0, -1]])
    # invalid pixels (sem == -1) are dropped before re-indexing
    assert set(np.unique(out).tolist()) == {-1, 0, 1}


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


def test_sensordata_parse_matches_reference(tmp_path):
    """A/B our .sens parser against the reference's own SensorData
    (/root/reference/data/scannet/source_data/SensorData.py): both must read
    the same header fields, per-frame poses/blobs, and decoded depth from the
    same fabricated version-4 file."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_sensordata",
        "/root/reference/data/scannet/source_data/SensorData.py")
    ref_sd_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_sd_mod)

    p = os.path.join(tmp_path, "scene.sens")
    _write_sens(p, n_frames=3, H=5, W=7)

    ours = SensorData(p)
    theirs = ref_sd_mod.SensorData(p)

    assert ours.color_compression == theirs.color_compression_type == "jpeg"
    assert ours.depth_compression == theirs.depth_compression_type == "zlib_ushort"
    assert (ours.color_width, ours.color_height) == (
        theirs.color_width, theirs.color_height)
    assert (ours.depth_width, ours.depth_height) == (
        theirs.depth_width, theirs.depth_height)
    assert ours.depth_shift == theirs.depth_shift
    np.testing.assert_array_equal(ours.intrinsic_color, theirs.intrinsic_color)
    np.testing.assert_array_equal(ours.intrinsic_depth, theirs.intrinsic_depth)
    np.testing.assert_array_equal(ours.extrinsic_color, theirs.extrinsic_color)
    np.testing.assert_array_equal(ours.extrinsic_depth, theirs.extrinsic_depth)

    frames = list(ours.iter_frames())
    assert ours.num_frames == len(theirs.frames) == len(frames) == 3
    for (i, pose, color, depth_blob), tf in zip(frames, theirs.frames):
        np.testing.assert_array_equal(pose, tf.camera_to_world)
        assert color == tf.color_data
        assert depth_blob == tf.depth_data
        ref_depth = np.frombuffer(
            tf.decompress_depth(theirs.depth_compression_type),
            dtype=np.uint16).reshape(5, 7)
        np.testing.assert_array_equal(ours.decode_depth(depth_blob), ref_depth)


def _load_ref_preprocess():
    """Load the reference's preprocess.py by path with its unused heavy deps
    stubbed (plyfile + sibling modules only touched by mesh/export paths)."""
    import importlib.util
    import sys
    import types as _types

    for name, attrs in (("split", {"Split": object}),
                        ("plyfile", {"PlyData": object, "PlyElement": object}),
                        ("SensorData_py3", {"SensorData": object})):
        if name not in sys.modules:
            try:
                present = importlib.util.find_spec(name) is not None
            except (ModuleNotFoundError, ValueError):
                present = False
            if not present:
                mod = _types.ModuleType(name)
                for k, v in attrs.items():
                    setattr(mod, k, v)
                sys.modules[name] = mod
    spec = importlib.util.spec_from_file_location(
        "ref_preprocess",
        "/root/reference/data/scannet/source_data/preprocess.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


REF_TSV = "/root/reference/data/scannet/source_data/scannetv2-labels.combined.tsv"


def test_label_remap_matches_reference():
    """A/B the ScanNet label pipeline against the reference's own functions
    (preprocess.py:114-164) using the REAL scannetv2 label-map tsv: raw->NYU40
    mapping dict, NYU40 remap on images, 19-class train-id remap, and
    instance re-indexing."""
    rp = _load_ref_preprocess()
    from dmnerf_tpu.data.scannet_preprocess.preprocess import (
        SEM_IDS_TRAIN_CLS19, map_ins_ids, map_sem_nyu, map_sem_train_ids,
        read_label_mapping)

    assert rp.Data_configs.sem_ids_train_cls19 == SEM_IDS_TRAIN_CLS19

    ours_map = read_label_mapping(REF_TSV)
    theirs_map = rp.read_label_mapping(REF_TSV, label_from="id",
                                       label_to="nyu40id")
    assert ours_map == theirs_map and len(ours_map) > 500

    rng = np.random.default_rng(11)
    raw_ids = rng.choice(list(ours_map.keys()), size=40)
    raw = np.concatenate([raw_ids, [99999, 77777]]).astype(np.int16)[
        rng.permutation(42)].reshape(6, 7)  # 2 unknown ids stay unmapped
    ours_nyu = map_sem_nyu(raw, ours_map)
    theirs_nyu = rp.map_sem_nyuID(raw, theirs_map)
    np.testing.assert_array_equal(ours_nyu, theirs_nyu)

    nyu = rng.integers(1, 41, (8, 9)).astype(np.int16)
    ours19 = map_sem_train_ids(nyu)
    theirs19 = rp.map_sem_id(nyu, rp.Data_configs.sem_ids_train_cls19)
    np.testing.assert_array_equal(ours19, theirs19)
    assert ours19.dtype == theirs19.dtype == np.int16

    # instance re-index: instances respect semantic boundaries (valid input)
    sem19 = np.repeat(np.array([[-1, 0, 0, 3, 3, 7]], np.int16), 4, axis=0)
    ins = np.repeat(np.array([[5, 9, 9, 2, 2, 14]], np.int16), 4, axis=0)
    ours_ins = map_ins_ids(ins, sem19)
    theirs_ins = rp.map_ins_id(ins, sem19)
    np.testing.assert_array_equal(ours_ins, theirs_ins)
    assert ours_ins.dtype == theirs_ins.dtype == np.int16


def test_split_evenly_matches_reference(tmp_path):
    """A/B the even train/test frame split (reference split.py:143-180) on a
    fabricated scene: same valid-frame statistics, same index arithmetic, same
    split files."""
    import importlib.util
    import types as _types

    spec = importlib.util.spec_from_file_location(
        "ref_split", "/root/reference/data/scannet/split.py")
    rs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rs)

    # NOTE the reference's test-selection arithmetic (margin = len(test_idx)
    # - number + 100, split.py:160-166) only yields a non-empty test split for
    # number > 100 (it is tuned for number=300 on ~1500-frame scenes); our
    # implementation adds a clamped fallback for small scenes. A/B therefore
    # runs at realistic scale.
    scene = tmp_path / "scene0001_00"
    ins_dir = scene / "instance-filt-cls19"
    ins_dir.mkdir(parents=True)
    rng = np.random.default_rng(5)
    n_frames = 1000
    for i in range(n_frames):
        ins = np.full((12, 16), -1, np.int16)
        if i % 5 != 0:  # every 5th frame has no instances -> filtered out
            k = int(rng.integers(1, 4))
            for label in range(k):
                y, x = rng.integers(0, 8), rng.integers(0, 12)
                ins[y:y + 4, x:x + 4] = label
        np.savez(ins_dir / f"{i}.npz", ins_2d_label_id=ins)

    # ours (stub out the artifact copying: only split selection is under test)
    from dmnerf_tpu.data.scannet_preprocess import split as our_split
    our_out = tmp_path / "ours"
    import unittest.mock as mock
    with mock.patch.object(our_split.shutil, "copy"), \
         mock.patch.object(our_split.shutil, "copytree"):
        train_ids, test_ids = our_split.split_evenly(str(scene), str(our_out),
                                                     number=120)

    # theirs (same stub via their Split class + module-global save_dir)
    rs.save_dir = str(tmp_path / "ref")
    os.makedirs(rs.save_dir, exist_ok=True)
    rs.Split = lambda *a, **k: _types.SimpleNamespace(copy=lambda: None)
    rs.split_evenly(str(scene), 120)

    ref_train = np.loadtxt(os.path.join(rs.save_dir, "scene0001_00",
                                        "train_split.txt"), dtype=int)
    ref_test = np.loadtxt(os.path.join(rs.save_dir, "scene0001_00",
                                       "test_split.txt"), dtype=int)
    np.testing.assert_array_equal(train_ids, ref_train)
    np.testing.assert_array_equal(test_ids, ref_test)
    our_train = np.loadtxt(our_out / "scene0001_00" / "train_split.txt",
                           dtype=int)
    np.testing.assert_array_equal(our_train, ref_train)
