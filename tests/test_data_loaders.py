"""Dataset loaders driven on tiny on-disk fixtures (the reference ships no
fixtures; these synthesize the exact file layouts each loader expects)."""

import json
import os

import h5py
import numpy as np
import pytest

imageio = pytest.importorskip("imageio.v2")

from dmnerf_tpu.config import default_config
from dmnerf_tpu.data import dmsr, dmsr_mani, replica, scannet

H, W = 12, 16


def _write_png(path, arr):
    imageio.imwrite(path, arr)


def make_dmsr_fixture(root):
    rng = np.random.default_rng(0)
    for split, n in (("train", 3), ("test", 2)):
        os.makedirs(os.path.join(root, split, "rgbs"), exist_ok=True)
        os.makedirs(os.path.join(root, split, "semantic_instance"), exist_ok=True)
        frames = []
        for i in range(n):
            _write_png(os.path.join(root, split, "rgbs", f"{i:03d}.png"),
                       rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
            _write_png(os.path.join(root, split, "semantic_instance", f"{i:03d}.png"),
                       rng.integers(0, 4, (H, W)).astype(np.uint8))
            frames.append({"transform_matrix": np.eye(4).tolist()})
        with open(os.path.join(root, split, "transforms.json"), "w") as f:
            json.dump({"camera_angle_x": 0.8, "frames": frames}, f)
    with h5py.File(os.path.join(root, "ins_rgb.hdf5"), "w") as f:
        f.create_dataset("datasets", data=rng.integers(0, 255, (4, 3), dtype=np.uint8))


def test_dmsr_loader(tmp_path):
    root = str(tmp_path / "dmsr" / "tiny")
    make_dmsr_fixture(root)
    args = default_config(datadir=root, testskip=1, is_train=True)
    scene = dmsr.load_data(args)
    assert scene.images.shape == (5, H, W, 3)
    assert scene.images.dtype == np.float32 and scene.images.max() <= 1.0
    assert scene.poses.shape == (5, 4, 4)
    assert list(scene.i_train) == [0, 1, 2] and list(scene.i_test) == [3, 4]
    assert scene.ins_num == 4
    # DM-SR K sign convention (loader_dmsr.py:136-137)
    K = scene.K
    assert K[1, 1] < 0 and K[2, 2] == -1.0
    focal = 0.5 * W / np.tan(0.4)
    np.testing.assert_allclose(K[0, 0], focal, rtol=1e-6)


def test_dmsr_mani_loader(tmp_path):
    root = str(tmp_path / "dmsr" / "tiny")
    rng = np.random.default_rng(1)
    base = os.path.join(root, "mani", "translation")
    os.makedirs(os.path.join(base, "rgbs"), exist_ok=True)
    os.makedirs(os.path.join(base, "semantic_instance"), exist_ok=True)
    frames = []
    for i in range(2):
        _write_png(os.path.join(base, "rgbs", f"{i:03d}.png"),
                   rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
        _write_png(os.path.join(base, "semantic_instance", f"{i:03d}.png"),
                   rng.integers(0, 3, (H, W)).astype(np.uint8))
        frames.append({"transform_matrix": np.eye(4).tolist()})
    with open(os.path.join(root, "mani", "transforms.json"), "w") as f:
        json.dump({"camera_angle_x": 0.8, "frames": frames}, f)
    with h5py.File(os.path.join(root, "ins_rgb.hdf5"), "w") as f:
        f.create_dataset("datasets", data=rng.integers(0, 255, (3, 3), dtype=np.uint8))

    args = default_config(datadir=root, testskip=1, mani_mode="translation")
    scene = dmsr_mani.load_data(args)
    assert scene.images.shape == (2, H, W, 3)
    assert scene.gt_labels.shape == (2, H, W)
    assert scene.ins_num == 3


def test_replica_loader(tmp_path):
    root = str(tmp_path / "replica" / "tiny")
    rng = np.random.default_rng(2)
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(root, "semantic_instance"), exist_ok=True)
    # the loader hardcodes the 900-frame trajectory (loader_replica.py:80-83)
    np.savetxt(os.path.join(root, "traj_w_c.txt"),
               np.tile(np.eye(4).reshape(1, 16), (900, 1)), delimiter=" ")
    needed = set(range(0, 900, 5)) | {x + 2 for x in range(0, 900, 5)}
    for i in needed:
        _write_png(os.path.join(root, "rgb", f"rgb_{i}.png"),
                   rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
        _write_png(os.path.join(root, "semantic_instance", f"semantic_instance_{i}.png"),
                   rng.integers(0, 5, (H, W)).astype(np.uint8))
    with h5py.File(os.path.join(root, "ins_rgb.hdf5"), "w") as f:
        f.create_dataset("datasets", data=rng.integers(0, 255, (5, 3), dtype=np.uint8))

    args = default_config(datadir=root, testskip=30)
    scene = replica.load_data(args)
    assert len(scene.i_train) == 180
    assert len(scene.i_test) == 6  # 180 test ids thinned by 30
    assert scene.K[1, 1] > 0 and scene.K[2, 2] == 1.0  # replica convention
    np.testing.assert_allclose(scene.K[0, 0], W / 2.0)


def test_scannet_loader(tmp_path):
    root = str(tmp_path / "scannet" / "tiny")
    rng = np.random.default_rng(3)
    ids = {"train": [0, 2, 4], "test": [1, 3]}
    for split, idxs in ids.items():
        base = os.path.join(root, split)
        os.makedirs(os.path.join(base, f"{split}_images"), exist_ok=True)
        os.makedirs(os.path.join(base, f"{split}_pose"), exist_ok=True)
        os.makedirs(os.path.join(base, f"{split}_ins"), exist_ok=True)
        for i in idxs:
            imageio.imwrite(os.path.join(base, f"{split}_images", f"{i}.jpg"),
                            rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
            np.savetxt(os.path.join(base, f"{split}_pose", f"{i}.txt"),
                       np.eye(4), delimiter=" ")
            lab = rng.integers(-1, 3, (H, W)).astype(np.int16)
            np.savez(os.path.join(base, f"{split}_ins", f"{i}.npz"),
                     ins_2d_label_id=lab)
        np.savetxt(os.path.join(root, f"{split}_split.txt"), idxs, fmt="%i")
    os.makedirs(os.path.join(root, "intrinsic"), exist_ok=True)
    K = np.array([[20.0, 0, 8, 0], [0, 20.0, 6, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
    np.savetxt(os.path.join(root, "intrinsic", "intrinsic_color.txt"), K,
               delimiter=" ")
    with h5py.File(os.path.join(root, "ins_rgb.hdf5"), "w") as f:
        f.create_dataset("datasets", data=rng.integers(0, 255, (10, 3), dtype=np.uint8))

    args = default_config(datadir=root, testskip=1, resize=False,
                          crop_width=12, crop_height=8)
    scene = scannet.load_data(args)
    assert scene.images.shape == (5, H, W, 3)
    assert scene.ins_num == 3
    # unlabeled -1 remapped to ins_num
    assert scene.gt_labels.max() == 3 and scene.gt_labels.min() >= 0
    assert scene.crop_mask.sum() == 12 * 8
    # labeled indices exclude out-of-crop and unlabeled pixels
    for li, lab in zip(scene.ins_indices, scene.gt_labels):
        flat = lab.reshape(-1)
        mask = scene.crop_mask.reshape(-1)
        assert all(flat[i] != 3 and mask[i] == 1 for i in li)


def test_synthetic_crop_variant():
    """ScanNet-style synthetic: unlabeled class = ins_num, crop mask + labeled
    pixel indices attached."""
    from dmnerf_tpu.data.base import load_dataset

    args = default_config(datadir="./data/synthetic/boxroomcrop24x6")
    sc = load_dataset(args)
    assert sc.ins_num == 3
    assert sc.gt_labels.max() == 3  # unlabeled marker
    assert sc.crop_mask is not None and sc.ins_indices is not None
    flat_mask = sc.crop_mask.reshape(-1)
    for li, lab in zip(sc.ins_indices, sc.gt_labels):
        flat = lab.reshape(-1)
        assert all(flat[i] != 3 and flat_mask[i] == 1 for i in li[:50])
