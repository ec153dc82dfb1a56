"""Stress-scene writers round-trip through the REAL dataset loaders.

tools/make_stress_scenes.py writes fixtures in the three reference on-disk
layouts; these tests generate tiny instances and load them back through
data.dmsr / data.dmsr_mani / data.replica / data.scannet — the same loader
path the CLIs use — validating the format contract end to end on CPU.
"""

import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.make_stress_scenes import (Renderer, write_dmsr, write_replica,
                                      write_scannet)


@pytest.fixture(scope="module")
def rend():
    return Renderer("cpu", n_samples=48)


def _args(**kw):
    kw.setdefault("testskip", 1)
    return types.SimpleNamespace(**kw)


def test_dmsr_writer_roundtrip(tmp_path_factory, rend):
    out = str(tmp_path_factory.mktemp("stress"))
    write_dmsr(out, rend, n_obj=5, H=24, W=32, n_train=3, n_test=2,
               target_label=2)
    datadir = os.path.join(out, "dmsr", "stress")

    from dmnerf_tpu.data.dmsr import load_data
    sc = load_data(_args(datadir=datadir, is_train=True))
    assert sc.images.shape == (5, 24, 32, 3)
    assert sc.ins_num == 6  # 5 objects + room palette row
    assert sc.gt_labels.shape == (5, 24, 32)
    assert set(np.unique(sc.gt_labels)) <= set(range(6))
    assert len(sc.i_train) == 3 and len(sc.i_test) == 2
    # DM-SR K sign convention (loader_dmsr.py:136-137)
    assert sc.K[1, 1] < 0 and sc.K[2, 2] == -1.0

    # manipulation GT split loads through the mani loader
    from dmnerf_tpu.data.dmsr_mani import load_data as load_mani
    sm = load_mani(_args(datadir=datadir, mani_mode="translation"))
    assert sm.images.shape == (2, 24, 32, 3)
    assert len(sm.i_test) == 2 and len(sm.i_train) == 0

    # the CLI's generate_poses_eval must find the shipped center
    from dmnerf_tpu.edit.transforms import generate_poses_eval, load_mani_poses
    args = _args(datadir=datadir, mani_mode="translation", expname="not_in_table")
    generate_poses_eval(args)
    T = np.array(load_mani_poses(args)["transformations"][0]["transformation"])
    assert T.shape == (4, 4) and not np.allclose(T, np.eye(4))

    # mesh/demo metadata
    sd = load_data(_args(datadir=datadir, is_train=False, mesh=True,
                         mani_type="rigid", views=2))
    assert sd.objs and sd.objs[0]["tar_id"] == 2
    assert sd.view_poses is not None


def test_replica_writer_roundtrip(tmp_path_factory, rend):
    out = str(tmp_path_factory.mktemp("stress_r"))
    write_replica(out, rend, n_obj=3, H=16, W=20)
    datadir = os.path.join(out, "replica", "stress")

    from dmnerf_tpu.data.replica import load_data
    sc = load_data(_args(datadir=datadir, testskip=8))
    assert sc.images.shape[1:] == (16, 20, 3)
    assert len(sc.i_train) == 180
    assert sc.ins_num == 4
    assert sc.K[2, 2] == 1.0  # z-forward convention
    assert np.isfinite(sc.poses).all()


def test_scannet_writer_roundtrip(tmp_path_factory, rend):
    out = str(tmp_path_factory.mktemp("stress_s"))
    write_scannet(out, rend, n_obj=5, H=24, W=32, n_train=3, n_test=2)
    datadir = os.path.join(out, "scannet", "stress")

    from dmnerf_tpu.data.scannet import load_data
    sc = load_data(_args(datadir=datadir, resize=False,
                         crop_width=24, crop_height=16))
    assert sc.images.shape == (5, 24, 32, 3)
    # room was written as -1 (unlabeled) -> remapped to ins_num; ins_num is
    # derived from the labels actually visible (loader_scannet.py:130-133),
    # which at this tiny resolution may be fewer than the 5 objects written
    assert 3 <= sc.ins_num <= 5
    assert sc.gt_labels.max() == sc.ins_num
    assert sc.crop_mask is not None and sc.crop_mask.sum() == 24 * 16
    # labeled (weak-supervision) indices exist and exclude out-of-crop pixels
    assert sc.ins_indices is not None and len(sc.ins_indices) == 5
    flat_mask = sc.crop_mask.reshape(-1)
    for ix in sc.ins_indices:
        assert (flat_mask[ix] == 1).all()
