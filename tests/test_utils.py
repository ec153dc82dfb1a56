"""Utility modules: viz mappers, throughput meter, native fallback, cache."""

import numpy as np

from dmnerf_tpu.utils.profiling import ThroughputMeter
from dmnerf_tpu.utils.viz import (ins2img, matching_label2img, render_gt_label2img,
                                  render_label2img, to8b)


def test_to8b():
    np.testing.assert_array_equal(to8b(np.array([-0.5, 0.0, 0.5, 1.0, 2.0])),
                                  [0, 0, 127, 255, 255])


def test_render_label2img_mapping():
    rgbs = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    color_dict = {"0": 0, "1": 1, "7": 2}   # gt label -> palette idx
    ins_map = {"2": 7, "0": 0}              # pred label -> gt label
    pred = np.array([[2, 0], [1, 2]])       # pred label 1 unmatched -> black
    img = render_label2img(pred, rgbs, color_dict, ins_map)
    np.testing.assert_array_equal(img[0, 0], [0, 0, 255])   # 2 -> gt 7 -> palette 2
    np.testing.assert_array_equal(img[0, 1], [255, 0, 0])   # 0 -> gt 0 -> palette 0
    np.testing.assert_array_equal(img[1, 0], [0, 0, 0])     # unmatched
    np.testing.assert_array_equal(img[1, 1], [0, 0, 255])


def test_render_gt_label2img():
    rgbs = np.array([[10, 20, 30], [40, 50, 60]], np.uint8)
    img = render_gt_label2img(np.array([[0, 5]]), rgbs, {"0": 1})
    np.testing.assert_array_equal(img[0, 0], [40, 50, 60])
    np.testing.assert_array_equal(img[0, 1], [0, 0, 0])  # label 5 not in dict


def test_matching_label2img_special_labels():
    rgbs = np.array([[9, 9, 9]], np.uint8)
    img = matching_label2img(np.array([[-1, -2, 0]]), rgbs)
    np.testing.assert_array_equal(img[0, 0], [0, 0, 0])
    np.testing.assert_array_equal(img[0, 1], [255, 255, 255])
    np.testing.assert_array_equal(img[0, 2], [9, 9, 9])


def test_ins2img():
    rgbs = np.array([[1, 1, 1], [2, 2, 2], [3, 3, 3]], np.uint8)
    probs = np.zeros((1, 2, 3))
    probs[0, 0, 1] = 1.0  # label 1
    probs[0, 1, 0] = 1.0  # label 0 -> black
    img = ins2img(probs, rgbs)
    np.testing.assert_array_equal(img[0, 0], [2, 2, 2])
    np.testing.assert_array_equal(img[0, 1], [0, 0, 0])


def test_throughput_meter():
    m = ThroughputMeter()
    m.update(100)
    m.update(100)
    assert m.rays_per_sec > 0
    assert m.ms_per_step > 0
    m.reset()
    assert m._steps == 0


def test_native_load_failure_fallback(tmp_path, monkeypatch):
    """A broken toolchain must not break meshing — numpy fallback engages."""
    from dmnerf_tpu import native
    from dmnerf_tpu.mesh.marching import marching_tetrahedra

    monkeypatch.setitem(native._cached, "_marching_native", None)
    vol = np.zeros((8, 8, 8), np.float32)
    vol[2:6, 2:6, 2:6] = 1.0
    v, f, n = marching_tetrahedra(vol, 0.5)
    assert len(v) > 0 and len(f) > 0


def test_pe_grouped_permutation_identity():
    """positional_encoding_grouped == positional_encoding with channels
    permuted by pe_group_permutation (bit-exact: band products are powers
    of two both ways)."""
    import numpy as np

    from dmnerf_tpu.core.encoding import (pe_group_permutation,
                                          positional_encoding,
                                          positional_encoding_grouped)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(17, 3)).astype(np.float32) * 2
    for multires in (1, 4, 10):
        ref = np.asarray(positional_encoding(x, multires))
        grp = np.asarray(positional_encoding_grouped(x, multires))
        perm = pe_group_permutation(multires)
        np.testing.assert_array_equal(grp, ref[:, perm])
