"""PSNR / SSIM / instance AP."""

import numpy as np

from dmnerf_tpu.eval.instance_ap import calculate_ap, ins_eval
from dmnerf_tpu.eval.metrics import psnr, ssim


def test_psnr_known_value():
    a = np.zeros((8, 8, 3))
    b = np.full((8, 8, 3), 0.1)
    np.testing.assert_allclose(psnr(a, b), 10 * np.log10(1 / 0.01), rtol=1e-6)


def test_ssim_identity_and_range():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (32, 32, 3))
    assert abs(ssim(img, img) - 1.0) < 1e-9
    noisy = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1)
    s = ssim(img, noisy)
    assert 0.0 < s < 0.9
    # more noise -> lower ssim
    noisier = np.clip(img + rng.normal(0, 0.5, img.shape), 0, 1)
    assert ssim(img, noisier) < s


def test_ssim_constant_shift():
    img = np.full((16, 16), 0.5)
    shifted = np.full((16, 16), 0.6)
    s = ssim(img, shifted)
    # luminance term: (2*0.5*0.6 + C1)/(0.25+0.36+C1)
    C1 = (0.01) ** 2
    expect = (2 * 0.5 * 0.6 + C1) / (0.5 ** 2 + 0.6 ** 2 + C1)
    np.testing.assert_allclose(s, expect, rtol=1e-6)


def test_calculate_ap_perfect():
    ious = np.array([0.96, 0.97, 0.99])
    ap = calculate_ap(ious, 3, confidence=np.array([0.9, 0.8, 0.7]))
    assert ap == [1.0] * 6


def test_calculate_ap_half():
    # 2 objects above 0.5 only; gt_number=4
    ious = np.array([0.6, 0.55, 0.3, 0.2])
    ap = calculate_ap(ious, 4, confidence=np.array([0.9, 0.8, 0.7, 0.6]))
    assert ap[0] == 0.5      # AP50: 2/4 recall with perfect precision prefix
    assert ap[5] == 0.0      # AP95: none


def test_calculate_ap_confidence_order_matters():
    ious = np.array([0.3, 0.9])
    # high-confidence wrong detection first -> precision hit
    ap_bad = calculate_ap(ious, 2, confidence=np.array([0.9, 0.1]))
    ap_good = calculate_ap(ious, 2, confidence=np.array([0.1, 0.9]))
    assert ap_good[0] > ap_bad[0]


def test_ins_eval_perfect_prediction():
    rng = np.random.default_rng(0)
    H = W = 16
    K = 6
    gt = rng.integers(0, 4, (H, W))
    pred = np.zeros((H, W, K), np.float32) + 0.01
    for lab in range(4):
        pred[gt == lab, lab] = 0.99
    pred_label, ap, matched = ins_eval(pred, gt, K)
    np.testing.assert_array_equal(pred_label, gt)
    assert ap == [1.0] * 6
    # matched order follows ascending gt uniques
    np.testing.assert_array_equal(matched, [0, 1, 2, 3])


def test_ins_eval_permuted_labels():
    """Predicted slot ids are a permutation of gt ids — AP must still be 1."""
    rng = np.random.default_rng(1)
    H = W = 16
    K = 6
    gt = rng.integers(0, 4, (H, W))
    perm = np.array([3, 2, 5, 0])  # gt label l -> pred channel perm[l]
    pred = np.zeros((H, W, K), np.float32) + 0.01
    for lab in range(4):
        pred[gt == lab, perm[lab]] = 0.99
    _, ap, matched = ins_eval(pred, gt, K)
    assert ap == [1.0] * 6
    np.testing.assert_array_equal(matched, perm)


def test_ins_eval_with_mask():
    rng = np.random.default_rng(2)
    H = W = 12
    K = 5
    ins_num = K
    gt = rng.integers(0, 3, (H, W))
    mask = np.zeros((H, W))
    mask[2:10, 2:10] = 1
    gt_masked = gt.copy()
    pred = np.zeros((H, W, K), np.float32) + 0.01
    for lab in range(3):
        pred[gt == lab, lab] = 0.99
    _, ap, _ = ins_eval(pred, gt_masked, ins_num, mask=mask)
    assert all(a > 0.0 for a in ap[:1])


def test_ins_eval_zero_gt_instances():
    """A view with no labeled GT instances returns the reference fallback
    (tester.py:106-118): pred_label=-1, AP=1.0 — no divide-by-zero."""
    import numpy as np
    from dmnerf_tpu.eval.instance_ap import ins_eval

    K = 4
    pred_ins = np.random.default_rng(0).uniform(size=(8, 8, K)).astype(np.float32)
    gt = np.full((8, 8), K, np.int64)       # everything "air"/unlabeled
    mask = np.ones((8, 8), np.int64)
    pred_label, ap, matched = ins_eval(pred_ins, gt, K, mask=mask)
    assert np.all(pred_label == -1)
    assert np.allclose(ap, 1.0)
    assert matched.size == 0
