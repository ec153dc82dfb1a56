"""Instance loss vs an independent numpy oracle implementing the reference
semantics (evaluator.py:19-74): unique->one-hot slotting, BCE+soft-IoU cost,
rectangular Hungarian via scipy, matched/unmatched terms."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from dmnerf_tpu.losses.instance import build_gt_onehot, cost_matrices, ins_criterion


def oracle(pred, labels, K):
    uniq = np.unique(labels)
    valid = len(uniq)
    gt = np.zeros((len(labels), K), np.float32)
    for slot, lab in enumerate(uniq):
        gt[labels == lab, slot] = 1.0
    ce = np.zeros((K, K), np.float32)
    siou = np.zeros((K, K), np.float32)
    for k in range(K):
        for c in range(K):
            p, g = pred[:, c], gt[:, k]
            ce[k, c] = np.mean(-g * np.log(p + 1e-8) - (1 - g) * np.log(1 - p + 1e-8))
            tp = np.sum(p * g)
            fp = np.sum(p) - tp
            fn = np.sum(g) - tp
            siou[k, c] = 1.0 - tp / (tp + fp + fn + 1e-6)
    cost = (ce + siou)[:valid]
    r, c = linear_sum_assignment(cost)
    valid_ce = ce[r, c].mean()
    valid_siou = siou[r, c].mean()
    unmatched = sorted(set(range(K)) - set(c.tolist()))
    invalid_ce = pred[:, unmatched].mean() if unmatched else 0.0
    return valid_ce + invalid_ce + valid_siou, valid_ce, invalid_ce, valid_siou


def test_build_gt_onehot_slots_by_ascending_label():
    labels = jnp.array([5, 2, 5, 9, 2])
    gt, row_valid, valid = build_gt_onehot(labels, 12)
    gt = np.asarray(gt)
    assert int(valid) == 3
    # ascending present labels: 2 -> slot 0, 5 -> slot 1, 9 -> slot 2
    np.testing.assert_array_equal(gt[:, 0], [0, 1, 0, 0, 1])
    np.testing.assert_array_equal(gt[:, 1], [1, 0, 1, 0, 0])
    np.testing.assert_array_equal(gt[:, 2], [0, 0, 0, 1, 0])
    assert np.asarray(row_valid).sum() == 3


def test_ins_criterion_matches_oracle():
    rng = np.random.default_rng(0)
    N, K = 200, 8
    pred = rng.uniform(0.05, 0.95, (N, K)).astype(np.float32)
    labels = rng.integers(0, 5, N)  # labels 0..4 present (subset of K)
    got = ins_criterion(jnp.asarray(pred), jnp.asarray(labels), K)
    want_total, want_vce, want_ice, want_vsiou = oracle(pred, labels, K)
    np.testing.assert_allclose(float(got.valid_ce), want_vce, rtol=1e-4)
    np.testing.assert_allclose(float(got.invalid_ce), want_ice, rtol=1e-4)
    np.testing.assert_allclose(float(got.valid_siou), want_vsiou, rtol=1e-4)
    np.testing.assert_allclose(float(got.total), want_total, rtol=1e-4)


def test_ins_criterion_all_slots_used():
    rng = np.random.default_rng(1)
    N, K = 100, 4
    pred = rng.uniform(0.05, 0.95, (N, K)).astype(np.float32)
    labels = np.concatenate([np.arange(K), rng.integers(0, K, N - K)])
    got = ins_criterion(jnp.asarray(pred), jnp.asarray(labels), K)
    want_total, _, want_ice, _ = oracle(pred, labels, K)
    assert want_ice == 0.0
    np.testing.assert_allclose(float(got.invalid_ce), 0.0, atol=1e-7)
    # ties/fp32 matmul accumulation allow tiny deviations vs the float-looped oracle
    np.testing.assert_allclose(float(got.total), want_total, rtol=2e-3)


def test_ins_criterion_has_gradient():
    rng = np.random.default_rng(2)
    N, K = 64, 6
    logits = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 4, N))

    def f(lg):
        return ins_criterion(jax.nn.sigmoid(lg), labels, K).total

    g = jax.grad(f)(logits)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_cost_matrices_matmul_form():
    rng = np.random.default_rng(3)
    N, K = 50, 5
    pred = rng.uniform(0.1, 0.9, (N, K)).astype(np.float32)
    labels = rng.integers(0, 3, N)
    gt, _, _ = build_gt_onehot(jnp.asarray(labels), K)
    ce, siou = cost_matrices(jnp.asarray(pred), gt)
    # spot-check one entry against the scalar formula
    k, c = 1, 2
    g = np.asarray(gt)[:, k]
    p = pred[:, c]
    want = np.mean(-g * np.log(p + 1e-8) - (1 - g) * np.log(1 - p + 1e-8))
    # matmul-form accumulates in a different order than the scalar mean
    np.testing.assert_allclose(float(ce[k, c]), want, rtol=1e-3)
