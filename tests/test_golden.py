"""Golden parity fixtures: fixed-seed expected values for the numerically-
sensitive surfaces (render, full loss stack, gradient probe, AP evaluator),
frozen in tests/golden/golden.npz (VERDICT r1 item 8).

If one of these fails you either made an INTENTIONAL numerical change —
regenerate with `python tests/golden/make_golden.py` and say so in the commit
message — or you silently changed training/eval math. Tolerances are loose
enough for CPU instruction-set jitter, tight enough to catch real drift.
"""

import os

import numpy as np
import pytest

from tests.golden.make_golden import build

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden.npz")


@pytest.fixture(scope="module")
def fresh():
    return build()


@pytest.fixture(scope="module")
def frozen():
    return dict(np.load(GOLDEN))


@pytest.mark.parametrize("key,rtol,atol", [
    ("render_rgb_fine", 1e-5, 1e-6),
    ("render_ins_fine", 1e-5, 1e-6),
    ("render_depth_fine", 1e-5, 1e-6),
    ("step_total_loss", 1e-4, 1e-6),
    ("step_rgb_loss", 1e-4, 1e-6),
    ("step_ins_loss", 1e-4, 1e-6),
    ("step_psnr_fine", 1e-4, 1e-6),
    ("step_psnr_coarse", 1e-4, 1e-6),
    ("step_param_probe", 1e-4, 1e-7),
    ("ap_table", 0, 1e-9),
    ("ap_matched", 0, 0),
])
def test_golden(fresh, frozen, key, rtol, atol):
    np.testing.assert_allclose(fresh[key], frozen[key], rtol=rtol, atol=atol,
                               err_msg=f"golden drift in {key}")
