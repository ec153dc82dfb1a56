"""tools/stress_drill.py parsing helpers (the drill itself needs the TPU;
these cover the stdout/table scraping that feeds REPRODUCE.md rows)."""

import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

from stress_drill import demo_ms_per_view, results_table  # noqa: E402


def test_demo_ms_excludes_compile_view():
    out = ("[MANI] resolved GT label 5 -> instance channel 9 (3/3 votes)\n"
           "[DEMO 0] 9.8s\n[DEMO 1] 4.4s\n[DEMO 2] 4.7s\n[DEMO 3] 4.8s\n"
           "Manipulating Demo Done ./logs/x\n")
    ms = demo_ms_per_view(out)
    assert abs(ms - 1e3 * np.mean([4.4, 4.7, 4.8])) < 1e-6


def test_demo_ms_needs_two_views():
    assert demo_ms_per_view("[DEMO 0] 9.8s\n") is None
    assert demo_ms_per_view("no demo lines at all") is None


def test_results_table_picks_latest_mean_row(tmp_path):
    ldir = tmp_path / "scene" / "drill"
    for step, psnr in (("010000", 11.0), ("050001", 28.6)):
        d = ldir / f"render_test_{step}"
        d.mkdir(parents=True)
        rows = np.array([[psnr - 1, 0.9, 0.1, 0.9, 0.8, 0.8, 0.7, 0.5, 0.3],
                         [psnr + 1, 0.9, 0.1, 0.9, 0.8, 0.8, 0.7, 0.5, 0.3],
                         [psnr, 0.95, 0.1, 0.94, 0.86, 0.84, 0.8, 0.56, 0.4]])
        np.savetxt(d / "test_results.txt", rows)
    got = results_table(str(ldir), "render_test_")
    assert got[0] == 28.6 and got[1] == 0.95  # latest dir, last (mean) row
    assert results_table(str(ldir), "mani_eval_") is None
