"""bench.py's emitted `validated_against_n_tests` must match live collection.

The bench JSON records the suite size the numbers were validated against
(round-3 VERDICT: stale counts in README/bench). This test collects the suite
in a subprocess and compares, so the constant cannot silently drift.
"""

import os
import re
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_validated_count_matches_collection():
    sys.path.insert(0, ROOT)
    import bench

    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        capture_output=True, text=True, timeout=600, cwd=ROOT)
    m = re.search(r"(\d+) tests? collected", out.stdout)
    assert m, out.stdout[-2000:] + out.stderr[-1000:]
    assert int(m.group(1)) == bench.VALIDATED_TEST_COUNT, (
        f"suite has {m.group(1)} tests but bench.VALIDATED_TEST_COUNT is "
        f"{bench.VALIDATED_TEST_COUNT} — update the constant (and README)")
