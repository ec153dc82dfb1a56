"""Two-process jax.distributed CPU dryrun (tools/dryrun_two_proc.py).

Certifies nothing in the train dispatch assumes one process before the
framework is pointed at a multi-host slice (SURVEY.md §5 DCN note): 2
processes x 4 virtual CPU devices, global-mesh inputs, Gloo collectives,
identical loss on both ranks. Marked slow: ~2 min of subprocess compile on
this one-core box.
"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_dryrun():
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "dryrun_two_proc.py")],
        capture_output=True, text=True, timeout=900, env=env, cwd=ROOT)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "two_proc_dryrun PARENT: ok" in out.stdout
    # both ranks computed, and agreed on, the same global loss
    losses = {ln.split("loss=")[1].split()[0]
              for ln in out.stdout.splitlines() if "ok loss=" in ln}
    assert len(losses) == 1, out.stdout
