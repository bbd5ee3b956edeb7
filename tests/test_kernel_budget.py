"""Kernel-cost regression guard (scripts/kernel_bench.py --check).

Round 3 shipped a 2.4x q1 kernel-cost regression with no tripwire; this test
is the tripwire. Section costs are measured on a fixed deterministic batch
and compared as RATIOS to an in-process numpy calibration workload, which
cancels this host's 2-3x wall-clock phase swings to first order — a >1.5x
ratio regression is code, not noise.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(REPO, "BENCH", "kernel_baseline.json")


@pytest.mark.skipif(not os.path.exists(BASELINE),
                    reason="no kernel baseline recorded")
def test_kernel_costs_within_budget():
    env = dict(os.environ, MALLOC_MMAP_THRESHOLD_="268435456")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "kernel_bench.py"),
         "--check", "--passes", "3"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
    )
    assert out.returncode == 0, f"{out.stdout}\n{out.stderr}"


def test_baseline_file_shape():
    if not os.path.exists(BASELINE):
        pytest.skip("no kernel baseline recorded")
    with open(BASELINE) as f:
        base = json.load(f)
    sections = [k for k in base if not k.startswith("_")]
    assert len(sections) >= 10  # every registry section is budgeted
    assert all("ratio" in base[k] for k in sections)
