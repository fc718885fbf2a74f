"""Multi-row-group parallel-scaling regression guard (round 17,
VERDICT r16 #4).

Every driver testdata parquet file is one row group, so scan stages —
and the trainer histogram passes fused into them — run as ONE task at
any core count; the sf0.1 bench cannot demonstrate parallel scaling.
This test converts the r16 prose finding into a guarded demonstration:
it drives tools/rowgroup_scale.py in two subprocesses (local[8] /
local[32]) against a replicated lineitem written BOTH as 32 files and
as one file, and asserts

  1. the histograms over both layouts are bit-identical at both core
     counts (partition invariance of the fold), and
  2. at 32 cores the multi-split layout beats the single-file layout
     by >= 1.8x (min over reps — the layout, not the cores, is what
     unlocks the scan parallelism).

Measured r17 (this box): single-file 4.6-5.2 s at BOTH 8 and 32 cores
(cores don't help one task); multi-file warm 0.9-1.3 s at 32c /
1.3-1.7 s at 8c — a 3.4-4.5x layout effect. The keyed
repartition(cpus, "feat", "val") fan-out variant (VERDICT r16 #5)
stays a REGRESSION under real parallelism (1.2-1.8 s vs 0.9-1.3 s at
32c) — asserted nowhere, recorded in OPTIMIZATION_r17.md as the
closing negative.

Gated behind SPARK_GRAFT_SCALE_TESTS=1 (~3-4 min: two spark
subprocesses + a one-time ~30 MB rewrite under /tmp).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE_TESTS") != "1",
    reason="scale exercise; run with SPARK_GRAFT_SCALE_TESTS=1",
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RG_DIR = "/tmp/rg_scale_lineitem_test"


def _run(cpus: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["RG_DIR"] = RG_DIR
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "rowgroup_scale.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_multi_rowgroup_layout_unlocks_scan_parallelism():
    shutil.rmtree(RG_DIR, ignore_errors=True)
    try:
        r32 = _run(32)
        r8 = _run(8)
        assert r32["match_single_file"] and r8["match_single_file"]
        assert r32["cells"] == r8["cells"]
        ratio = min(r32["hist_single_secs"]) / min(r32["hist_multi_secs"])
        assert ratio >= 1.8, (
            f"multi-split layout should beat single-file >=1.8x at 32 "
            f"cores, got {ratio:.2f}x ({r32})"
        )
    finally:
        shutil.rmtree(RG_DIR, ignore_errors=True)
