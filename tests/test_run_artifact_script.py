"""Smoke test for scripts/run_artifact_tpu.py (VERDICT r4 #4).

The on-chip run of record lives in docs/SERVING.md (flagship 480p
bundle, bitwise parity, 2026-08-20); this pins the script's drive loop
itself — export → save → load → five-entry round → bitwise compare —
on CPU at tiny dims so a regression in the bundle contract or the
frame-chained gmap min-fusion shows up in the suite, not on the chip.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_run_artifact_tiny_cpu(tmp_path):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_artifact_tpu.py"),
         "--tiny", "--cpu", "--frames", "2", "--rounds", "2",
         "--keep", str(tmp_path / "tiny.ivosx")],
        capture_output=True, text=True, timeout=600, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["metric"] == "ivosx_bundle_round"
    assert rec["platform"] == "cpu"
    assert rec["mask_parity_bitwise"] is True
    assert rec["mask_agreement"] == 1.0
    assert (tmp_path / "tiny.ivosx").exists()
