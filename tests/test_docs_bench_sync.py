"""Docs <-> bench-artifact sync gate (round-4 verdict ask #2).

README.md's performance table and docs/DESIGN.md's headline block are
GENERATED from one named bench artifact by tools/render_bench.py; this test
re-renders from the source named in the markers and fails on any numeric
disagreement — the round-3/4 failure mode (hand-edited perf numbers drifting
from the driver-captured JSON) is now structurally impossible while this
test is green.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_docs_match_bench_artifact():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "render_bench.py"), "--check"],
        capture_output=True, text=True, cwd=REPO,
    )
    assert proc.returncode == 0, f"docs drifted from the bench artifact:\n{proc.stdout}{proc.stderr}"


def test_render_refuses_unparsed_driver_artifact(tmp_path):
    """A driver BENCH_r*.json with parsed=null (truncated tail) must be
    rejected loudly, not rendered as garbage."""
    import json

    bad = tmp_path / "BENCH_rXX.json"
    bad.write_text(json.dumps({"n": 4, "rc": 0, "tail": "...", "parsed": None}))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "render_bench.py"), str(bad)],
        capture_output=True, text=True, cwd=REPO,
    )
    assert proc.returncode != 0
    assert "parsed=null" in proc.stderr + proc.stdout
