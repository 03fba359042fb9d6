"""Round-artifact tracking guard.

The driver drops ``CORRECTNESS_r{N}.json`` / ``BENCH_r{N}.json`` at the
repo root each round, and the coverage rotation
(``plans/__init__.py``) reads the COMMITTED union of CORRECTNESS files
to float unverified/stale names first. Rounds 7 and 8 both left the
latest pair untracked (the judge's recurring one-command ask), which
burns the next round's 50-name sample budget re-checking old names.
This test makes the miss loud: every round artifact present on disk
must be known to git.
"""

from __future__ import annotations

import glob
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_round_artifacts_are_git_tracked():
    on_disk = sorted(
        os.path.basename(p)
        for pat in ("CORRECTNESS_r*.json", "BENCH_r*.json")
        for p in glob.glob(os.path.join(REPO, pat))
    )
    assert on_disk, "no round artifacts found — wrong repo root?"
    tracked = set(
        subprocess.run(
            ["git", "ls-files", "CORRECTNESS_r*.json", "BENCH_r*.json"],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.split()
    )
    untracked = [f for f in on_disk if f not in tracked]
    assert not untracked, (
        f"round artifacts {untracked} exist on disk but are not "
        "git-tracked — `git add` them so the coverage rotation and the "
        "judge see this round's results"
    )
