"""The round-gate receipt contract (VERDICT r12 item 2).

r12 shipped a red suite because source was edited AFTER
``tools/round_gate.sh`` ran and the snapshot committed both. The gate
now writes ``ROUND_GATE.json`` — the source fingerprint pytest was
green ON — as its final step, and this module makes a receipt that
disagrees with its own commit's tree a test failure, so the hole cannot
reopen silently.

No Spark session needed — pure git/hashing, runs in milliseconds.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from gate_fingerprint import (  # noqa: E402
    commit_entries,
    fingerprint,
    worktree_entries,
)


def _git(*args: str, cwd: str = REPO) -> str:
    return subprocess.run(
        ["git", *args], cwd=cwd, capture_output=True, text=True, check=True
    ).stdout


def test_worktree_and_commit_modes_agree_and_detect_drift(tmp_path):
    """The two fingerprint modes are the SAME content hash (git blob
    ids), so 'worktree at gate time' vs 'tree of the snapshot commit'
    is a well-defined equality — and one edited byte breaks it."""
    repo = str(tmp_path / "r")
    os.makedirs(os.path.join(repo, "tools"))
    os.makedirs(os.path.join(repo, "mapreduce_google_spark"))
    with open(os.path.join(repo, "bench.py"), "w") as fh:
        fh.write("x = 1\n")
    with open(os.path.join(repo, "mapreduce_google_spark", "a.py"), "w") as fh:
        fh.write("y = 2\n")
    subprocess.run(["git", "init", "-q"], cwd=repo, check=True)
    _git("add", "-A", cwd=repo)
    _git(
        "-c",
        "user.email=t@t",
        "-c",
        "user.name=t",
        "commit",
        "-qm",
        "snapshot",
        cwd=repo,
    )
    wt = fingerprint(worktree_entries(repo))
    ct = fingerprint(commit_entries("HEAD", repo))
    assert wt == ct
    with open(os.path.join(repo, "mapreduce_google_spark", "a.py"), "w") as fh:
        fh.write("y = 3  # post-gate edit\n")
    assert fingerprint(worktree_entries(repo)) != ct, (
        "a post-gate source edit must change the worktree fingerprint"
    )


def test_committed_receipt_matches_its_own_commits_tree():
    """THE ratchet: for the most recent commit that touched
    ``ROUND_GATE.json``, the receipt's fingerprint must equal the
    fingerprint of THAT commit's source tree. An r12-style post-gate
    edit committed alongside (or after) a stale receipt turns this red
    on the next suite run."""
    try:
        commit = _git(
            "log", "-1", "--format=%H", "--", "ROUND_GATE.json"
        ).strip()
    except (subprocess.CalledProcessError, OSError):
        pytest.skip("not a git checkout")
    if not commit:
        pytest.skip("no committed ROUND_GATE.json yet (receipt lands r13)")
    receipt = json.loads(_git("show", f"{commit}:ROUND_GATE.json"))
    tree_fp = fingerprint(commit_entries(commit))
    assert receipt["source_fingerprint"] == tree_fp, (
        f"commit {commit[:12]} ships a ROUND_GATE.json receipt that does "
        "not match its own source tree — source was edited after the "
        "round gate ran; re-run tools/round_gate.sh before committing"
    )


def test_gate_script_writes_and_asserts_receipt():
    """The receipt steps stay wired into the gate script."""
    with open(os.path.join(REPO, "tools", "round_gate.sh")) as fh:
        gate = fh.read()
    assert "gate_fingerprint.py --suite-ran > ROUND_GATE.json" in gate
    assert "gate_fingerprint.py --assert" in gate
    # pytest runs unpiped (a pipe would mask its exit status — the r12
    # gotcha that let a red test commit through)
    assert "python -m pytest tests/ -q\n" in gate
