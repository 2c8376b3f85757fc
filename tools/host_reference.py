"""Same-host bench drift reference (VERDICT r8/r9 discipline, now
structural): re-bench the PREVIOUS round's tip on the CURRENT host right
next to the current tree, so round-over-round bench deltas are
attributable by measurement instead of host-noise inference.

Usage: python tools/host_reference.py [--out BENCH_host_reference_rNN.json]

Finds the previous round's end-of-round commit (the driver's
"round N: verdict/..." commit), checks it out into a throwaway git
worktree, runs its bench.py, runs the current tree's bench.py, and
writes a comparison artifact. Run from round_gate.sh step 4 — on a
quiet host, after the suite, so both runs see the same conditions.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WT = "/tmp/mgs_prev_tip_worktree"


def _run(cmd: list[str], cwd: str = REPO) -> str:
    return subprocess.run(
        cmd, cwd=cwd, capture_output=True, text=True, check=True
    ).stdout


def _bench(cwd: str) -> dict:
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=cwd, capture_output=True, text=True
    )
    for line in out.stdout.splitlines():
        if '"metric"' in line:
            return json.loads(line)
    raise RuntimeError(f"no bench line from {cwd}:\n{out.stdout}\n{out.stderr}")


def _merge_runs(a: dict, b: dict) -> dict:
    """Mean of two bench records (one from each ABBA slot): total value
    and per-query seconds. Means (not min) keep the drift cancellation
    symmetric — each tree gets exactly one hot and one cold slot."""
    qa, qb = a.get("queries", {}), b.get("queries", {})
    return {
        "value": round((a["value"] + b["value"]) / 2, 3),
        "value_slots": [a["value"], b["value"]],
        "queries": {
            q: round((qa[q] + qb[q]) / 2, 3)
            for q in qa
            if q in qb
        },
    }


def main() -> int:
    this_round = 1 + max(
        int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    )
    out_path = os.path.join(REPO, f"BENCH_host_reference_r{this_round}.json")
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    # walk verdict commits newest-first and take the first one from a
    # PRIOR round — if this tool runs after the current round's verdict
    # commit exists, the naive most-recent match would bench the tree
    # against itself (ADVICE r10)
    prev_tip = ""
    for line in _run(
        [
            "git", "rev-list", "--grep", "^round [0-9]*: verdict",
            "--format=%H %s", "--no-commit-header", "HEAD",
        ]
    ).splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+): verdict", subject)
        if m and int(m.group(1)) < this_round:
            prev_tip = sha
            break
    if not prev_tip:
        print("no previous round tip found — skipping", file=sys.stderr)
        return 0
    subprocess.run(
        ["git", "worktree", "remove", "--force", WT],
        cwd=REPO, capture_output=True,
    )
    _run(["git", "worktree", "add", "--detach", WT, prev_tip])
    try:
        # COUNTERBALANCED ABBA order: benching prev-then-current once
        # made the current tree look 10-17% slower on IDENTICAL code —
        # the same tree benched twice back-to-back scores ~+16% on the
        # second run (thermal/cache order effect, measured r11). Two
        # passes in mirrored order cancel linear drift; per-tree result
        # is the mean of its first-slot and second-slot runs.
        prev_a = _bench(WT)
        cur_a = _bench(REPO)
        cur_b = _bench(REPO)
        prev_b = _bench(WT)
        prev = _merge_runs(prev_a, prev_b)
        cur = _merge_runs(cur_a, cur_b)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", WT],
            cwd=REPO, capture_output=True,
        )
    # an older tip's bench.py may predate the per-query field (ADVICE
    # r10) — degrade to totals-only rather than KeyError
    prev_q = prev.get("queries", {})
    cur_q = cur.get("queries", {})
    drift = {
        q: {
            "prev_tip": prev_q.get(q),
            "current": cur_q.get(q),
        }
        for q in sorted(set(prev_q) | set(cur_q))
    }
    artifact = {
        "what": (
            f"same-host drift reference for r{this_round}: the "
            f"r{this_round - 1} tip ({prev_tip[:7]}) re-benched on the "
            f"r{this_round} host back-to-back with the current tree, so "
            "round-over-round totals compare like-with-like"
        ),
        "prev_tip_commit": prev_tip[:7],
        "order": "ABBA (counterbalanced — see tool docstring; r11 found "
        "a ~16% same-tree second-run penalty that a single A,B pass "
        "mis-attributes to the code)",
        "prev_tip_total_on_this_host": prev["value"],
        "prev_tip_slot_values": prev["value_slots"],
        "current_tree_total_on_this_host": cur["value"],
        "current_tree_slot_values": cur["value_slots"],
        "per_query": drift,
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(
        f"prev tip {prev['value']}s vs current {cur['value']}s -> {out_path}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
