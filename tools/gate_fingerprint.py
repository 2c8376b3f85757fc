#!/usr/bin/env python
"""Source fingerprint for the round gate (VERDICT r12 item 2).

r12 shipped a red suite because `io.py` was edited AFTER
`tools/round_gate.sh` ran and before the end-of-round snapshot commit —
nothing tied "pytest was green" to "on THIS tree". This tool makes that
binding checkable:

* ``python tools/gate_fingerprint.py`` — print a JSON line with the
  WORKTREE source fingerprint: sha256 over ``{path} {git-blob-sha1}``
  lines of every behavior-relevant file (package/tests/tools ``*.py``,
  ``bench.py``, ``__spark_entry__.py``), computed from file CONTENTS so
  uncommitted edits count.
* ``--commit X`` — same fingerprint for a COMMIT's tree (via
  ``git ls-tree`` blob ids; git blob ids are content hashes, so the two
  modes agree whenever contents agree).
* ``--assert`` — recompute the worktree fingerprint and compare with the
  one recorded in ``ROUND_GATE.json``; exit 1 naming the first differing
  file if any source changed since the gate ran. Run this as the FINAL
  act before the snapshot commit.

``tools/round_gate.sh`` writes ``ROUND_GATE.json`` as its last step;
``tests/test_round_gate_contract.py`` asserts every COMMITTED artifact
matches the tree of the commit that introduced it, so a post-gate edit
that ships turns the next suite run red.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: directories whose ``*.py`` files, plus the two root files, decide
#: whether "pytest green" is a statement about the shipped tree
SOURCE_DIRS = ("mapreduce_google_spark", "tests", "tools")
SOURCE_FILES = ("bench.py", "__spark_entry__.py")


def _blob_sha1(data: bytes) -> str:
    """git's content address for a blob — lets the worktree mode agree
    byte-for-byte with ``git ls-tree`` in the commit mode."""
    return hashlib.sha1(b"blob %d\x00" % len(data) + data).hexdigest()


def _is_source(path: str) -> bool:
    if path in SOURCE_FILES:
        return True
    return path.endswith(".py") and any(
        path.startswith(d + "/") for d in SOURCE_DIRS
    )


def worktree_entries(repo: str = REPO) -> list[tuple[str, str]]:
    entries: list[tuple[str, str]] = []
    for rel in SOURCE_FILES:
        full = os.path.join(repo, rel)
        if os.path.isfile(full):
            with open(full, "rb") as fh:
                entries.append((rel, _blob_sha1(fh.read())))
    for d in SOURCE_DIRS:
        for root, dirs, files in os.walk(os.path.join(repo, d)):
            dirs[:] = [x for x in dirs if x != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, repo)
                with open(full, "rb") as fh:
                    entries.append((rel, _blob_sha1(fh.read())))
    return sorted(entries)


def commit_entries(commit: str, repo: str = REPO) -> list[tuple[str, str]]:
    out = subprocess.run(
        ["git", "ls-tree", "-r", commit, "--", *SOURCE_DIRS, *SOURCE_FILES],
        cwd=repo,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    entries = []
    for line in out.splitlines():
        meta, path = line.split("\t", 1)
        blob = meta.split()[2]
        if _is_source(path):
            entries.append((path, blob))
    return sorted(entries)


def fingerprint(entries: list[tuple[str, str]]) -> str:
    h = hashlib.sha256()
    for path, blob in entries:
        h.update(f"{path} {blob}\n".encode())
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--commit", help="fingerprint this commit instead of the worktree")
    ap.add_argument(
        "--assert",
        dest="check",
        action="store_true",
        help="compare worktree against ROUND_GATE.json; exit 1 on drift",
    )
    ap.add_argument(
        "--suite-ran",
        action="store_true",
        help=(
            "record that the full pytest suite ran green on this tree — "
            "ONLY round_gate.sh passes this (it runs pytest first); a "
            "receipt written mid-round certifies fingerprint consistency "
            "only"
        ),
    )
    args = ap.parse_args()

    if args.check:
        gate_path = os.path.join(REPO, "ROUND_GATE.json")
        try:
            with open(gate_path) as fh:
                gate = json.load(fh)
        except (OSError, ValueError) as e:
            print(f"GATE DRIFT: cannot read ROUND_GATE.json: {e}")
            return 1
        now = worktree_entries()
        fp = fingerprint(now)
        if fp == gate.get("source_fingerprint"):
            print(f"gate OK: worktree matches gated fingerprint {fp[:12]}")
            return 0
        then = {p: b for p, b in gate.get("source_entries", [])}
        cur = dict(now)
        changed = sorted(
            set(then) ^ set(cur)
            | {p for p in set(then) & set(cur) if then[p] != cur[p]}
        )
        print(
            "GATE DRIFT: source changed since the round gate ran — re-run "
            f"tools/round_gate.sh. Differing files: {changed[:10]}"
        )
        return 1

    entries = (
        commit_entries(args.commit) if args.commit else worktree_entries()
    )
    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=REPO, capture_output=True, text=True
    ).stdout.strip()
    print(
        json.dumps(
            {
                "source_fingerprint": fingerprint(entries),
                "n_files": len(entries),
                "head_at_gate": head,
                "suite_ran": bool(args.suite_ran),
                "source_entries": entries,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
