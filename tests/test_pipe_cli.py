"""Exec-surface tests: the pipe operator's partitioning parity and the
CLI's reference-style job end-to-end on a text directory."""

from __future__ import annotations

import os
import subprocess
import sys

from mapreduce_google_spark.operators.pipe import ASSETS, md5_partition


def test_md5_partition_matches_reference_semantics():
    import hashlib

    for key in ["the", "", "spark", "Ünïcôde"]:
        for n in (1, 4, 8):
            assert md5_partition(key, n) == int(
                hashlib.md5(key.encode()).hexdigest(), 16
            ) % n


def test_cli_exec_job(tmp_path):
    """Full reference job shape: text dir in, part-* files out, word counts
    correct — driven through the CLI in a fresh process."""
    input_dir = tmp_path / "input"
    input_dir.mkdir()
    (input_dir / "a.txt").write_text("Hello world\nhello Spark\n")
    (input_dir / "b.txt").write_text("world world\n")
    out_dir = tmp_path / "out"

    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    res = subprocess.run(
        [
            sys.executable,
            "-m",
            "mapreduce_google_spark.cli",
            "exec",
            "--input",
            str(input_dir),
            "--output",
            str(out_dir),
            "--mapper",
            f"{sys.executable} {ASSETS}/wc_mapper.py",
            "--reducer",
            f"{sys.executable} {ASSETS}/wc_reducer.py",
            "--num-reducers",
            "2",
        ],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    parts = sorted(p for p in os.listdir(out_dir) if p.startswith("part-"))
    assert parts, f"no part files in {out_dir}"
    lines = []
    for p in parts:
        with open(out_dir / p) as f:
            lines += [ln.rstrip("\n") for ln in f if ln.strip()]
    counts = dict(ln.split("\t") for ln in lines)
    assert counts == {"hello": "2", "world": "3", "spark": "1"}
