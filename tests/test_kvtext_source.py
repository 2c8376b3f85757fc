"""The Spark-4 Python DataSource speaking the reference's kv-text
format: TAB contract (first tab only, empty keys legal — reference
worker/__main__.py:183, test_worker_08), per-file partitions."""

from __future__ import annotations

import os


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text, encoding="utf-8")
    return str(p)


def test_kvtext_tab_contract(spark, tmp_path):
    from mapreduce_google_spark.kvtext import read_kvtext

    _write(tmp_path, "part-00000", "a\t1\n\t2\nplain line\nk\tv\twith\ttabs\n")
    rows = read_kvtext(spark, str(tmp_path)).collect()
    got = [(r.key, r.value) for r in rows]
    assert ("a", "1") in got
    assert ("", "2") in got  # empty key is DATA (reference golden file)
    assert ("plain line", "") in got  # no tab → whole line is the key
    assert ("k", "v\twith\ttabs") in got  # split on FIRST tab only


def test_kvtext_one_partition_per_file(spark, tmp_path):
    from mapreduce_google_spark.kvtext import read_kvtext

    for i in range(3):
        _write(tmp_path, f"part-{i:05d}", f"k{i}\t{i}\n")
    df = read_kvtext(spark, str(tmp_path))
    assert df.rdd.getNumPartitions() == 3  # reference: one map task per file
    assert df.count() == 3


def test_kvtext_skips_hidden_and_success_files(spark, tmp_path):
    from mapreduce_google_spark.kvtext import read_kvtext

    _write(tmp_path, "part-00000", "a\t1\n")
    _write(tmp_path, "_SUCCESS", "")
    _write(tmp_path, ".hidden", "junk\tx\n")
    assert read_kvtext(spark, str(tmp_path)).count() == 1


def test_kvtext_writer_round_trip(spark, tmp_path):
    from mapreduce_google_spark.kvtext import read_kvtext, write_kvtext

    df = spark.createDataFrame(
        [("alpha", "1"), ("beta", "2"), ("", "empty-key"), ("g", "")],
        "key string, value string",
    )
    out = str(tmp_path / "kv_out")
    write_kvtext(df, out)
    files = sorted(p.name for p in (tmp_path / "kv_out").iterdir())
    assert all(f.startswith("part-") for f in files), files
    back = read_kvtext(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_kvtext_writer_overwrite_replaces(spark, tmp_path):
    from mapreduce_google_spark.kvtext import read_kvtext, write_kvtext

    out = str(tmp_path / "kv_out2")
    write_kvtext(
        spark.createDataFrame([("x", "1")], "key string, value string"), out
    )
    write_kvtext(
        spark.createDataFrame([("y", "2")], "key string, value string"), out
    )
    assert [tuple(r) for r in read_kvtext(spark, out).collect()] == [("y", "2")]


def test_kvtext_writer_under_hidden_dir(spark, tmp_path):
    # Regression: final names are built from the basename only — a
    # hidden directory component (".cache") must survive the rename.
    from mapreduce_google_spark.kvtext import read_kvtext, write_kvtext

    out = str(tmp_path / ".cache" / "kv_out")
    write_kvtext(
        spark.createDataFrame([("h", "1")], "key string, value string"), out
    )
    assert [tuple(r) for r in read_kvtext(spark, out).collect()] == [("h", "1")]


def test_kvtext_writer_value_tabs_round_trip(spark, tmp_path):
    # Values may contain tabs (reader splits on FIRST tab only).
    from mapreduce_google_spark.kvtext import read_kvtext, write_kvtext

    df = spark.createDataFrame(
        [("k", "v\twith\ttabs")], "key string, value string"
    )
    out = str(tmp_path / "kv_tabs")
    write_kvtext(df, out)
    assert [tuple(r) for r in read_kvtext(spark, out).collect()] == [
        ("k", "v\twith\ttabs")
    ]


def test_kvtext_writer_rejects_unrepresentable(spark, tmp_path):
    # Tab-in-key and newlines cannot be represented by the line format:
    # the writer raises instead of silently corrupting records.
    import pytest
    from mapreduce_google_spark.kvtext import write_kvtext

    for rows in ([("bad\tkey", "v")], [("k", "bad\nvalue")], [("bad\nkey", "v")]):
        df = spark.createDataFrame(rows, "key string, value string")
        with pytest.raises(Exception, match="kvtext"):
            write_kvtext(df, str(tmp_path / "kv_bad"))


def test_kvtext_commit_sweep_is_job_scoped(spark, tmp_path):
    """Commit sweeps only THIS job's tmp files (job token in the name):
    a concurrent job's in-flight tmp file must survive another job's
    commit, while the committing job's own zombie-attempt files are
    removed. Foreign strays are dot-prefixed so readers ignore them."""
    from mapreduce_google_spark.kvtext import (
        _KVTextWriter,
        read_kvtext,
        write_kvtext,
    )

    out = tmp_path / "kv_sweep"
    out.mkdir()
    # in-flight tmp of a DIFFERENT job (different token) — must survive
    foreign = out / ".part-00000-a7-deadbeef0000.tmp"
    foreign.write_text("other\t0\n", encoding="utf-8")
    write_kvtext(
        spark.createDataFrame([("w", "1")], "key string, value string"),
        str(out),
    )
    assert foreign.exists(), "commit deleted a concurrent job's tmp file"
    # readers ignore dot-prefixed strays
    assert [tuple(r) for r in read_kvtext(spark, str(out)).collect()] == [
        ("w", "1")
    ]
    # no tmp litter from the committed job itself
    own_tmp = [f for f in out.iterdir() if f.suffix == ".tmp" and f != foreign]
    assert own_tmp == []

    # own zombie-attempt file (same token) is swept on commit AND abort
    w = _KVTextWriter({"path": str(out)}, overwrite=False)
    zombie = out / f".part-00001-a999-{w.job_token}.tmp"
    zombie.write_text("zombie\t0\n", encoding="utf-8")
    w.commit([])
    assert not zombie.exists() and foreign.exists()
    zombie.write_text("zombie\t0\n", encoding="utf-8")
    w.abort([None])
    assert not zombie.exists() and foreign.exists()


def test_kvtext_stream_incremental_consumption(spark, tmp_path):
    """Streaming read of a kvtext dir: first drain consumes the files
    present; after new files arrive, a restart from the same checkpoint
    consumes ONLY the delta (offset = consumed file-name set)."""
    from mapreduce_google_spark.kvtext import read_kvtext_stream

    src = tmp_path / "kv_src"
    src.mkdir()
    _write(src, "part-00000", "a\t1\n")
    _write(src, "part-00001", "b\t2\n")
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            read_kvtext_stream(spark, str(src))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    first = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert first == [("a", "1"), ("b", "2")]

    _write(src, "part-00002", "c\t3\n")
    drain()
    second = sorted(map(tuple, spark.read.parquet(out).collect()))
    # append sink: only the delta file's rows were added
    assert second == [("a", "1"), ("b", "2"), ("c", "3")]


def test_kvtext_stream_replay_is_deterministic(tmp_path):
    # unit-level: readBetweenOffsets(start, end) must return exactly the
    # rows of end-start regardless of later arrivals (recovery replay)
    from mapreduce_google_spark.kvtext import _KVTextStreamReader

    _write(tmp_path, "part-00000", "a\t1\n")
    _write(tmp_path, "part-00001", "b\t2\n")
    r = _KVTextStreamReader({"path": str(tmp_path)})
    start = r.initialOffset()
    rows, end = r.read(start)
    assert sorted(rows) == [("a", "1"), ("b", "2")]
    # a file arriving AFTER the batch was planned must not leak into the
    # replay of that batch
    _write(tmp_path, "part-00002", "c\t3\n")
    assert sorted(r.readBetweenOffsets(start, end)) == [("a", "1"), ("b", "2")]
    rows2, end2 = r.read(end)
    assert sorted(rows2) == [("c", "3")]
    assert sorted(r.readBetweenOffsets(end, end2)) == [("c", "3")]
