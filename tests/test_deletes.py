"""Deletion vectors (t231): merge-on-read DELETE must touch no data
file, be idempotent, compose across predicates, and compact by
rewriting only the files the sidecar references."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from mapreduce_google_spark.io import apply_deletes, delete_where, read_with_deletes


def _mtimes(path: str) -> dict[str, float]:
    return {
        f: os.path.getmtime(f) for f in glob.glob(os.path.join(path, "*.parquet"))
    }


def _mk(spark, tmp_path, n=1000, files=4) -> str:
    path = str(tmp_path / "t")
    spark.range(n).selectExpr("id AS k", "id % 10 AS g").repartition(
        files
    ).write.parquet(path)
    return path


def test_delete_marks_without_touching_data_files(spark, tmp_path):
    path = _mk(spark, tmp_path)
    before = _mtimes(path)
    n = delete_where(spark, path, F.col("g") == 3)
    assert n == 100
    assert _mtimes(path) == before  # zero data bytes rewritten
    got = read_with_deletes(spark, path)
    assert got.count() == 900
    assert got.where(F.col("g") == 3).count() == 0


def test_delete_is_idempotent_and_composes(spark, tmp_path):
    path = _mk(spark, tmp_path)
    assert delete_where(spark, path, F.col("g") == 3) == 100
    # same predicate again: already-masked rows are not re-marked
    assert delete_where(spark, path, F.col("g") == 3) == 0
    # a second predicate composes (append-only commits)
    assert delete_where(spark, path, F.col("k") < 50) == 45  # 5 of 50 had g=3
    assert read_with_deletes(spark, path).count() == 855


def test_apply_deletes_rewrites_only_affected_files(spark, tmp_path):
    """Compaction drops the masked rows physically, clears the sidecar,
    and leaves files with no deletes byte-untouched."""
    path = _mk(spark, tmp_path)
    # delete rows from ONE file only
    one_file = sorted(glob.glob(os.path.join(path, "*.parquet")))[0]
    doomed = (
        spark.read.parquet(one_file).select("k").limit(10).collect()
    )
    keys = [r["k"] for r in doomed]
    assert delete_where(spark, path, F.col("k").isin(keys)) == 10
    before = _mtimes(path)
    out = apply_deletes(spark, path)
    assert out == {"rewritten_files": 1, "dropped_rows": 10}
    assert not os.path.exists(os.path.join(path, "_deletes"))
    after = _mtimes(path)
    # untouched files keep their bytes; the doomed file is gone
    for f, m in before.items():
        if f == one_file:
            assert f not in after
        else:
            assert after[f] == m
    # content: plain read now equals the masked read pre-compaction
    got = sorted(r["k"] for r in spark.read.parquet(path).collect())
    assert len(got) == 990 and not set(keys) & set(got)
    # further masked reads still work (no sidecar → passthrough)
    assert read_with_deletes(spark, path).count() == 990


def test_oversized_sidecar_skips_broadcast(spark, tmp_path, monkeypatch):
    """Past DV_BROADCAST_MAX_BYTES the reader must drop the broadcast
    hint (shuffled anti-join, no driver-side hash table) and warn toward
    apply_deletes — same rows either way."""
    import warnings

    from mapreduce_google_spark import io as mio

    df = spark.range(0, 100).withColumn("v", F.col("id") * 2)
    path = str(tmp_path / "tbl")
    df.write.parquet(path)
    assert delete_where(spark, path, F.col("id") % 10 == 0) == 10

    small = read_with_deletes(spark, path)
    assert "BroadcastHashJoin" in small._jdf.queryExecution().executedPlan().toString()
    assert small.count() == 90

    monkeypatch.setattr(mio, "DV_BROADCAST_MAX_BYTES", 0)
    # with auto-broadcast off, ONLY the (now dropped) hint could force a
    # broadcast — a shuffled plan here proves the hint is gone, while
    # Spark stays free to auto-pick broadcast for genuinely small sidecars
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            big = read_with_deletes(spark, path)
            assert any("apply_deletes" in str(x.message) for x in w)
        plan = big._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        assert big.count() == 90
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_empty_sidecar_dir_reads_as_no_deletes(spark, tmp_path):
    """A _deletes dir with no parquet files (an append job that died
    after creating the directory) must not brick reads of an intact
    table — spark.read.parquet on it raises UNABLE_TO_INFER_SCHEMA.
    apply_deletes clears the debris (review r12)."""
    path = _mk(spark, tmp_path, n=100, files=2)
    dv_dir = os.path.join(path, "_deletes")
    os.makedirs(dv_dir)
    open(os.path.join(dv_dir, "_SUCCESS"), "w").close()  # committer debris
    assert read_with_deletes(spark, path).count() == 100
    assert apply_deletes(spark, path) == {"rewritten_files": 0, "dropped_rows": 0}
    assert not os.path.exists(dv_dir)


def test_pruned_read_keeps_partition_columns(spark, tmp_path):
    """read_files_with_deletes on a hive-partitioned table: a bare
    leaf-file read does no partition discovery, so the partition column
    silently vanished from the schema (and disagreed with the
    empty-files branch, which has it). basePath restores it
    (review r12)."""
    from mapreduce_google_spark.io import read_files_with_deletes

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "k long, p string, v double"
    ).write.partitionBy("p").parquet(path)
    files = glob.glob(os.path.join(path, "p=a", "*.parquet"))
    got = read_files_with_deletes(spark, path, files)
    assert "p" in got.columns  # partition column survives the leaf read
    assert set(got.columns) == set(
        read_files_with_deletes(spark, path, []).columns
    )  # both branches agree on the schema
    rows = got.collect()
    assert [(r.k, r.p) for r in rows] == [(1, "a")]
    # ...and DV composition still applies on the pruned partitioned read
    delete_where(spark, path, F.col("k") == 1)
    assert read_files_with_deletes(spark, path, files).count() == 0


def test_apply_deletes_ignores_equals_in_parent_dirs(spark, tmp_path):
    """Partition inference must only inspect path segments BELOW the
    table root: a table living under .../v=3/ (the snapshot-store
    layout this module itself suggests composing with) previously made
    'v' a phantom partition column and the compaction write failed
    (review r12)."""
    root = tmp_path / "store" / "v=3"
    root.parent.mkdir()
    path = str(root)
    spark.range(100).selectExpr("id AS k", "id % 10 AS g").repartition(
        2
    ).write.parquet(path)
    delete_where(spark, path, F.col("g") == 3)
    out = apply_deletes(spark, path)
    assert out["dropped_rows"] == 10
    got = spark.read.parquet(path)
    assert got.count() == 90
    assert set(got.columns) == {"k", "g"}  # no phantom 'v' column
