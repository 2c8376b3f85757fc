"""Source/sink coverage: round-trips across formats, partitioned writes
with pruning, bucketed join without exchange, reference text-dir surface."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mapreduce_google_spark.io import (
    load_table,
    read_kv_text_dir,
    read_source,
    read_text_dir,
    write_sink,
    write_text_dir,
)
from mapreduce_google_spark.plans import formatted_plan


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_format_round_trips(spark, sf_dir, tmp_path):
    src = _docs(spark, sf_dir).orderBy("doc_id")
    want = [tuple(r) for r in src.collect()]
    for fmt in ("parquet", "csv", "json", "orc"):
        path = str(tmp_path / fmt)
        write_sink(src, fmt, path)
        got_df = read_source(spark, fmt, path, schema=src.schema)
        got = [tuple(r) for r in got_df.orderBy("doc_id").collect()]
        assert got == want, f"{fmt} round-trip mismatch"


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    path = str(tmp_path / "by_lang")
    write_sink(_docs(spark, sf_dir), "parquet", path, partition_by=["lang"])
    # hive-style layout on disk
    assert any(d.startswith("lang=") for d in os.listdir(path))
    df = read_source(spark, "parquet", path).where(F.col("lang") == "de")
    plan = formatted_plan(df)
    # partition filter must appear as PartitionFilters on the scan, and the
    # scan must select only the matching directory
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters", 1)[1][:200], plan


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Bucketing both join sides on the key removes the shuffle: the
    sort-merge join reads pre-bucketed files directly."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name, df, key in (("b_orders", orders, "o_custkey"), ("b_customer", customer, "c_custkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        # a crashed prior run can leave the location without the catalog entry
        shutil.rmtree(os.path.join(warehouse, name), ignore_errors=True)
        df.write.mode("overwrite").bucketBy(8, key).sortBy(key).saveAsTable(name)
    joined = (
        spark.table("b_orders")
        .join(spark.table("b_customer"), F.col("o_custkey") == F.col("c_custkey"))
        .where(~F.col("o_custkey").isNull())
    )
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert joined.count() == orders.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_text_dir_and_kv_surface(spark, tmp_path):
    d = tmp_path / "txt"
    d.mkdir()
    (d / "a.txt").write_text("k1\tv1\nk2\tv2a\tv2b\n\nnokey\n")
    lines = read_text_dir(spark, str(d))
    assert lines.count() == 4
    kv = {r.key: r.value for r in read_kv_text_dir(spark, str(d)).collect()}
    # key = before FIRST tab; value keeps later tabs; empty line → empty key
    assert kv == {"k1": "v1", "k2": "v2a\tv2b", "": "", "nokey": ""}
    out = tmp_path / "out"
    write_text_dir(lines, str(out), num_files=2)
    parts = [p for p in os.listdir(out) if p.startswith("part-")]
    assert len(parts) == 2
