"""Property-based DML-sequence fuzzing: a random interleaving of the
three lakehouse verbs — partition-scoped MERGE upsert, deletion-vector
DELETE, and compaction — applied to a partitioned parquet table must
leave exactly the state a plain Python model of the same sequence
predicts.

The deterministic tests (test_upsert/test_deletes) prove each verb in
isolation; this fuzz proves their INTERACTIONS — the class of bug found
in r8 where an upsert read the base without applying deletion vectors
and resurrected DV-deleted rows into the rewritten partition.

Keys live in a fixed home partition (PARTS[k % 3]) so the reference
model is a plain dict; cross-partition key moves are a separate,
guarded code path (test_upsert.test_moved_key_guard).

Determinism: derandomize=True replays the same sequence corpus every
run (the test_property_fuzz settings).

A second fuzz (test_point_index_matches_model_through_dml) runs the
FLAT-table verb set — file append, DV delete, compaction — interleaved
with indexed point lookups, proving the secondary index composes with
every DML interleaving (VERDICT r8 item 6).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mapreduce_google_spark.io import (
    apply_deletes,
    delete_where,
    partition_upsert,
    read_with_deletes,
)

PARTS = ["a", "b", "c"]
KEYS = list(range(1, 13))  # 12 keys spread over 3 home partitions


def _home(k: int) -> str:
    return PARTS[k % 3]


#: one DML op: ("upsert", [(k, v), ...]) — k goes to its home partition;
#: ("delete", k_mod, residue) — DV-mark every live row with k % mod ==
#: residue; ("compact",) — apply_deletes, a visible-state no-op.
_upsert_rows = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(100, 999)),
    min_size=1,
    max_size=4,
    unique_by=lambda r: r[0],  # one row per key inside a delta
)
_op = st.one_of(
    st.tuples(st.just("upsert"), _upsert_rows),
    st.tuples(st.just("delete"), st.sampled_from([2, 3, 5]), st.integers(0, 2)),
    st.tuples(st.just("compact")),
)


@given(ops=st.lists(_op, min_size=1, max_size=5))
@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
def test_dml_sequence_matches_model(spark, tmp_path_factory, ops):
    path = str(tmp_path_factory.mktemp("dml") / "tbl")
    base = [(k, _home(k), float(k)) for k in KEYS]
    spark.createDataFrame(base, "k long, p string, v double").repartition(
        "p"
    ).write.partitionBy("p").parquet(path)
    #: reference model: {k: v} for live rows (partition is implied by k)
    state = {k: v for k, _, v in base}

    for op in ops:
        if op[0] == "upsert":
            rows = [(k, _home(k), float(v)) for k, v in op[1]]
            delta = spark.createDataFrame(rows, "k long, p string, v double")
            partition_upsert(
                spark, path, delta, "p", ["k"], check_moved_keys=True
            )
            for k, _, v in rows:
                state[k] = v  # replaced if live, re-inserted if deleted
        elif op[0] == "delete":
            _, mod, residue = op
            delete_where(spark, path, F.col("k") % mod == residue)
            for k in [k for k in state if k % mod == residue]:
                del state[k]
        else:
            apply_deletes(spark, path)

    got = {
        r["k"]: (r["p"], r["v"])
        for r in read_with_deletes(spark, path).collect()
    }
    assert got == {k: (_home(k), v) for k, v in state.items()}, f"ops={ops}"


#: flat-table fuzz ops (the point index refuses hive layouts by design —
#: scale.refresh_point_index — so its interaction surface is the
#: FLAT-table DML triad: file append, DV delete, compaction), each
#: followed by an indexed lookup verb that must match the model.
_append_rows = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(100, 999)),
    min_size=1,
    max_size=3,
)
_flat_op = st.one_of(
    st.tuples(st.just("append"), _append_rows),
    st.tuples(st.just("delete"), st.sampled_from([2, 3, 5]), st.integers(0, 2)),
    st.tuples(st.just("compact")),
    st.tuples(
        st.just("lookup"),
        st.lists(st.sampled_from(KEYS), min_size=1, max_size=3, unique=True),
    ),
)


@given(ops=st.lists(_flat_op, min_size=2, max_size=6))
@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
def test_point_index_matches_model_through_dml(spark, tmp_path_factory, ops):
    """VERDICT r8 item 6: the point index is the most interaction-prone
    surface after the DML triad itself — refresh-after-delete/compact,
    vanished-file postings, DV composition through the lookup path. Every
    random interleaving of append / DV-delete / compact must leave
    point_lookup agreeing with a plain Python multiset model (appends of
    an existing key legitimately duplicate it — a flat table has no merge
    semantics, so the model tracks {k: [v, ...]})."""
    from mapreduce_google_spark.operators.scale import (
        point_lookup,
        refresh_point_index,
    )

    path = str(tmp_path_factory.mktemp("idxfuzz") / "tbl")
    base = [(k, float(k)) for k in KEYS]
    spark.createDataFrame(base, "k long, v double").repartition(4, "k").write.parquet(
        path
    )
    state: dict[int, list[float]] = {k: [v] for k, v in base}

    def _check(probe: list[int]) -> None:
        import glob as _glob
        import os as _os

        import pytest

        if not _glob.glob(_os.path.join(path, "*.parquet")):
            # every data file compacted away — the index must refuse
            # clearly, and the model agrees the table is empty
            assert not any(state.values())
            with pytest.raises(ValueError, match="no parquet files"):
                refresh_point_index(spark, path, "k")
            return
        got = sorted(
            (r["k"], r["v"]) for r in point_lookup(spark, path, "k", probe).collect()
        )
        want = sorted((k, v) for k in probe for v in state.get(k, []))
        assert got == want, f"probe={probe} ops={ops}"
        # same probe through the DataFrame/semi-join path: it shares the
        # index but not the filter/DV plumbing (the r11 DV-composition
        # bug lived exactly in the gap this closes), so both paths fuzz
        # through every DML interleaving
        from mapreduce_google_spark.operators.scale import point_lookup_df

        probes_df = spark.createDataFrame([(k,) for k in probe], "probe long")
        got_df = sorted(
            (r["k"], r["v"])
            for r in point_lookup_df(spark, path, "k", probes_df).collect()
        )
        assert got_df == want, f"df-path probe={probe} ops={ops}"

    for op in ops:
        if op[0] == "append":
            rows = [(k, float(v)) for k, v in op[1]]
            spark.createDataFrame(rows, "k long, v double").coalesce(
                1
            ).write.mode("append").parquet(path)
            for k, v in rows:
                state.setdefault(k, []).append(v)
        elif op[0] == "delete":
            _, mod, residue = op
            delete_where(spark, path, F.col("k") % mod == residue)
            for k in list(state):
                if k % mod == residue:
                    state[k] = []
        elif op[0] == "compact":
            apply_deletes(spark, path)
        else:
            _check(op[1])
    _check(KEYS)


def test_upsert_does_not_resurrect_dv_deleted_rows(spark, tmp_path):
    """The r8 regression pinned directly: DV-delete a row, then upsert a
    DIFFERENT key in the same partition — the deleted row must stay
    deleted (the merge must read the carried-over base through the
    sidecar, io.py partition_upsert)."""
    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)],
        "k long, p string, v double",
    ).repartition("p").write.partitionBy("p").parquet(path)
    assert delete_where(spark, path, F.col("k") == 1) == 1
    delta = spark.createDataFrame([(2, "a", 99.0)], "k long, p string, v double")
    partition_upsert(spark, path, delta, "p", ["k"])
    got = sorted(
        (r["k"], r["p"], r["v"]) for r in read_with_deletes(spark, path).collect()
    )
    assert got == [(2, "a", 99.0), (3, "b", 3.0)]


@given(ops=st.lists(_flat_op, min_size=3, max_size=6))
@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
def test_point_index_matches_model_with_tight_compaction_budget(
    spark, tmp_path_factory, monkeypatch, ops
):
    """The LSM variant of the index fuzz: with INDEX_COMPACT_SEGMENTS
    tightened to 2, almost every second append crosses the compaction
    boundary, so random interleavings exercise append-segment creation,
    budget-triggered merges, AND vanished-file forced compactions in one
    sequence — the three refresh paths the deterministic tests prove in
    isolation."""
    from mapreduce_google_spark.operators import scale
    from mapreduce_google_spark.operators.scale import point_lookup

    monkeypatch.setattr(scale, "INDEX_COMPACT_SEGMENTS", 2)

    path = str(tmp_path_factory.mktemp("lsmfuzz") / "tbl")
    base = [(k, float(k)) for k in KEYS]
    spark.createDataFrame(base, "k long, v double").repartition(4, "k").write.parquet(
        path
    )
    state: dict[int, list[float]] = {k: [v] for k, v in base}
    for op in ops:
        if op[0] == "append":
            rows = [(k, float(v)) for k, v in op[1]]
            spark.createDataFrame(rows, "k long, v double").coalesce(
                1
            ).write.mode("append").parquet(path)
            for k, v in rows:
                state.setdefault(k, []).append(v)
        elif op[0] == "delete":
            _, mod, residue = op
            delete_where(spark, path, F.col("k") % mod == residue)
            for k in list(state):
                if k % mod == residue:
                    state[k] = []
        elif op[0] == "compact":
            apply_deletes(spark, path)
        else:
            probe = op[1]
            got = sorted(
                (r["k"], r["v"])
                for r in point_lookup(spark, path, "k", probe).collect()
            )
            want = sorted((k, v) for k in probe for v in state.get(k, []))
            assert got == want, f"probe={probe} ops={ops}"
    got = sorted(
        (r["k"], r["v"]) for r in point_lookup(spark, path, "k", KEYS).collect()
    )
    want = sorted((k, v) for k in KEYS for v in state.get(k, []))
    assert got == want
