"""Deterministic sampling / split-assignment operators.

Training-data pipelines need splits that are (a) reproducible across
re-runs, (b) stable as the corpus grows — a document's split must never
depend on which other documents exist — and (c) free of coordination. A
seeded ``df.sample`` fails (b): Spark's sampler is per-partition, so any
repartition or file-layout change reassigns rows. Hashing a stable key
satisfies all three, costs one narrow projection (no shuffle, no state),
and is exactly how the reference assigns work deterministically — its
md5-mod partitioner (reference ``mapreduce/worker/__main__.py:62-65``)
applied to sampling instead of shuffling.

Scale: the split column is a codegen'd expression over the key; the
per-split stats agg shuffles only (split, partial-agg) rows. At 100 TB
this is a pure map-side pass, and the same hash predicate pushes into any
downstream job that wants just one split (``WHERE split = 'train'``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_google_spark.io import load_table

#: split thresholds over a mod-100 hash bucket: 80/10/10
_TRAIN_LT = 80
_VAL_LT = 90


def hash_bucket100(key: Column | str) -> Column:
    """Stable bucket in [0, 100) from the tail of md5(key).

    The low 8 hex digits (32 bits) of the digest, mod 100 — identical
    arithmetic is expressible in any engine with md5 + substr, which is
    what makes the assignment oracle-checkable and portable to the
    feature store / eval harness that consumes the split downstream.
    """
    col = F.col(key) if isinstance(key, str) else key
    tail = F.substring(F.md5(col.cast("string")), 25, 8)
    return F.conv(tail, 16, 10).cast("long") % 100


def split_assign(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Add a ``split`` column: train/val/test at 80/10/10 by hash of key."""
    b = hash_bucket100(key)
    return df.withColumn(
        "split",
        F.when(b < _TRAIN_LT, F.lit("train"))
        .when(b < _VAL_LT, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T51 — deterministic 80/10/10 train/val/test split of ``documents``.

    Returns per-split row count, mean document length, and a membership
    checksum (sum of doc_id) so the oracle comparison catches any
    single-row assignment difference, not just count drift.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        split_assign(docs)
        .groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        )
        .orderBy("split")
    )


SPLIT_STATS_ORACLE = """
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(n_chars), 6) AS avg_chars,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM (
        SELECT doc_id, n_chars,
               CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
            SELECT doc_id, n_chars,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 25, 8))
                        AS BIGINT) % 100 AS bucket
            FROM documents
        )
    )
    GROUP BY split
    ORDER BY split
"""


#: per-language keep rates (percent) — downsample the over-represented
#: language, keep the tails whole; the rebalancing move every multilingual
#: training-mix pipeline makes
STRATUM_RATES = {"en": 20, "de": 100, "es": 100, "fr": 100, "zh": 100}
_DEFAULT_RATE = 50


def stratified_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T57 — deterministic stratified (per-language) downsampling.

    Each document is kept iff its hash bucket falls under its language's
    rate — the per-stratum generalization of T51's split assignment.
    Unlike ``df.sampleBy`` (per-partition RNG: resampling changes with
    file layout), membership depends only on (doc_id, lang), so the
    sample is reproducible across runs, engines, and cluster sizes.

    Scale: pure map-side predicate; no shuffle until the tiny per-lang
    stats agg. The same predicate pushes into any downstream scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    rate = F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(pct))
            for lang, pct in STRATUM_RATES.items()
        ],
        F.lit(_DEFAULT_RATE),
    )
    kept = docs.where(hash_bucket100("doc_id") < rate)
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        )
        .orderBy("lang")
    )


STRATIFIED_SAMPLE_ORACLE = """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM (
        SELECT lang, doc_id,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 25, 8))
                    AS BIGINT) % 100 AS bucket
        FROM documents
    )
    WHERE bucket < CASE lang WHEN 'en' THEN 20
                             WHEN 'de' THEN 100
                             WHEN 'es' THEN 100
                             WHEN 'fr' THEN 100
                             WHEN 'zh' THEN 100
                             ELSE 50 END
    GROUP BY lang
    ORDER BY lang
"""


def mixing_weights(
    spark: SparkSession, sf_dir: str, alpha: float = 0.5
) -> DataFrame:
    """T140 — temperature-scaled source-mixing weights: per (source, lang)
    group, weight ∝ count^alpha (alpha=0.5 → sqrt-scaling, the standard
    down-weighting of huge sources when composing a pretraining mix).

    Determinism: count^0.5 is an IEEE sqrt of an integer (identical in
    any engine); each group's sqrt is quantized to decimal(20,12) so the
    normalizing SUM is order-independent, then one double division per
    group. Scale shape: one map-side-combined hash-agg on (source, lang)
    — group cardinality is tiny — and the normalizer rides back in as a
    broadcast single-row aggregate.
    """
    docs = load_table(spark, sf_dir, "documents")
    grp = docs.groupBy("source", "lang").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    scaled = grp.withColumn(
        "w_dec", F.sqrt(F.col("n_docs").cast("double")).cast("decimal(20,12)")
    )
    total = scaled.groupBy().agg(F.sum("w_dec").alias("w_total"))
    return (
        scaled.crossJoin(F.broadcast(total))
        .select(
            "source",
            "lang",
            "n_docs",
            F.round(
                F.col("w_dec").cast("double") / F.col("w_total").cast("double"), 6
            ).alias("weight"),
        )
        .orderBy("source", "lang")
    )


def weighted_sample_topk(
    spark: SparkSession, sf_dir: str, k: int = 100
) -> DataFrame:
    """T141 — deterministic weighted sampling without replacement
    (Efraimidis–Spirakis): score = u^(1/w) with u a uniform derived from
    md5(doc_id) and w = n_chars; the global top-k by score IS a weighted
    sample, reproducible across re-runs and corpus growth (a doc's score
    never depends on other docs).

    u takes the first 13 hex digits of the digest — 52 bits, exact in a
    double — over 16^13, so both engines compute bit-identical uniforms;
    ranking is on the ROUNDED score with doc_id tiebreak. Scale shape:
    score is a narrow codegen projection; the global top-k is
    TakeOrderedAndProject (per-partition heaps, no full sort).
    """
    docs = load_table(spark, sf_dir, "documents")
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10).cast(
        "double"
    ) / F.lit(float(16**13))
    score = F.round(F.pow(u, F.lit(1.0) / F.col("n_chars").cast("double")), 6)
    return (
        docs.select("doc_id", "n_chars", score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def per_source_sample(
    spark: SparkSession, sf_dir: str, k: int = 5
) -> DataFrame:
    """T146 — deterministic per-group reservoir: k docs per source,
    chosen by ranking each group on md5(doc_id) (a stable uniform
    order). The distributed restatement of per-stratum reservoir
    sampling — a doc's selection depends only on its own hash and its
    group's membership, so re-runs and corpus growth shift the sample
    minimally (one new doc displaces at most one old pick per group).

    Scale shape: one narrow projection + one window partitioned by
    source with a rank cutoff — Spark pushes the k-filter into the
    window via WindowGroupLimit, so each partition keeps a k-row heap
    rather than sorting the group.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("source", "doc_id", F.row_number().over(w).alias("pick"))
        .where(F.col("pick") <= k)
        .select("source", F.col("pick").cast("integer").alias("pick"), "doc_id")
        .orderBy("source", "pick")
    )


def contrastive_pairs(
    spark: SparkSession, sf_dir: str, n_negatives: int = 3, stride: int = 97
) -> DataFrame:
    """T159 — deterministic negative sampling for contrastive training:
    each anchor doc gets ``n_negatives`` negatives drawn from a fixed
    md5 ring — docs ranked by md5(doc_id), negative j = the doc at rank
    (r + j·stride) mod N. Reproducible, coordination-free, and uniform
    over the corpus (the hash ring is a random permutation), with a
    cross-source flag so a hard/easy negative split falls out for free.

    Scale note: the ranking runs over doc METADATA (id, source — bytes
    per doc), not document bodies; like a shard planner it is a
    metadata-sized global window, and the join back to negatives is an
    equi-join on rank.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    w = Window.orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
    ranked = docs.select(
        "doc_id", "source", (F.row_number().over(w) - 1).alias("r")
    )
    n = ranked.groupBy().agg(F.count("*").alias("n"))
    anchors = (
        ranked.crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "source",
            "r",
            "n",
            F.explode(
                F.sequence(F.lit(1), F.lit(n_negatives))
            ).alias("j"),
        )
        .withColumn("neg_r", (F.col("r") + F.col("j") * stride) % F.col("n"))
    )
    negs = ranked.select(
        F.col("r").alias("neg_r"),
        F.col("doc_id").alias("negative_id"),
        F.col("source").alias("neg_source"),
    )
    return (
        anchors.join(negs, "neg_r")
        .select(
            F.col("doc_id").alias("anchor_id"),
            F.col("j").cast("integer").alias("j"),
            "negative_id",
            (F.col("source") != F.col("neg_source")).alias("cross_source"),
        )
        .orderBy("anchor_id", "j")
    )


def shard_planner(
    spark: SparkSession, sf_dir: str, target_chars: int = 30_000
) -> DataFrame:
    """T160 — equal-byte output sharding: assign docs (in doc_id order)
    to shards of ~``target_chars`` by prefix sum — shard = floor of the
    BEFORE-this-doc cumulative size over the target, the first-fit rule
    every corpus exporter uses to produce balanced training shards.

    Runs on doc metadata (id, size), so the global prefix-sum window is
    metadata-sized — the plan a real exporter computes before moving a
    single corpus byte; the assignment then broadcasts/pushes down into
    the body-moving write job. Exact integer arithmetic throughout.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    planned = docs.withColumn(
        "shard",
        F.floor(
            F.coalesce(F.sum("n_chars").over(w), F.lit(0)) / F.lit(target_chars)
        ).cast("long"),
    )
    return (
        planned.groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
        )
        .orderBy("shard")
    )


def split_label_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T202 — split-quality QA: chi-square independence of the
    train/val/test assignment against the embedding labels (documents ⋈
    embeddings on id) — a biased hash split would make label
    distribution depend on split, poisoning eval comparability; a sound
    one shows a small statistic.

    Same exact-decimal chi-square grid as t158 (every (split, label)
    combo contributes its (o−e)²/e term, empty cells included), over
    the deterministic md5 split column.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "label"
    )
    assigned = split_assign(docs.join(emb, "doc_id"))
    cont = assigned.groupBy("split", "label").agg(
        F.count("*").cast("double").alias("o")
    )
    rows = cont.groupBy("split").agg(F.sum("o").alias("rt"))
    cols = cont.groupBy("label").agg(F.sum("o").alias("ct"))
    tot = cont.groupBy().agg(F.sum("o").alias("n"))
    grid = (
        rows.crossJoin(F.broadcast(cols))
        .crossJoin(F.broadcast(tot))
        .join(cont, ["split", "label"], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0.0)))
        .withColumn("e", (F.col("rt") * F.col("ct")) / F.col("n"))
    )
    term = ((F.col("o") - F.col("e")) * (F.col("o") - F.col("e"))) / F.col("e")
    return grid.agg(
        F.countDistinct("split").cast("long").alias("n_splits"),
        F.countDistinct("label").cast("long").alias("n_labels"),
        F.round(F.sum(term.cast("decimal(20,12)")).cast("double"), 6).alias("chi2"),
        ((F.countDistinct("split") - 1) * (F.countDistinct("label") - 1))
        .cast("long")
        .alias("dof"),
    )
