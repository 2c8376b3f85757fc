"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode / feature-extract / resize / frame-sample stages as
Arrow-batched ``mapInPandas`` pipelines.

Decode honesty: this container has no image/audio libraries, so the real
codec step is STUBBED — ``use_fake=False`` raises ``NotImplementedError``
from inside the UDF unless PIL/soundfile exist, and ``use_fake=True``
(default in tests) runs a deterministic fake decoder (dimensions derived
from the content hash). Everything AROUND the codec — binary column
handling, struct metadata schema, Arrow batch iteration, partition-size
control, UDF signatures — is real Spark plumbing and is what carries over
to a cluster with the codec libs installed.

Scale notes: binary payloads ride in parquet as-is (no base64 inflation);
``mapInPandas`` streams Arrow batches so executor memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` × payload size, not by
partition size; repartition before decode to spread payload bytes, not
row counts.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from mapreduce_google_spark.io import load_table

#: metadata carried alongside every blob — the typed half of the column
MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("decoder", StringType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def attach_binary(docs: DataFrame) -> DataFrame:
    """Materialize an opaque binary column + typed metadata struct.

    Here the blob is the UTF-8 encoding of ``text`` (the deterministic
    stand-in this corpus offers); in production it's the raw image/audio
    bytes read by ``spark.read.format('binaryFile')``. The schema —
    ``blob: binary, meta: struct<media_type,n_bytes,sha256>`` — is the
    engine's multimodal column contract either way.
    """
    blob = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        blob.alias("blob"),
        F.struct(
            F.lit("application/fake").alias("media_type"),
            F.octet_length(blob).cast("long").alias("n_bytes"),
            F.sha2(blob, 256).alias("sha256"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake codec: dimensions from the content digest."""
    d = hashlib.sha256(payload).digest()
    return 16 + d[0] % 240, 16 + d[1] % 240, 1 + d[2] % 4


def decode_images(df: DataFrame, use_fake: bool = True) -> DataFrame:
    """Decode stage over (doc_id, blob): Arrow-batched ``mapInPandas``.

    ``use_fake=False`` requires a real codec (PIL) on the executors and
    raises ``NotImplementedError`` otherwise — deliberately inside the UDF
    so the failure surfaces exactly where a cluster would need the
    library.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_fake:
                dims = [_fake_decode(bytes(b)) for b in pdf["blob"]]
                decoder = "fake-sha256"
            else:
                try:
                    from PIL import Image  # noqa: F401
                    import io
                except ImportError as exc:  # pragma: no cover - no PIL here
                    raise NotImplementedError(
                        "real image decode needs PIL on executors; "
                        "install pillow or use use_fake=True"
                    ) from exc
                dims = []
                for b in pdf["blob"]:  # pragma: no cover - no PIL here
                    with Image.open(io.BytesIO(bytes(b))) as im:
                        dims.append((im.width, im.height, len(im.getbands())))
                decoder = "pil"
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                    "decoder": decoder,
                }
            )

    return df.select("doc_id", "blob").mapInPandas(decode, DECODED_SCHEMA)


def extract_features(df: DataFrame, n_bins: int = 16) -> DataFrame:
    """Feature stage: normalized byte-histogram embedding per blob.

    Stands in for a real CNN/audio embedding; the plumbing (Arrow batch
    in, fixed-width float array out) is identical. Deterministic, so
    tests can assert exact values.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["blob"]:
                data = bytes(b)
                hist = [0] * n_bins
                for byte in data:
                    hist[byte * n_bins // 256] += 1
                total = max(len(data), 1)
                feats.append([h / total for h in hist])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return df.select("doc_id", "blob").mapInPandas(featurize, FEATURES_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int, use_fake: bool = True) -> DataFrame:
    """Resize stage: blob → blob, same schema in and out.

    Fake mode passes payloads through and restamps metadata (the honest
    no-codec behavior); real mode needs PIL.
    """
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("blob", df.schema["blob"].dataType),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_fake:
                raise NotImplementedError(
                    "real resize needs PIL on executors; use use_fake=True"
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "blob": pdf["blob"],
                    "width": width,
                    "height": height,
                }
            )

    return df.select("doc_id", "blob").mapInPandas(resize, out_schema)


def sample_frames(df: DataFrame, every_n_bytes: int = 64, use_fake: bool = True) -> DataFrame:
    """Frame-sample stage: one row per sampled "frame" (video analog).

    Fake mode samples every ``every_n_bytes``-th byte as a frame marker —
    exercising the 1-row-in/N-rows-out batch shape real frame extraction
    has.
    """
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_byte", IntegerType()),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_fake:
                raise NotImplementedError(
                    "real frame sampling needs a video codec; use use_fake=True"
                )
            rows: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_byte": []}
            for doc_id, b in zip(pdf["doc_id"], pdf["blob"]):
                data = bytes(b)
                for i, pos in enumerate(range(0, len(data), every_n_bytes)):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_byte"].append(data[pos])
            yield pd.DataFrame(rows)

    return df.select("doc_id", "blob").mapInPandas(sample, out_schema)


def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T30 — binary-column metadata query (oracle-checkable end of the
    multimodal surface): blob size + content hash per document."""
    docs = load_table(spark, sf_dir, "documents")
    with_bin = attach_binary(docs)
    return with_bin.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.sha256").alias("sha256"),
    ).orderBy("doc_id")
