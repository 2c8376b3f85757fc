"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode / feature-extract / resize / frame-sample stages as
Arrow-batched ``mapInPandas`` pipelines.

Codec strategy (``use_fake=False``): PIL when importable on executors
(the fast, full-coverage path), else the pure-stdlib native kernels in
:mod:`.codecs` (PNG/BMP/netpbm pixel decode, GIF/JPEG header decode, WAV
PCM frames) — so real decode WORKS in this library-free container for
those formats; only payloads neither path recognizes raise
``NotImplementedError``, deliberately inside the UDF so the failure
surfaces exactly where a cluster would need the library.
``use_fake=True`` (default in tests) runs a deterministic fake decoder
(dimensions derived from the content hash) for corpus-independent CI.

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
    BinaryType,
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


def _real_decode_dims(payload: bytes) -> tuple[int, int, int, str]:
    """Real header decode: PIL if importable, else the native stdlib
    kernels. Raises NotImplementedError for unrecognized payloads."""
    try:  # pragma: no cover - no PIL in this container
        import io as _io

        from PIL import Image

        with Image.open(_io.BytesIO(payload)) as im:
            return im.width, im.height, len(im.getbands()), "pil"
    except ImportError:
        pass
    from mapreduce_google_spark.operators import codecs

    dims = codecs.parse_image_dims(payload)
    if dims is None:
        raise NotImplementedError(
            f"unrecognized media payload (magic={payload[:4]!r}); native "
            "kernels cover png/jpeg/gif/bmp/pnm — install pillow for more, "
            "or use use_fake=True"
        )
    w, h, c, fmt = dims
    return w, h, c, f"native-{fmt}"


def decode_images(df: DataFrame, use_fake: bool = True) -> DataFrame:
    """Decode stage over (doc_id, blob): Arrow-batched ``mapInPandas``.

    ``use_fake=False`` uses PIL when present, else the pure-stdlib header
    kernels (:func:`codecs.parse_image_dims`); payloads neither recognizes
    raise ``NotImplementedError`` from inside the UDF.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_fake:
                dims = [(*_fake_decode(bytes(b)), "fake-sha256") for b in pdf["blob"]]
            else:
                dims = [_real_decode_dims(bytes(b)) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                    "decoder": [d[3] for d in dims],
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


def _real_resize(payload: bytes, width: int, height: int) -> bytes:
    """Real resize: PIL when importable (any format, proper resampling),
    else native decode → nearest-neighbor → PNG re-encode for the formats
    the stdlib kernels cover."""
    try:  # pragma: no cover - no PIL in this container
        import io as _io

        from PIL import Image

        with Image.open(_io.BytesIO(payload)) as im:
            buf = _io.BytesIO()
            im.resize((width, height)).save(buf, format="PNG")
            return buf.getvalue()
    except ImportError:
        pass
    from mapreduce_google_spark.operators import codecs

    arr = codecs.decode_pixels(payload)
    if arr is None:
        raise NotImplementedError(
            f"unsupported payload for native resize (magic={payload[:4]!r}); "
            "native kernels cover 8-bit png/bmp/pnm — install pillow for "
            "more, or use use_fake=True"
        )
    return codecs.encode_png(codecs.resize_nearest(arr, width, height))


def resize_images(df: DataFrame, width: int, height: int, use_fake: bool = True) -> DataFrame:
    """Resize stage: blob → blob, same schema in and out.

    Fake mode passes payloads through and restamps metadata (deterministic
    CI behavior); real mode resizes via PIL or the native kernels and
    re-encodes (PNG under the native path).
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
            if use_fake:
                blobs = list(pdf["blob"])
            else:
                blobs = [_real_resize(bytes(b), width, height) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "blob": blobs,
                    "width": width,
                    "height": height,
                }
            )

    return df.select("doc_id", "blob").mapInPandas(resize, out_schema)


def sample_frames(df: DataFrame, every_n_bytes: int = 64, use_fake: bool = True) -> DataFrame:
    """Frame-sample stage: one row per sampled "frame" (video/audio
    analog), exercising the 1-row-in/N-rows-out batch shape real frame
    extraction has.

    Fake mode samples every ``every_n_bytes``-th byte as a frame marker.
    Real mode handles WAV PCM natively (every ``every_n_bytes``-th audio
    sample of the first channel, via the stdlib ``wave`` kernel); video
    containers still need a codec (ffmpeg/PyAV) on the executors.
    """
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_byte", IntegerType()),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mapreduce_google_spark.operators import codecs

        for pdf in batches:
            rows: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_byte": []}
            for doc_id, b in zip(pdf["doc_id"], pdf["blob"]):
                data = bytes(b)
                if use_fake:
                    marks = [data[pos] for pos in range(0, len(data), every_n_bytes)]
                elif codecs.sniff_format(data) == "wav":
                    samples = codecs.wav_samples(data)
                    marks = [int(v) for v in samples[::every_n_bytes]]
                else:
                    raise NotImplementedError(
                        "real frame sampling covers WAV natively; video "
                        "needs a codec on executors — use use_fake=True"
                    )
                for i, v in enumerate(marks):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_byte"].append(v)
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


def synthetic_image_blobs(docs: DataFrame) -> DataFrame:
    """(doc_id, blob) — a deterministic tiny image per document, ENCODED
    by the native codec kernels (:mod:`.codecs`), with format and
    dimensions closed-form in ``doc_id``:

    - ``doc_id % 4``: 0 → PNG gray, 1 → PNG RGB, 2 → P6 PPM (RGB),
      3 → P5 PGM (gray)
    - ``width  = 4 + doc_id % 13``, ``height = 3 + doc_id % 7``

    Pixel content is a byte gradient seeded by doc_id, so re-encoding is
    bit-stable. This makes the encode→decode round trip oracle-checkable:
    DuckDB can state the expected (width, height, channels, decoder) from
    doc_id arithmetic alone.
    """
    import numpy as np

    from mapreduce_google_spark.operators import codecs

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("blob", BinaryType()),
        ]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 4 + d % 13, 3 + d % 7
                kind = d % 4
                ch = 3 if kind in (1, 2) else 1
                size = h * w if ch == 1 else h * w * ch
                arr = ((np.arange(size) * 31 + d * 7) % 256).astype(np.uint8)
                arr = arr.reshape((h, w) if ch == 1 else (h, w, ch))
                if kind in (0, 1):
                    blobs.append(codecs.encode_png(arr))
                else:
                    blobs.append(codecs.encode_ppm(arr))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    return docs.select("doc_id").mapInPandas(encode, out_schema)


def image_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T121 — REAL native-codec decode with an oracle: synthesize one
    tiny PNG/PPM per document (:func:`synthetic_image_blobs`), decode
    headers with ``use_fake=False`` (:func:`decode_images` → the stdlib
    kernels in :mod:`.codecs` — PIL is absent in this container, so the
    ``native-*`` path is what runs), and emit the decoded dimensions.

    The oracle states (width, height, channels, decoder) in closed form
    from doc_id — any drift in either the encoders or the header parsers
    breaks the hash. This gives the codec path driver-side evidence
    beyond unit tests (VERDICT r03 item 3).
    """
    docs = load_table(spark, sf_dir, "documents")
    blobs = synthetic_image_blobs(docs)
    return decode_images(blobs, use_fake=False).orderBy("doc_id")


def synthetic_wav_blobs(docs: DataFrame) -> DataFrame:
    """(doc_id, blob) — a deterministic 16-bit mono PCM WAV per document
    (stdlib ``wave`` encoder), closed-form in doc_id:

    - ``n_samples = 32 + doc_id % 97`` at 8 kHz
    - ``sample[i] = (i·13 + doc_id·7) % 256 − 128``

    The audio counterpart of :func:`synthetic_image_blobs`: makes the
    WAV decode → frame-sample path oracle-checkable end to end.
    """
    import io as _io
    import wave

    import numpy as np

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("blob", BinaryType()),
        ]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 32 + d % 97
                samples = ((np.arange(n) * 13 + d * 7) % 256 - 128).astype("<i2")
                buf = _io.BytesIO()
                with wave.open(buf, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(8000)
                    wf.writeframes(samples.tobytes())
                blobs.append(buf.getvalue())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    return docs.select("doc_id").mapInPandas(encode, out_schema)


def wav_frame_stats(spark: SparkSession, sf_dir: str, every_n: int = 4) -> DataFrame:
    """T128 — real WAV decode with an oracle: synthesize one PCM WAV per
    document (:func:`synthetic_wav_blobs`), frame-sample every
    ``every_n``-th sample with ``use_fake=False`` (the stdlib ``wave``
    kernel in :func:`sample_frames`), and aggregate per-document frame
    statistics. Sample values are closed-form in doc_id, so DuckDB
    states the expected (n_frames, sum/min/max) exactly — the audio
    decode path's driver-side evidence, completing what t121 does for
    images.
    """
    docs = load_table(spark, sf_dir, "documents")
    blobs = synthetic_wav_blobs(docs)
    frames = sample_frames(blobs, every_n_bytes=every_n, use_fake=False)
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_frames"),
            F.sum("frame_byte").cast("long").alias("sum_frames"),
            F.min("frame_byte").cast("int").alias("min_frame"),
            F.max("frame_byte").cast("int").alias("max_frame"),
        )
        .orderBy("doc_id")
    )


def image_resize_checksum(
    spark: SparkSession, sf_dir: str, width: int = 4, height: int = 3
) -> DataFrame:
    """T156 — the full native image pipeline with an oracle: synthesize
    (encode), decode pixels, nearest-neighbor resize, and emit per-doc
    pixel checksums — every stage the stdlib kernels implement, chained
    in ONE Arrow batch pass (encode→decode→resize never leaves the
    executor, matching how a real 100 TB media pipeline chains decode +
    transform in one ``mapInPandas`` to avoid re-shuffling blobs).

    The oracle restates the resized pixels in closed form: source pixel
    (y·h//H, x·w//W) of the doc_id-seeded gradient, so any drift in the
    PNG/PPM encoders, the unfilter/decode path, or the resize index
    arithmetic breaks the hash. Uses the codec kernels directly (no
    PIL branch) so the mapping is engine-independent.
    """
    from mapreduce_google_spark.operators import codecs

    docs = load_table(spark, sf_dir, "documents")
    blobs = synthetic_image_blobs(docs)
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("channels", IntegerType()),
            StructField("pixel_sum", LongType()),
            StructField("n_pixels", LongType()),
        ]
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                arr = codecs.decode_pixels(bytes(blob))
                r = codecs.resize_nearest(arr, width, height)
                ch = 1 if r.ndim == 2 else int(r.shape[2])
                rows.append(
                    (
                        int(doc_id),
                        width,
                        height,
                        ch,
                        int(r.astype("int64").sum()),
                        int(r.size),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "channels",
                    "pixel_sum",
                    "n_pixels",
                ],
            )

    return blobs.mapInPandas(stats, out_schema).orderBy("doc_id")


def header_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T185 — header-only decode for the compressed formats the native
    kernels parse but don't pixel-decode: per doc, a deterministic
    minimal GIF (even doc_id) or JPEG SOI+SOF0 (odd doc_id) byte string
    with closed-form dimensions, parsed by
    :func:`~mapreduce_google_spark.operators.codecs.parse_image_dims` —
    the metadata pass a crawl runs before ever decoding pixels, now
    evidenced for all four header families (PNG/PNM via t121, GIF/JPEG
    here).

    Same Arrow plumbing as t121: synthesize and parse inside ONE
    ``mapInPandas`` batch pass; the oracle states (width, height,
    channels, format) from doc_id arithmetic alone.
    """
    import struct as _struct

    from mapreduce_google_spark.operators import codecs

    docs = load_table(spark, sf_dir, "documents")
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("channels", IntegerType()),
            StructField("format", StringType()),
        ]
    )

    def synth_and_parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 16 + d % 31, 9 + d % 17
                if d % 2 == 0:
                    blob = (
                        b"GIF87a"
                        + _struct.pack("<HH", w, h)
                        + b"\x00\x00\x00"
                    )
                else:
                    sof0 = _struct.pack(">HBHHB", 8 + 3, 8, h, w, 3)
                    blob = (
                        b"\xff\xd8"  # SOI
                        + b"\xff\xc0"  # SOF0 marker
                        + sof0
                    )
                parsed = codecs.parse_image_dims(blob)
                pw, ph, ch, fmt = parsed
                rows.append((d, int(pw), int(ph), int(ch), fmt))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "channels", "format"]
            )

    return docs.select("doc_id").mapInPandas(synth_and_parse, out_schema).orderBy(
        "doc_id"
    )
