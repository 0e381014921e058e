"""Multimodal columns: images/audio/video as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched pandas functions over
``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is stubbed
(`NotImplementedError` behind an import-try, plus a deterministic fake for
tests) — but the Spark-side plumbing is real: schemas, binary columns,
Arrow batch shapes, partition-preserving mapInPandas, and a hash-matched
binary-column query (q36). At 100 TB the blobs live in parquet binary
columns (or object-store pointers) and the decode UDF is the only part
that changes.

Fake blob format (deterministic, self-describing):
    b"IMG|<width>|<height>|<fmt>|" + payload bytes
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_migrator_spark.plans.registry import query
from database_migrator_spark.sources import table

try:  # pragma: no cover - not present in this container
    from PIL import Image  # type: ignore  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

IMAGE_META_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, fmt string, payload_bytes bigint"
)
IMAGE_FEATURE_SCHEMA = "doc_id bigint, mean_byte double, n_bytes bigint"


def attach_fake_image(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Synthesize a deterministic binary 'image' column from the text (the
    real pipeline would read parquet binary directly). Pure JVM expressions.
    Repartitions first: blob processing is CPU-bound per row and the
    single-file test table would otherwise run on one core."""
    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    width = (F.abs(F.xxhash64(id_col)) % 1920 + 1).cast("long")
    height = (F.abs(F.xxhash64(F.col(id_col) + 1)) % 1080 + 1).cast("long")
    header = F.concat_ws(
        "|", F.lit("IMG"), width.cast("string"), height.cast("string"), F.lit("RGB8"), F.lit("")
    )
    blob = F.concat(F.encode(header, "UTF-8"), F.encode(F.col(text_col), "UTF-8"))
    return docs.select(F.col(id_col), blob.alias("image"))


def decode_image_metadata(images: DataFrame) -> DataFrame:
    """Parse blob headers into typed metadata via mapInPandas (Arrow batch
    in / Arrow batch out, partition-preserving — no shuffle)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["image"]):
                b = bytes(blob)
                magic, w, h, fmt, payload = b.split(b"|", 4)
                assert magic == b"IMG"
                out.append((doc_id, int(w), int(h), fmt.decode(), len(payload)))
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "fmt", "payload_bytes"]
            )

    return images.mapInPandas(parse, schema=IMAGE_META_SCHEMA)


def decode_image_pixels(images: DataFrame) -> DataFrame:  # pragma: no cover
    """Real pixel decode — requires an image codec, absent here by design."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decoding requires Pillow, which is not available in this "
            "environment; the Arrow plumbing is exercised via "
            "decode_image_metadata/extract_image_features instead"
        )
    raise NotImplementedError("PIL decode path not implemented in this round")


def extract_image_features(images: DataFrame) -> DataFrame:
    """Deterministic fake feature extraction (mean payload byte) standing in
    for an embedding model — demonstrates the Arrow batch shape a real
    encoder UDF would use (one vector per row, vectorized over the batch)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["image"]):
                payload = bytes(blob).split(b"|", 4)[4]
                mean = float(sum(payload)) / len(payload) if payload else 0.0
                rows.append((doc_id, mean, len(payload)))
            yield pd.DataFrame(rows, columns=["doc_id", "mean_byte", "n_bytes"])

    return images.mapInPandas(feats, schema=IMAGE_FEATURE_SCHEMA)


VIDEO_FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, frame_bytes binary"


def sample_frames(videos: DataFrame, every_n: int = 10, id_col: str = "doc_id",
                  blob_col: str = "image") -> DataFrame:
    """Frame sampling over opaque 'video' blobs via mapInPandas: emit every
    ``every_n``-th fixed-size chunk as a 'frame'. A real decoder (ffmpeg /
    pyav) is absent in this container, so frames are deterministic byte
    slices — the Spark plumbing (1→N row fan-out inside an Arrow batch,
    binary columns both directions, partition-preserving) is exactly what
    a real sampler uses."""
    frame_size = 64

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob)
                n_frames = max(1, len(b) // frame_size)
                for i in range(0, n_frames, every_n):
                    out.append((doc_id, i, b[i * frame_size : (i + 1) * frame_size]))
            yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "frame_bytes"])

    return videos.mapInPandas(sample, schema=VIDEO_FRAME_SCHEMA)


@query(
    "q36_binary_columns",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           md5(text)                                        AS digest
    FROM documents
    ORDER BY doc_id
    """,
    tags=("multimodal", "binary"),
)
def q36_binary_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary handling hash-matched across engines: byte length and
    md5 digest of the UTF-8 blob."""
    d = table(spark, sf_dir, "documents")
    blob = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(blob).cast("long").alias("n_bytes"),
        F.md5(blob).alias("digest"),
    ).orderBy("doc_id")


@query(
    "q37_image_metadata",
    oracle=None,  # mapInPandas plumbing — rows-only check; full assertions
    # in tests/test_multimodal.py
    tags=("multimodal", "mapInPandas"),
)
def q37_image_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return decode_image_metadata(attach_fake_image(d)).orderBy("doc_id")
