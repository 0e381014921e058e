"""Multimodal plumbing: binary column synthesis, mapInPandas metadata
decode, Arrow-batched feature extraction, and the explicit decode stub."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from database_migrator_spark.operators.multimodal import (
    attach_fake_image,
    decode_image_metadata,
    decode_image_pixels,
    extract_image_features,
)
from database_migrator_spark.sources import table

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return table(spark, SF_SMOKE, "documents").limit(50).cache()


def test_attach_and_decode_metadata(spark, docs):
    images = attach_fake_image(docs)
    assert dict(images.dtypes)["image"] == "binary"
    meta = decode_image_metadata(images)
    rows = meta.collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert 1 <= r.width <= 1920 and 1 <= r.height <= 1080
        assert r.fmt == "RGB8"
        assert r.payload_bytes > 0
    # payload length must equal the source text's UTF-8 byte length
    joined = meta.join(docs, "doc_id").where(
        F.col("payload_bytes") != F.octet_length(F.encode("text", "UTF-8"))
    )
    assert joined.count() == 0


def test_feature_extraction_batch_shape(spark, docs):
    feats = extract_image_features(attach_fake_image(docs))
    rows = feats.collect()
    assert len(rows) == docs.count()
    assert all(0.0 <= r.mean_byte <= 255.0 for r in rows)


def test_frame_sampling_fanout(spark, docs):
    from database_migrator_spark.operators.multimodal import sample_frames

    frames = sample_frames(attach_fake_image(docs), every_n=2)
    rows = frames.collect()
    assert len(rows) > docs.count()  # 1→N fan-out
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, fs in by_doc.items():
        idxs = sorted(f.frame_idx for f in fs)
        assert idxs == list(range(0, 2 * len(idxs), 2))  # every 2nd frame
        assert all(len(bytes(f.frame_bytes)) <= 64 for f in fs)


def test_decode_pixels_is_explicit_stub(spark, docs):
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_image_pixels(attach_fake_image(docs))
