"""Multimodal plumbing: real schema/batching, stubbed codec."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from tv_event_streaming_spark.domain import load_table
from tv_event_streaming_spark.operators import multimodal as M


def test_fake_features_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = M.attach_binary_payload(docs)
    feats = {r.doc_id: r for r in M.extract_features(media, fake=True).collect()}
    for r in docs.collect():
        payload = r.text.encode("utf-8")
        f = feats[r.doc_id]
        assert f.byte_size == len(payload)
        assert f.checksum == hashlib.md5(payload).hexdigest()
        assert f.fake_frames == len(payload) % 30 + 1
        assert abs(f.fake_mean_byte - sum(payload) / len(payload)) < 1e-9


def test_decode_stub_raises(spark, sf_dir):
    with pytest.raises(NotImplementedError):
        M.decode_stub(b"bytes", "image")
    docs = load_table(spark, sf_dir, "documents").limit(2)
    media = M.attach_binary_payload(docs)
    from py4j.protocol import Py4JJavaError  # noqa: PLC0415

    with pytest.raises(Exception):  # surfaces through the UDF boundary
        M.extract_features(media, fake=False).collect()


def test_media_type_partitioning(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    meta = M.media_metadata(M.attach_binary_payload(docs))
    counts = {r.media_type: r["count"] for r in meta.groupBy("media_type").count().collect()}
    assert set(counts) == {"image", "audio", "video"}
