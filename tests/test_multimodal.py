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


def test_decoder_registry_roundtrip(spark, sf_dir):
    """A real decoder is one register_decoder call away: inject a toy
    struct-unpack decoder and round-trip features through the identical
    Arrow/mapInPandas plumbing the stub documents."""

    def toy_decoder(payload: bytes, media_type: str):
        # "format": first byte = frame count, mean over remaining bytes
        if not payload:
            return 0, 0.0
        n_frames = payload[0]
        rest = payload[1:]
        return n_frames, (sum(rest) / len(rest)) if rest else 0.0

    M.register_decoder("toy", toy_decoder)
    try:
        docs = load_table(spark, sf_dir, "documents").limit(20)
        media = M.attach_binary_payload(docs)
        feats = {
            r.doc_id: r
            for r in M.extract_features(media, fake=False, decoder="toy").collect()
        }
        for r in docs.collect():
            payload = r.text.encode("utf-8")
            want_frames, want_mean = toy_decoder(payload, "")
            f = feats[r.doc_id]
            assert f.fake_frames == want_frames
            assert abs(f.fake_mean_byte - want_mean) < 1e-9
            # metadata columns unchanged by the decoder path
            assert f.byte_size == len(payload)
    finally:
        M._DECODERS.pop("toy", None)

    with pytest.raises(KeyError):
        M.get_decoder("not-registered")


def test_sample_frames_partition_payload_at_stride_one(spark, sf_dir):
    """every_nth=1 yields ALL frames: offsets/lengths tile the payload
    exactly (no gaps, no overlap) and the byte sums add up to the whole
    payload's byte sum — the invariant that makes the sampled (every
    4th) catalog entry's arithmetic trustworthy."""
    docs = load_table(spark, sf_dir, "documents").limit(10)
    media = M.attach_binary_payload(docs)
    frames = {}
    for r in M.sample_frames(media, every_nth=1).collect():
        frames.setdefault(r.doc_id, []).append(r)
    for r in docs.collect():
        payload = r.text.encode("utf-8")
        n = len(payload) % 30 + 1
        rows = sorted(frames[r.doc_id], key=lambda x: x.frame_index)
        assert [x.frame_index for x in rows] == list(range(n))
        pos = 0
        for x in rows:
            assert x.frame_offset == pos
            pos += x.frame_len
        assert pos == len(payload)
        assert sum(x.frame_byte_sum for x in rows) == sum(payload)


def test_sample_frames_rejects_bad_stride(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(1)
    with pytest.raises(ValueError):
        M.sample_frames(M.attach_binary_payload(docs), every_nth=0)
