"""Multimodal operator plumbing: pinned schemas, Arrow batch behavior,
deterministic fake decode, and the real-codec stub seam."""

from __future__ import annotations

import hashlib

import pytest

from esvc_spark.operators.multimodal import (
    DECODE_STATS_SCHEMA,
    FEATURE_SUMS_SCHEMA,
    FEATURES_SCHEMA,
    FRAME_SCHEMA,
    decode_real,
    decode_stats,
    extract_feature_sums,
    extract_features,
    frame_sample,
    media_table,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return media_table(spark, SF).cache()


def test_media_schema_and_payload(spark, media):
    row = media.orderBy("doc_id").first()
    assert set(media.columns) == {"doc_id", "payload", "meta"}
    assert isinstance(bytes(row["payload"]), bytes)
    assert row["meta"]["kind"] in ("image", "audio", "video")
    assert row["meta"]["width"] >= 1 and row["meta"]["n_frames"] >= 1


def test_decode_stats_matches_local(spark, media):
    got = {r["doc_id"]: r for r in decode_stats(media).collect()}
    assert decode_stats(media).schema == DECODE_STATS_SCHEMA
    for r in media.limit(20).collect():
        p = bytes(r["payload"])
        g = got[r["doc_id"]]
        assert g["n_bytes"] == len(p)
        assert g["byte_sum"] == sum(p)
        assert g["byte_max"] == (max(p) if p else 0)
        assert g["content_md5"] == hashlib.md5(p).hexdigest()


def test_features_shape_and_determinism(spark, media):
    f = extract_features(media, dim=16)
    assert f.schema == FEATURES_SCHEMA
    a = {r["doc_id"]: (tuple(r["feature"]), r["feat_norm"]) for r in f.collect()}
    b = {r["doc_id"]: (tuple(r["feature"]), r["feat_norm"]) for r in f.collect()}
    assert a == b
    assert all(len(v[0]) == 16 for v in a.values())


def test_feature_sums_are_the_exact_rational_of_features(spark, media):
    """chunk_sum/chunk_len must equal the float chunk-mean feature (the
    integer pair IS the feature, exactly), and the lens partition the
    payload (np.array_split boundaries)."""
    sums = extract_feature_sums(media, dim=16)
    assert sums.schema == FEATURE_SUMS_SCHEMA
    by_doc: dict[int, list] = {}
    for r in sums.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    feats = {r["doc_id"]: list(r["feature"]) for r in extract_features(media, dim=16).collect()}
    for r in media.limit(20).collect():
        p = bytes(r["payload"])
        rows = sorted(by_doc[r["doc_id"]], key=lambda x: x["chunk_idx"])
        assert [x["chunk_idx"] for x in rows] == list(range(16))
        assert sum(x["chunk_len"] for x in rows) == len(p)
        pos = 0
        for x, fv in zip(rows, feats[r["doc_id"]]):
            seg = p[pos : pos + x["chunk_len"]]
            pos += x["chunk_len"]
            assert x["chunk_sum"] == sum(seg)
            mean = x["chunk_sum"] / x["chunk_len"] if x["chunk_len"] else 0.0
            assert abs(mean - fv) < 1e-3  # feature stored as float32


def test_frame_sample_flatmap(spark, media):
    frames = frame_sample(media, every_n=4)
    assert frames.schema == FRAME_SCHEMA
    vids = {r["doc_id"]: r for r in media.filter("meta.kind = 'video'").collect()}
    out = frames.collect()
    assert out and all(r["doc_id"] in vids for r in out)
    # spot-check one doc's frame slicing against local byte math
    doc_id = out[0]["doc_id"]
    payload = bytes(vids[doc_id]["payload"])
    n = vids[doc_id]["meta"]["n_frames"]
    size = max(len(payload) // n, 1)
    for r in [r for r in out if r["doc_id"] == doc_id]:
        i = r["frame_idx"]
        expect = payload[i * size : (i + 1) * size]
        assert bytes(r["frame"]) == expect
        assert r["frame_md5"] == hashlib.md5(expect).hexdigest()


def test_decode_real_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_real(b"\x00", "png")
