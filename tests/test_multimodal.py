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


def _make_wav(samples, n_ch=1, rate=16000) -> bytes:
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def test_decode_real_wav_roundtrip():
    import numpy as np

    samples = [0, 1, -1, 32767, -32768, 12345]
    arr = decode_real(_make_wav(samples), "wav")
    assert arr.shape == (6, 1) and arr.dtype == np.dtype("int16")
    assert arr[:, 0].tolist() == samples
    stereo = decode_real(_make_wav([1, 2, 3, 4], n_ch=2), "wav")
    assert stereo.shape == (2, 2) and stereo.tolist() == [[1, 2], [3, 4]]


def test_decode_real_raw_and_unknown():
    assert decode_real(b"\x00\xff", "raw") == b"\x00\xff"
    with pytest.raises(ValueError, match="unknown media format"):
        decode_real(b"\x00", "gif")


def test_decode_real_jpeg_needs_pil():
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present: the optional extra is wired")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_real(b"\x00", "jpeg")


def _make_png(arr, row_filters=None) -> bytes:
    """Test-side stdlib PNG encoder: 8-bit grey/RGB/RGBA, one explicit
    filter type per row so the decoder's five unfilter paths are all
    exercised against ground-truth pixels."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    ch = 1 if arr.ndim == 2 else arr.shape[2]
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = arr.reshape(h, w * ch).astype(np.int16)
    if row_filters is None:
        row_filters = [0] * h
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int16)
    for y in range(h):
        row, ft = flat[y], row_filters[y]
        a = np.zeros_like(row)
        a[ch:] = row[:-ch]
        c = np.zeros_like(row)
        c[ch:] = prev[:-ch]
        if ft == 0:
            enc = row
        elif ft == 1:
            enc = row - a
        elif ft == 2:
            enc = row - prev
        elif ft == 3:
            enc = row - ((a + prev) >> 1)
        elif ft == 4:
            p = a + prev - c
            pa, pb, pc = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
            pred = np.where(
                (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, prev, c)
            )
            enc = row - pred
        raw += bytes([ft]) + (enc & 0xFF).astype(np.uint8).tobytes()
        prev = row

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_decode_real_png_roundtrip_all_filters():
    """The stdlib PNG path decodes ground-truth pixels under every row
    filter type, for grey / RGB / RGBA."""
    import numpy as np

    from esvc_spark.operators.multimodal import _decode_png

    rng = np.random.default_rng(7)
    for shape in ((7, 5), (6, 4, 3), (5, 3, 4)):
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        filters = [y % 5 for y in range(shape[0])]
        out = _decode_png(_make_png(img, filters))
        assert out.shape == img.shape and out.dtype == np.uint8
        assert np.array_equal(out, img), shape
    # decode_real dispatches to the stdlib path when PIL is absent (and
    # to PIL when present — both must return the same pixels)
    img = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    assert np.array_equal(decode_real(_make_png(img), "png"), img)


def test_decode_png_rejects_corruption():
    import numpy as np

    from esvc_spark.operators.multimodal import _decode_png

    good = _make_png(np.zeros((3, 3), dtype=np.uint8))
    bad = bytearray(good)
    bad[40] ^= 0xFF  # flip a byte inside a chunk -> CRC mismatch
    with pytest.raises(ValueError, match="CRC|signature|length"):
        _decode_png(bytes(bad))
    with pytest.raises(ValueError, match="signature"):
        _decode_png(b"JUNK" + good)
    # truncation mid-chunk must raise the documented ValueError family,
    # never struct.error (ADVICE r7): cut inside a chunk header and
    # inside a chunk body
    with pytest.raises(ValueError, match="truncated"):
        _decode_png(good[: len(good) - 6])  # inside IEND's CRC
    with pytest.raises(ValueError, match="truncated"):
        _decode_png(good[:14])  # inside the IHDR chunk header/body


def test_decode_real_png_through_spark_plumbing(spark):
    """Drive the REAL png codec through the same Arrow/mapInPandas batch
    shape the fake-decode stages use (the WAV smoke-test twin): binary
    PNG payloads in, exact per-image pixel stats out."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    rng = np.random.default_rng(11)
    imgs = {
        i: rng.integers(0, 256, size=(3 + i, 2 + i, 3), dtype=np.uint8)
        for i in range(1, 7)
    }
    rows = [
        (i, _make_png(img, [y % 5 for y in range(img.shape[0])]))
        for i, img in imgs.items()
    ]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, payload BINARY"
    ).repartition(2)

    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("n_px", LongType(), False),
            StructField("px_sum", LongType(), False),
        ]
    )

    def stats(batches):
        from esvc_spark.operators.multimodal import decode_real

        for pdf in batches:
            arrs = [decode_real(p, "png") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_px": [a.size for a in arrs],
                    "px_sum": [int(a.sum(dtype="int64")) for a in arrs],
                }
            )

    got = {
        r["doc_id"]: (r["n_px"], r["px_sum"])
        for r in df.mapInPandas(stats, schema).collect()
    }
    want = {
        i: (img.size, int(img.sum(dtype="int64"))) for i, img in imgs.items()
    }
    assert got == want


def test_decode_real_through_spark_plumbing(spark):
    """Drive the REAL wav codec through the same Arrow/mapInPandas batch
    shape the fake-decode stages use: binary payload column in, typed
    per-item stats out."""
    import pandas as pd
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    rows = [
        (i, _make_wav(range(-i, 4 * i + 1, 1), n_ch=1)) for i in range(1, 9)
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, payload BINARY").repartition(2)

    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("n_frames", LongType(), False),
            StructField("n_channels", IntegerType(), False),
            StructField("sample_sum", LongType(), False),
        ]
    )

    def _stage(batches):
        for pdf in batches:
            arrs = [decode_real(bytes(p), "wav") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_frames": [a.shape[0] for a in arrs],
                    "n_channels": [a.shape[1] for a in arrs],
                    "sample_sum": [int(a.sum()) for a in arrs],
                }
            )

    out = {r["doc_id"]: r for r in df.mapInPandas(_stage, schema).collect()}
    assert len(out) == 8
    for i in range(1, 9):
        samples = list(range(-i, 4 * i + 1, 1))
        assert out[i]["n_frames"] == len(samples)
        assert out[i]["n_channels"] == 1
        assert out[i]["sample_sum"] == sum(samples)
