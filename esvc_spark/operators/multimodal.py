"""Multimodal columns: image/audio/video as opaque BINARY payloads with a
typed metadata struct, processed by Arrow-batched `mapInPandas` stages.

The container has no image/audio codecs, so the *decode* step is stubbed
two ways (clearly marked):
  * `decode_real` raises NotImplementedError unless PIL is importable —
    the seam where a real codec plugs in;
  * `decode_stats` / `extract_features` / `frame_sample` run a
    deterministic byte-level fake decode (exact integer math over payload
    bytes), so the Spark-side plumbing — pinned schemas, Arrow batch
    shapes, partition parallelism — is real and testable, and byte math
    doubles as a DuckDB oracle (ASCII text payloads: byte == codepoint).

Scale design: every stage is mapInPandas over the payload partition — no
shuffle is introduced by decoding; only the downstream aggregate shuffles
its (small) stats rows. Payload bytes never pass through the driver. At
100 TB the media table would be bucketed by doc_id so repeated
feature-extraction passes co-locate with their metadata joins.
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
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("payload", BinaryType(), False),
        StructField(
            "meta",
            StructType(
                [
                    StructField("kind", StringType(), False),
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("sample_rate", IntegerType(), True),
                    StructField("n_frames", IntegerType(), True),
                    StructField("fmt", StringType(), True),
                ]
            ),
            False,
        ),
    ]
)

# kind assignment: deterministic 3-way split by doc_id
_KINDS = ["image", "audio", "video"]


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic media table derived from `documents`:
    payload = utf-8 text bytes, kind mapped from source, dims from
    n_chars. Stands in for a real (payload, meta) ingest; every value is
    reproducible in SQL for oracle checks."""
    from ..catalog import table as T

    # mapInPandas stages pay a Python-worker spin-up per partition; for a
    # corpus this size fewer, larger Arrow batches win (measured 10x at
    # sf0.1). On a real cluster the source's own splits set the partition
    # count and workers amortize over long-lived executors.
    par = min(8, spark.sparkContext.defaultParallelism)
    docs = T(spark, sf_dir, "documents").repartition(par, "doc_id")
    kind = F.element_at(F.array(*[F.lit(k) for k in _KINDS]), (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            kind.alias("kind"),
            (F.col("n_chars") % 640 + 1).cast("int").alias("width"),
            (F.col("n_chars") % 480 + 1).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.col("n_chars") % 24 + 1).cast("int").alias("n_frames"),
            F.lit("raw").alias("fmt"),
        ).alias("meta"),
    )


# colour type -> samples per pixel (8-bit depth only; palette needs a
# PLTE lookup and stays behind PIL)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _decode_png(payload: bytes):
    """Stdlib PNG decoder (zlib inflate + per-row unfilter) for the
    fixture subset: 8-bit depth, grey/RGB/grey+alpha/RGBA, no
    interlace. All five row filters (None/Sub/Up/Average/Paeth) are
    implemented and CRCs are verified. Returns a uint8 array of shape
    (h, w) for greyscale or (h, w, channels) otherwise — the same shape
    contract as PIL's ``np.asarray(Image.open(...))``, so the two
    backends are interchangeable downstream. Per-pixel Python loops are
    fine here: the decoder exists to make the codec seam REAL for the
    synthetic fixtures; a production image pipeline swaps in PIL/OpenCV
    via the same ``decode_real`` dispatch."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, idat = 8, None, b""
    while pos < len(payload):
        # bounds-check BEFORE unpacking: a payload truncated mid-chunk
        # must raise the documented ValueError family, not struct.error
        # (callers and tests only anticipate ValueError — ADVICE r7)
        if pos + 8 > len(payload):
            raise ValueError("truncated PNG: chunk header cut short")
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        if pos + 12 + length > len(payload):
            raise ValueError("truncated PNG: chunk body cut short")
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r}: CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG without IHDR")
    width, height, depth, ctype_n, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError(
            "stdlib PNG path is 8-bit non-interlaced only; install the "
            "optional 'pillow' extra for the full format"
        )
    if ctype_n not in _PNG_CHANNELS:
        raise NotImplementedError(
            "palette PNG needs PIL (optional 'pillow' extra)"
        )
    ch = _PNG_CHANNELS[ctype_n]
    raw = zlib.decompress(idat)
    stride = width * ch
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG scanline data has wrong length")
    out = bytearray()
    prev = bytearray(stride)
    rpos = 0
    for _y in range(height):
        ft = raw[rpos]
        row = bytearray(raw[rpos + 1 : rpos + 1 + stride])
        rpos += 1 + stride
        if ft == 1:  # Sub
            for i in range(ch, stride):
                row[i] = (row[i] + row[i - ch]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                row[i] = (row[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                row[i] = (
                    row[i]
                    + (a if pa <= pb and pa <= pc else b if pb <= pc else c)
                ) & 0xFF
        elif ft != 0:
            raise ValueError(f"PNG filter type {ft} is invalid")
        out += row
        prev = row
    arr = np.frombuffer(bytes(out), dtype=np.uint8)
    return arr.reshape(height, width) if ch == 1 else arr.reshape(
        height, width, ch
    )


def decode_real(payload: bytes, fmt: str):
    """Real-codec seam, dispatching on `meta.fmt`:

    - ``"wav"``  — decoded with the stdlib ``wave`` codec (always
      available): returns an int16 numpy array of shape
      (n_frames, n_channels). A REAL decode path, smoke-tested in
      tests/test_multimodal.py by round-tripping synthesized PCM.
    - ``"png"`` — PIL when present; otherwise the stdlib decoder
      ``_decode_png`` (zlib + unfilter, round 7) covering the 8-bit
      non-interlaced subset the fixtures use — a REAL end-to-end codec
      path in this container, smoke-tested through mapInPandas the same
      way WAV is.
    - ``"jpeg"`` — PIL-backed behind an optional extra; raises
      NotImplementedError when PIL is absent (entropy coding is not a
      reasonable stdlib re-implementation).
    - ``"raw"`` — passthrough: returns the payload bytes unchanged
      (the synthetic-corpus contract; every oracle-checked query uses
      this format).

    Unknown formats raise ValueError so a misrouted payload fails loudly
    instead of being silently treated as raw bytes.
    """
    import numpy as np

    if fmt == "raw":
        return payload
    if fmt == "wav":
        import io
        import wave

        with wave.open(io.BytesIO(payload), "rb") as w:
            n_ch = w.getnchannels()
            if w.getsampwidth() != 2:
                raise NotImplementedError("only 16-bit PCM WAV is wired")
            frames = w.readframes(w.getnframes())
        return np.frombuffer(frames, dtype="<i2").reshape(-1, n_ch)
    if fmt in ("png", "jpeg", "jpg"):
        try:
            from PIL import Image
        except ImportError as e:
            if fmt == "png":
                return _decode_png(payload)
            raise NotImplementedError(
                "jpeg decode requires PIL (install the optional "
                "'pillow' extra); not available in this environment"
            ) from e
        import io  # pragma: no cover - optional extra

        return np.asarray(Image.open(io.BytesIO(payload)))
    raise ValueError(f"unknown media format {fmt!r}")


DECODE_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("byte_sum", LongType(), False),
        StructField("byte_max", IntegerType(), False),
        StructField("content_md5", StringType(), False),
    ]
)


def decode_stats(media: DataFrame) -> DataFrame:
    """Fake-decode each payload to per-item stats via Arrow-batched
    mapInPandas (exact integer byte math; md5 content address). The real
    pipeline would emit pixel/sample tensors here instead."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "kind": [m["kind"] for m in pdf["meta"]],
                    "n_bytes": [len(p) for p in payloads],
                    "byte_sum": [
                        int(np.frombuffer(p, dtype=np.uint8).astype("int64").sum())
                        if len(p)
                        else 0
                        for p in payloads
                    ],
                    "byte_max": [
                        int(np.frombuffer(p, dtype=np.uint8).max()) if len(p) else 0
                        for p in payloads
                    ],
                    "content_md5": [hashlib.md5(p).hexdigest() for p in payloads],
                }
            )
            out["n_bytes"] = out["n_bytes"].astype("int64")
            out["byte_sum"] = out["byte_sum"].astype("int64")
            out["byte_max"] = out["byte_max"].astype("int32")
            yield out

    return media.mapInPandas(_decode, DECODE_STATS_SCHEMA)


FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("feature", ArrayType(FloatType()), False),
        StructField("feat_norm", DoubleType(), False),
    ]
)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic feature vector per payload (chunked byte means over
    `dim` equal slices) — the feature-extraction stage of an embedding
    pipeline, as a mapInPandas batch op. Replace the chunk-mean with a
    model forward pass in production."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats, norms = [], []
            for p in pdf["payload"]:
                arr = np.frombuffer(p, dtype=np.uint8).astype("float64")
                if len(arr) == 0:
                    v = np.zeros(dim)
                else:
                    chunks = np.array_split(arr, dim)
                    v = np.array(
                        [c.sum() / len(c) if len(c) else 0.0 for c in chunks]
                    )
                feats.append(v.astype("float32"))
                norms.append(float(np.sqrt((v * v).sum())))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "feature": feats,
                    "feat_norm": norms,
                }
            )

    return media.mapInPandas(_extract, FEATURES_SCHEMA)


FEATURE_SUMS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("chunk_idx", IntegerType(), False),
        StructField("chunk_sum", LongType(), False),
        StructField("chunk_len", LongType(), False),
    ]
)


def extract_feature_sums(media: DataFrame, dim: int = 16) -> DataFrame:
    """Exact-integer twin of `extract_features`: per-chunk byte sum and
    length — the rational numerator/denominator of each chunk-mean
    feature (chunk boundaries identical to np.array_split: the first
    n % dim chunks get one extra byte). Emitting the integer pair instead
    of the float quotient is what makes a SQL oracle exact; the float
    stage stays for downstream consumers."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            doc_ids, idxs, sums, lens = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                n = len(arr)
                q, r = divmod(n, dim)
                sizes = np.full(dim, q, dtype=np.int64)
                sizes[:r] += 1
                # prefix-sum difference handles empty chunks (n < dim)
                # without the reduceat repeated-index pitfall
                cs = np.concatenate(
                    ([0], np.cumsum(arr, dtype=np.int64))
                )
                ends = np.cumsum(sizes)
                doc_ids.append(np.full(dim, int(doc_id), dtype=np.int64))
                idxs.append(np.arange(dim, dtype=np.int32))
                sums.append(cs[ends] - cs[ends - sizes])
                lens.append(sizes)
            if not doc_ids:
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series([], dtype="int64"),
                        "chunk_idx": pd.Series([], dtype="int32"),
                        "chunk_sum": pd.Series([], dtype="int64"),
                        "chunk_len": pd.Series([], dtype="int64"),
                    }
                )
                continue
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(np.concatenate(doc_ids), dtype="int64"),
                    "chunk_idx": pd.Series(np.concatenate(idxs), dtype="int32"),
                    "chunk_sum": pd.Series(np.concatenate(sums), dtype="int64"),
                    "chunk_len": pd.Series(np.concatenate(lens), dtype="int64"),
                }
            )

    return media.mapInPandas(_extract, FEATURE_SUMS_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType(), False),
        StructField("frame_md5", StringType(), False),
    ]
)


def frame_sample(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Sample every `every_n`-th 'frame' of video payloads (payload split
    into meta.n_frames equal byte-slices) — the frame-extraction stage of
    a video pipeline as a flat mapInPandas (one input row → many frame
    rows; Arrow batches keep the blowup off the driver)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame": [], "frame_md5": []}
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                if meta["kind"] != "video":
                    continue
                n = max(int(meta["n_frames"]), 1)
                size = max(len(payload) // n, 1)
                for i in range(0, n, every_n):
                    fr = bytes(payload[i * size : (i + 1) * size])
                    rows["doc_id"].append(int(doc_id))
                    rows["frame_idx"].append(i)
                    rows["frame"].append(fr)
                    rows["frame_md5"].append(hashlib.md5(fr).hexdigest())
            out = pd.DataFrame(rows)
            out["doc_id"] = out["doc_id"].astype("int64")
            out["frame_idx"] = out["frame_idx"].astype("int32")
            yield out

    return media.mapInPandas(_frames, FRAME_SCHEMA)

FRAME_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("fsize", LongType(), False),
        StructField("frame_sum", LongType(), False),
    ]
)


def frame_stats(media: DataFrame) -> DataFrame:
    """Per-frame integer byte sums over EVERY frame of the video payloads
    (same slicing as frame_sample: meta.n_frames equal fsize-byte
    slices; tail bytes beyond n·fsize are dropped in both engines) — the
    per-frame signature stage that shot-boundary detection consumes.
    Whole-batch vectorized: one prefix-sum per payload, no per-frame
    Python loop."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            doc_ids, idxs, sizes, sums = [], [], [], []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                if meta["kind"] != "video":
                    continue
                n = max(int(meta["n_frames"]), 1)
                size = max(len(payload) // n, 1)
                arr = np.frombuffer(payload, dtype=np.uint8)
                cs = np.concatenate(([0], np.cumsum(arr, dtype=np.int64)))
                starts = np.arange(n, dtype=np.int64) * size
                ends = np.minimum(starts + size, len(arr))
                starts = np.minimum(starts, len(arr))
                doc_ids.append(np.full(n, int(doc_id), dtype=np.int64))
                idxs.append(np.arange(n, dtype=np.int32))
                sizes.append(np.full(n, size, dtype=np.int64))
                sums.append(cs[ends] - cs[starts])
            if not doc_ids:
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series([], dtype="int64"),
                        "frame_idx": pd.Series([], dtype="int32"),
                        "fsize": pd.Series([], dtype="int64"),
                        "frame_sum": pd.Series([], dtype="int64"),
                    }
                )
                continue
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(np.concatenate(doc_ids), dtype="int64"),
                    "frame_idx": pd.Series(np.concatenate(idxs), dtype="int32"),
                    "fsize": pd.Series(np.concatenate(sizes), dtype="int64"),
                    "frame_sum": pd.Series(np.concatenate(sums), dtype="int64"),
                }
            )

    return media.mapInPandas(_stats, FRAME_STATS_SCHEMA)


AUDIO_WINDOW_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("window_idx", IntegerType(), False),
        StructField("n_samples", LongType(), False),
        StructField("energy", LongType(), False),
        StructField("peak", IntegerType(), False),
    ]
)


def audio_windows(media: DataFrame, win: int = 32) -> DataFrame:
    """Fixed-length window segmentation of audio payloads (bytes stand in
    for samples) with per-window energy (sum of squares) and peak — the
    framing stage of an audio feature pipeline (VAD, loudness
    normalization), as a flat mapInPandas. Integer math, so a SQL oracle
    can reproduce every window exactly."""

    def _windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            # Whole-batch vectorization: concatenate every audio payload
            # into one sample buffer (each payload zero-padded to a
            # multiple of `win`), reshape to (total_windows, win), and
            # reduce along axis 1 — no interpreted per-window loop.
            # Zero-padding is neutral for energy (0²) and peak (bytes ≥ 0);
            # n_samples comes from the true lengths, not the padding.
            doc_ids, lens, bufs = [], [], []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                if meta["kind"] != "audio":
                    continue
                doc_ids.append(int(doc_id))
                lens.append(len(payload))
                bufs.append(np.frombuffer(payload, dtype=np.uint8))
            if not doc_ids:
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series([], dtype="int64"),
                        "window_idx": pd.Series([], dtype="int32"),
                        "n_samples": pd.Series([], dtype="int64"),
                        "energy": pd.Series([], dtype="int64"),
                        "peak": pd.Series([], dtype="int32"),
                    }
                )
                continue
            lens_arr = np.asarray(lens, dtype=np.int64)
            # empty payloads still emit one (all-zero) window
            n_wins = np.maximum((lens_arr + win - 1) // win, 1)
            padded = np.zeros(int(n_wins.sum()) * win, dtype=np.int64)
            starts = np.concatenate(([0], np.cumsum(n_wins[:-1]))) * win
            for s, buf in zip(starts, bufs):
                padded[s : s + len(buf)] = buf
            mat = padded.reshape(-1, win)
            # per-window true sample count: min(win, len - idx*win), >= 0
            window_idx = np.concatenate([np.arange(k) for k in n_wins])
            per_doc_len = np.repeat(lens_arr, n_wins)
            n_samples = np.clip(per_doc_len - window_idx * win, 0, win)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(
                        np.repeat(np.asarray(doc_ids, dtype=np.int64), n_wins),
                        dtype="int64",
                    ),
                    "window_idx": pd.Series(window_idx, dtype="int32"),
                    "n_samples": pd.Series(n_samples, dtype="int64"),
                    "energy": pd.Series((mat * mat).sum(axis=1), dtype="int64"),
                    "peak": pd.Series(mat.max(axis=1), dtype="int32"),
                }
            )

    return media.mapInPandas(_windows, AUDIO_WINDOW_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("new_w", IntegerType(), False),
        StructField("new_h", IntegerType(), False),
        StructField("out_bytes", LongType(), False),
        StructField("resized_md5", StringType(), False),
    ]
)


def resize_images(media: DataFrame, max_side: int = 64) -> DataFrame:
    """Thumbnail the image payloads: aspect-preserving integer fit into
    max_side², then nearest-neighbor byte subsample (index i ↦ byte
    i·n//m) — the resize stage of an image pipeline as Arrow-batched
    mapInPandas. Pure integer arithmetic so an SQL oracle can reproduce
    every byte; swap the subsample for a real raster resize (PIL) at the
    decode_real seam in production."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = {"doc_id": [], "new_w": [], "new_h": [], "out_bytes": [], "resized_md5": []}
        for pdf in batches:
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                if meta["kind"] != "image":
                    continue
                w, h = int(meta["width"]), int(meta["height"])
                side = max(w, h)
                if side <= max_side:
                    nw, nh = w, h
                else:
                    nw = max(w * max_side // side, 1)
                    nh = max(h * max_side // side, 1)
                n = len(payload)
                m = min(n, nw * nh)
                resized = bytes(payload[i * n // m] for i in range(m)) if m else b""
                rows["doc_id"].append(int(doc_id))
                rows["new_w"].append(nw)
                rows["new_h"].append(nh)
                rows["out_bytes"].append(m)
                rows["resized_md5"].append(hashlib.md5(resized).hexdigest())
        out = pd.DataFrame(rows)
        out["doc_id"] = out["doc_id"].astype("int64")
        out["new_w"] = out["new_w"].astype("int32")
        out["new_h"] = out["new_h"].astype("int32")
        out["out_bytes"] = out["out_bytes"].astype("int64")
        yield out

    return media.mapInPandas(_resize, RESIZE_SCHEMA)
