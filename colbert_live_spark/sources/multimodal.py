"""Multimodal (image/audio/video) column plumbing.

The reference ingests PDF page images (`example/cmdline/main.py:16-29`,
poppler `convert_from_path`) and encodes them with ColPali
(`colbert_live/models.py:116-158`). This module provides the Spark-side
plumbing for opaque ``binary`` media columns with typed metadata: schemas,
Arrow-batched decode/featurize/frame-sample operators over ``mapInPandas``.

The actual codec work (PIL/ffmpeg) is STUBBED — those libraries are not in
this container. Each stub either raises ``NotImplementedError`` (real
formats) or runs a clearly-marked deterministic fake (`FAKE` header), so the
distributed plumbing — schema, partitioning, UDF signature, batch shape — is
real and tested while the pixel math is not pretended.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),        # image | audio | video
    StructField("payload", BinaryType(), False),     # opaque encoded bytes
    StructField("mime", StringType(), True),
])

FEATURE_DIM = 16

DECODED_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("n_frames", IntegerType(), True),
    StructField("features", ArrayType(FloatType()), True),
])

# deterministic fake format: b"FAKE" + width(u16) + height(u16) + raw bytes
FAKE_MAGIC = b"FAKE"


def encode_fake_image(width: int, height: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    body = rng.integers(0, 256, width * height, dtype=np.uint8).tobytes()
    return (FAKE_MAGIC + width.to_bytes(2, "big") + height.to_bytes(2, "big")
            + body)


def _decode_one(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a fake image; real formats raise (stub boundary)."""
    if not payload.startswith(FAKE_MAGIC):
        # PNG/JPEG/... would be handled here with PIL; not available.
        raise NotImplementedError(
            "real image codecs unavailable in this environment; "
            "payload must use the FAKE deterministic format")
    w = int.from_bytes(payload[4:6], "big")
    h = int.from_bytes(payload[6:8], "big")
    px = np.frombuffer(payload[8:8 + w * h], dtype=np.uint8)
    return w, h, px


def _featurize(px: np.ndarray) -> np.ndarray:
    """Deterministic fake feature extractor: histogram of FEATURE_DIM
    buckets, L2-normalized (stands in for a CNN/ColPali embedding)."""
    hist = np.bincount(px // (256 // FEATURE_DIM), minlength=FEATURE_DIM)
    v = hist.astype(np.float32)
    n = float(np.linalg.norm(v))
    return v / n if n > 0 else v


def decode_and_featurize(media: DataFrame) -> DataFrame:
    """media(media_id, kind, payload, mime) → DECODED_SCHEMA rows.

    ``mapInPandas``: whole Arrow batches cross the JVM↔Python boundary once;
    per-batch numpy work only (the reference's batched GPU dispatch analog,
    `colbert_live/colbert_live.py:107-111`).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, feats, frames = [], [], [], []
            for payload in pdf["payload"]:
                w, h, px = _decode_one(bytes(payload))
                ws.append(w)
                hs.append(h)
                frames.append(1)
                feats.append(_featurize(px).tolist())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "width": pd.array(ws, dtype="int32"),
                "height": pd.array(hs, dtype="int32"),
                "n_frames": pd.array(frames, dtype="int32"),
                "features": feats,
            })

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


def encode_fake_bytes(body: bytes) -> bytes:
    """Wrap raw bytes as a FAKE 1×len(body) image payload (deterministic —
    no randomness, so an engine-independent oracle can reproduce the decode
    end-to-end). Payloads above the u16 width are rejected loudly rather
    than silently truncated (a truncated payload would silently diverge
    from any full-content oracle)."""
    if len(body) > 0xFFFF:
        raise ValueError(
            f"FAKE payload body is {len(body)} bytes; the u16 width field "
            "caps it at 65535 — split the content or use a real codec")
    return (FAKE_MAGIC + len(body).to_bytes(2, "big")
            + (1).to_bytes(2, "big") + body)


def media_from_text(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Deterministic media synthesis: each doc's text BYTES become a FAKE
    image payload — real binary columns cross the Arrow boundary in both
    directions (synthesis out, decode in). Text must be ASCII: the
    media_histogram oracle histograms CODEPOINTS, which equals the byte
    histogram only for ASCII — enforced loudly here, not assumed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid, t in zip(pdf[id_col], pdf[text_col]):
                try:
                    body = t.encode("ascii")
                except UnicodeEncodeError as e:
                    raise ValueError(
                        f"media_from_text: doc {mid} contains non-ASCII "
                        "text; the byte-histogram oracle contract requires "
                        "ASCII (bytes == codepoints)") from e
                payloads.append(encode_fake_bytes(body))
            yield pd.DataFrame({
                "media_id": pdf[id_col],
                "kind": "image",
                "payload": payloads,
                "mime": "application/x-fake",
            })

    return docs.select(id_col, text_col).mapInPandas(run,
                                                     schema=MEDIA_SCHEMA)


HIST_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("n_frames", IntegerType(), True),
    StructField("dim", IntegerType(), False),
    StructField("count", LongType(), False),
])


def decode_histogram(media: DataFrame) -> DataFrame:
    """Decode + bucket-histogram (the integer core of :func:`_featurize`,
    exploded one row per bucket) — exact-integer output makes the whole
    decode/featurize plumbing driver-oracle-checkable without float32
    round-off (the normalized float features stay pytest-verified)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bucket = 256 // FEATURE_DIM
        for pdf in batches:
            ids, ws, hs, fr, dims, counts = [], [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, px = _decode_one(bytes(payload))
                hist = np.bincount(px // bucket, minlength=FEATURE_DIM)
                ids.extend([mid] * FEATURE_DIM)
                ws.extend([w] * FEATURE_DIM)
                hs.extend([h] * FEATURE_DIM)
                fr.extend([1] * FEATURE_DIM)
                dims.extend(range(FEATURE_DIM))
                counts.extend(int(c) for c in hist[:FEATURE_DIM])
            yield pd.DataFrame({
                "media_id": ids,
                "width": pd.array(ws, dtype="int32"),
                "height": pd.array(hs, dtype="int32"),
                "n_frames": pd.array(fr, dtype="int32"),
                "dim": pd.array(dims, dtype="int32"),
                "count": pd.array(counts, dtype="int64"),
            })

    return media.mapInPandas(run, schema=HIST_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64,
                 max_frames: int = 8) -> DataFrame:
    """'Video' frame sampling stub: emit up to max_frames offsets per
    payload (one row per sampled frame) — exercises the 1→N mapInPandas
    shape used by real frame extraction."""
    schema = StructType([
        StructField("media_id", LongType(), False),
        StructField("frame_no", IntegerType(), False),
        StructField("offset", LongType(), False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, offs = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n = min(max_frames, max(1, len(payload) // every_n_bytes))
                for i in range(n):
                    ids.append(mid)
                    nos.append(i)
                    offs.append(i * every_n_bytes)
            yield pd.DataFrame({"media_id": ids,
                                "frame_no": pd.array(nos, dtype="int32"),
                                "offset": pd.array(offs, dtype="int64")})

    return media.mapInPandas(run, schema=schema)
