"""Posting-list block codec: docID-delta + LEB128 varint, per-block skip
pointers (first/last doc) and max-impact metadata for block-max pruning.

Pure numpy, fully vectorized (bounded loops over byte positions, never over
values) — runs inside Arrow UDF stages with zero per-row Python. This is the
storage-reduction analog of the reference's doc-embedding pooling
(`colbert_live/colbert_live.py:119-129`): the reference halves its index by
pooling token vectors; we compress postings ~4-8× with delta+varint and buy
query-time skipping with the block metadata (the analog of its ANN index
ordering, `example/cmdline/db.py:54-59`).

Block layout (one row per block in the postings table):
  term_id, salt, block_id, first_doc, last_doc, n, max_weight,
  docs (varint deltas, first doc stored in the column),
  tfs (varint), dls (varint)

``max_weight`` is the block max of the idf-free BM25 term weight
tf·(k1+1)/(tf+k1·(1−b+b·dl/avgdl)); multiplying by qtf·idf at query time
gives the block's max impact. Storing it idf-free keeps blocks valid across
index merges that change df.
"""

from __future__ import annotations

import numpy as np

from colbert_live_spark import BM25_B, BM25_K1

BLOCK_SIZE = 128

_THRESH = np.array([1 << (7 * i) for i in range(1, 10)], dtype=np.uint64)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array. Vectorized: loops only over the ≤10
    byte positions, never over values."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    lengths = np.ones(v.shape, dtype=np.int64)
    for t in _THRESH:
        lengths += (v >= t)
    ends = np.cumsum(lengths)
    starts = ends - lengths
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    maxlen = int(lengths.max())
    for i in range(maxlen):
        mask = lengths > i
        byte = ((v[mask] >> np.uint64(7 * i)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (lengths[mask] - 1 > i)
        byte = byte | (cont.astype(np.uint8) << 7)
        out[starts[mask] + i] = byte
    return out.tobytes()


def varint_decode(data: bytes, n: int | None = None) -> np.ndarray:
    """Decode LEB128 bytes back to uint64. Vectorized like encode."""
    arr = np.frombuffer(data, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(0, dtype=np.uint64)
    is_end = arr < 0x80
    ends = np.flatnonzero(is_end)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    out = np.zeros(ends.size, dtype=np.uint64)
    maxlen = int(lengths.max())
    for i in range(maxlen):
        mask = lengths > i
        out[mask] |= (arr[starts[mask] + i] & np.uint64(0x7F)).astype(
            np.uint64) << np.uint64(7 * i)
    if n is not None:
        assert out.size == n, f"decoded {out.size} values, expected {n}"
    return out


def bm25_weight_np(tf: np.ndarray, dl: np.ndarray, avgdl: float,
                   k1: float = BM25_K1, b: float = BM25_B) -> np.ndarray:
    tf = tf.astype(np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl.astype(np.float64) / avgdl))


def encode_posting_list(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    avgdl: float,
    block_size: int = BLOCK_SIZE,
) -> list[dict]:
    """Split one sorted posting (sub-)list into encoded blocks.

    ``doc_ids`` must be sorted ascending and unique; tf/dl aligned.
    Returns a list of block dicts matching the postings-table schema
    (minus term_id/salt which the caller owns).
    """
    order_ok = doc_ids[:-1] < doc_ids[1:] if doc_ids.size > 1 else np.array([True])
    assert bool(np.all(order_ok)), "posting list must be sorted unique by doc_id"
    blocks = []
    for b0 in range(0, doc_ids.size, block_size):
        d = doc_ids[b0:b0 + block_size]
        t = tfs[b0:b0 + block_size]
        l = dls[b0:b0 + block_size]
        deltas = np.empty(d.size - 1, dtype=np.uint64) if d.size > 1 else np.zeros(0, np.uint64)
        if d.size > 1:
            deltas[:] = np.diff(d.astype(np.uint64))
        blocks.append({
            "block_id": b0 // block_size,
            "first_doc": int(d[0]),
            "last_doc": int(d[-1]),
            "n": int(d.size),
            "max_weight": float(bm25_weight_np(t, l, avgdl).max()),
            "docs": varint_encode(deltas),
            "tfs": varint_encode(t.astype(np.uint64)),
            "dls": varint_encode(l.astype(np.uint64)),
        })
    return blocks


def decode_block(first_doc: int, n: int, docs: bytes, tfs: bytes,
                 dls: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Block bytes → (doc_ids int64, tfs int64, dls int64)."""
    deltas = varint_decode(docs, n - 1)
    doc_ids = np.empty(n, dtype=np.int64)
    doc_ids[0] = first_doc
    if n > 1:
        doc_ids[1:] = first_doc + np.cumsum(deltas.astype(np.int64))
    return (doc_ids,
            varint_decode(tfs, n).astype(np.int64),
            varint_decode(dls, n).astype(np.int64))
