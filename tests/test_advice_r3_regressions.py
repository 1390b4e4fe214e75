"""Regressions for the round-3 ADVICE findings + round-4 serving changes.

- builder must VERIFY the one-file-per-salt invariant before stamping
  layout salt_v3 (a writer split — e.g. spark.sql.files.maxRecordsPerFile —
  would otherwise make the file-task scorer emit partial per-file scores
  silently); the downgraded layout must still serve correctly via the
  groupBy(salt) fallback.
- preserve_ids ingest must make segmented results independent of batch
  arrival order (natural-key corpora).
"""
from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from colbert_live_spark.index.builder import build_index
from colbert_live_spark.index.segments import add_segment, segment_search
from colbert_live_spark.operators.wand import wand_search
from colbert_live_spark.queryset import DOC_QUERIES

K = 10


def _collect(df):
    out = {}
    for r in df.orderBy("query_id", "rank").collect():
        out.setdefault(r.query_id, []).append((r.doc_id, round(r.score, 9)))
    return out


def test_multi_file_salt_downgrades_layout(spark, documents,
                                           tmp_path_factory):
    """A session option that splits a salt dir into multiple files must be
    DETECTED: the meta stamps a non-salt_v3 layout, serving takes the
    shuffle fallback, and answers stay identical to a clean build."""
    docs = documents.filter(F.col("doc_id") < 300)
    split_out = str(tmp_path_factory.mktemp("msalt") / "idx")
    clean_out = str(tmp_path_factory.mktemp("msalt") / "clean")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "7")
    try:
        build_index(spark, docs, split_out, n_groups=2, n_shards=4,
                    salt_rows=100)
    finally:
        spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    build_index(spark, docs, clean_out, n_groups=2, n_shards=4,
                salt_rows=100)
    meta = json.loads(open(f"{split_out}/_INDEX_META.json").read())
    assert meta["layout"] != "salt_v3", \
        "multi-file salt dirs must not be stamped salt_v3"
    clean_meta = json.loads(open(f"{clean_out}/_INDEX_META.json").read())
    assert clean_meta["layout"] == "salt_v3"
    got = _collect(wand_search(spark, split_out, DOC_QUERIES, k=K))
    want = _collect(wand_search(spark, clean_out, DOC_QUERIES, k=K))
    assert got == want


def test_preserve_ids_order_invariant(spark, documents, tmp_path_factory):
    """With preserve_ids, ingesting the same batches in EITHER order yields
    identical search results with the original corpus ids."""
    docs = documents.filter(F.col("doc_id") < 300)
    lo = docs.filter(F.col("doc_id") < 150)
    hi = docs.filter(F.col("doc_id") >= 150)
    roots = []
    for name, batches in [("ab", [lo, hi]), ("ba", [hi, lo])]:
        root = str(tmp_path_factory.mktemp("pids") / name)
        for b in batches:
            add_segment(spark, b, root, n_shards=2, salt_rows=100,
                        preserve_ids=True)
        roots.append(root)
    a = _collect(segment_search(spark, roots[0], DOC_QUERIES, k=K))
    b = _collect(segment_search(spark, roots[1], DOC_QUERIES, k=K))
    assert a == b and a
    # ids are the corpus ids, not offset ones
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    for hits in a.values():
        assert {d for d, _ in hits} <= all_ids
