"""Filesystem abstraction: the whole build/serve/segment path must work when
the index root is a URI (file:// here; the same pyarrow.fs resolution covers
s3://, hdfs://, gs:// on a real deployment) — no raw os.* in driver-side
metadata IO."""
from __future__ import annotations

import math

from pyspark.sql import functions as F

from colbert_live_spark.index.builder import build_index
from colbert_live_spark.operators import bm25
from colbert_live_spark.operators.wand import wand_search
from colbert_live_spark.queryset import DOC_QUERIES

K = 5
ATOL = 1e-9
QUERIES = DOC_QUERIES[:3]


def _collect(df):
    out = {}
    for r in df.orderBy("query_id", "rank").collect():
        out.setdefault(r.query_id, []).append((r.doc_id, r.score))
    return out


def test_build_and_search_on_file_uri(spark, documents, tmp_path_factory):
    out = "file://" + str(tmp_path_factory.mktemp("fsuri") / "idx")
    build_index(spark, documents, out, n_groups=2, n_shards=4, salt_rows=100)
    got = _collect(wand_search(spark, out, QUERIES, k=K))
    expect = _collect(bm25.search(spark, documents, QUERIES, k=K))
    assert got.keys() == expect.keys()
    for qid in expect:
        assert [d for d, _ in got[qid]] == [d for d, _ in expect[qid]]
        for (_, s1), (_, s2) in zip(got[qid], expect[qid]):
            assert math.isclose(s1, s2, abs_tol=ATOL)


def test_segments_on_file_uri(spark, documents, tmp_path_factory):
    from colbert_live_spark.index.segments import (
        add_segment, delete_docs, segment_search)
    root = "file://" + str(tmp_path_factory.mktemp("fsuri_seg") / "live")
    add_segment(spark, documents, root, salt_rows=100)
    victims = [1, 2, 3]
    assert delete_docs(spark, root, victims) == 3
    got = _collect(segment_search(spark, root, QUERIES, k=K))
    remaining = documents.filter(~F.col("doc_id").isin(victims))
    expect = _collect(bm25.search(spark, remaining, QUERIES, k=K))
    for qid in expect:
        assert [d for d, _ in got.get(qid, [])] == [d for d, _ in expect[qid]]
        for (_, s1), (_, s2) in zip(got[qid], expect[qid]):
            assert math.isclose(s1, s2, abs_tol=ATOL)
