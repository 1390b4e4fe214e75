"""update_docs atomicity: a crash between the delete phase and the re-add
phase must never expose the deleted-but-not-re-added intermediate state
(VERDICT r4 ask #7 — the reference's per-row upsert has no such window,
`colbert_live/colbert_live.py` addDocument/removeDocument semantics)."""
from __future__ import annotations

import json
import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from colbert_live_spark.index.segments import (
    add_segment, segment_search, update_docs,
)
from colbert_live_spark.oracle import build_oracle_index, oracle_search
from colbert_live_spark.queryset import DOC_QUERIES

K = 10
ATOL = 1e-9
PRED = "doc_id % 5 = 1"


def _collect(df):
    out = {}
    for r in df.orderBy("query_id", "rank").collect():
        out.setdefault(r.query_id, []).append((r.doc_id, r.score))
    return out


def _assert_matches(got, oracle_index):
    for qid, qtext in DOC_QUERIES:
        expect = oracle_search(oracle_index, qtext, k=K)
        g = got.get(qid, [])
        assert [d for d, _ in g] == [d for d, _ in expect], (qid, qtext)
        for (gd, gs), (_, es) in zip(g, expect):
            assert math.isclose(gs, es, abs_tol=ATOL), (qid, gd)


def test_update_crash_window_atomicity(spark, documents, tmp_path):
    root = str(tmp_path / "live")
    add_segment(spark, documents, root, salt_rows=100)
    before = _collect(segment_search(spark, root, DOC_QUERIES, k=K))
    manifest_before = json.loads(open(f"{root}/MANIFEST.json").read())

    # re-added docs: doubled text, dense LOCAL ids (add_segment offsets
    # them by next_doc_base, exactly the bm25_after_update entry's shape)
    w = Window.orderBy("doc_id")
    new_docs = (documents.filter(F.expr(PRED))
                .withColumn("text", F.concat(F.col("text"), F.lit(" "),
                                             F.col("text")))
                .withColumn("doc_id",
                            (F.row_number().over(w) - 1).cast("long")))
    upd_ids = [r.doc_id for r in
               documents.filter(F.expr(PRED)).select("doc_id").collect()]

    # 1) injected crash between the phases → manifest byte-identical,
    #    reader results byte-identical (the delete is NOT visible)
    with pytest.raises(RuntimeError, match="injected crash"):
        update_docs(spark, new_docs, root, upd_ids, salt_rows=100,
                    _fail_between_phases=True)
    manifest_after_crash = json.loads(open(f"{root}/MANIFEST.json").read())
    assert manifest_after_crash == manifest_before
    mid = _collect(segment_search(spark, root, DOC_QUERIES, k=K))
    assert mid == before

    # 2) retry without the fault → both phases visible together; results
    #    match a from-scratch oracle over the post-update corpus
    seg = update_docs(spark, new_docs, root, upd_ids, salt_rows=100)
    assert seg is not None
    base = manifest_before["next_doc_base"]
    survivors = [(r.doc_id, r.text) for r in
                 documents.filter(f"NOT ({PRED})")
                 .select("doc_id", "text").collect()]
    updated = sorted((r.doc_id, r.text + " " + r.text) for r in
                     documents.filter(F.expr(PRED))
                     .select("doc_id", "text").collect())
    re_added = [(base + i, text) for i, (_old, text) in enumerate(updated)]
    oracle = build_oracle_index(survivors + re_added)
    after = _collect(segment_search(spark, root, DOC_QUERIES, k=K))
    _assert_matches(after, oracle)
