"""Regression tests for the round-1 advisor findings: transformed-input
grouping, streaming replay idempotence, conjunctive+filter composition,
resume-assignment drift."""
from __future__ import annotations

import glob
import json
import math
import os
import shutil

import pytest
from pyspark.sql import functions as F

from colbert_live_spark.index.builder import build_index, build_runs
from colbert_live_spark.operators.wand import wand_search
from colbert_live_spark.queryset import DOC_QUERIES

K = 10
ATOL = 1e-9


def test_transformed_input_is_not_rereread_from_files(spark, documents,
                                                      tmp_path_factory):
    """A filtered/shifted DataFrame must be indexed AS GIVEN — the per-file
    grouping path once re-read raw files and silently discarded the
    transformation (indexing all 500 docs with unshifted ids)."""
    base = tmp_path_factory.mktemp("xform")
    raw = str(base / "raw")
    # a real on-disk scan (the cached `documents` fixture hides the bug:
    # cached plans return no inputFiles)
    documents.write.parquet(raw)
    docs = spark.read.parquet(raw)
    out = str(base / "idx")
    transformed = (docs.filter(F.col("doc_id") < 7)
                   .withColumn("doc_id", F.col("doc_id") + 100))
    build_index(spark, transformed, out, n_groups=2, n_shards=4,
                salt_rows=100)
    ids = sorted(r.doc_id for r in
                 spark.read.parquet(f"{out}/docs").select("doc_id").collect())
    assert ids == [100 + i for i in range(7)]


def test_streaming_replay_is_noop(spark, documents, tmp_path_factory):
    """At-least-once foreachBatch replays must not re-ingest (idempotent
    sink via manifest last_batch_id)."""
    from colbert_live_spark.index.segments import add_segment
    root = str(tmp_path_factory.mktemp("replay") / "live")
    small = documents.limit(20)
    assert add_segment(spark, small, root, salt_rows=100,
                       batch_id=0) is not None
    with open(f"{root}/MANIFEST.json") as f:
        before = json.load(f)
    # replay of batch 0: must be a no-op
    assert add_segment(spark, small, root, salt_rows=100, batch_id=0) is None
    with open(f"{root}/MANIFEST.json") as f:
        after = json.load(f)
    assert before == after
    assert len(after["segments"]) == 1
    # the NEXT batch ingests normally
    assert add_segment(spark, small, root, salt_rows=100,
                       batch_id=1) is not None


def test_conjunctive_composes_with_doc_filter(spark, documents, oracle_index,
                                              tmp_path_factory):
    """conjunctive=True + doc_filter was silently ignored in round 1 (the
    filter branch won); now it must mean intersection ∩ filter."""
    from colbert_live_spark.entry_queries import built_index
    from colbert_live_spark.oracle import oracle_search
    idx = built_index(spark, "/root/testdata/sf0.001")
    en = documents.filter(F.col("lang") == "en").select("doc_id")
    en_ids = {r.doc_id for r in en.collect()}
    got = {}
    res = wand_search(spark, idx, DOC_QUERIES, k=K, conjunctive=True,
                      doc_filter=en)
    for r in res.orderBy("query_id", "rank").collect():
        got.setdefault(r.query_id, []).append((r.doc_id, r.score))
    for qid, qtext in DOC_QUERIES:
        expect = oracle_search(oracle_index, qtext, k=K, conjunctive=True,
                               doc_filter=en_ids)
        g = got.get(qid, [])
        assert [d for d, _ in g] == [d for d, _ in expect], (qid, qtext)
        for (_, s1), (_, s2) in zip(g, expect):
            assert math.isclose(s1, s2, abs_tol=ATOL)


def test_concurrent_group_build_identical(spark, documents,
                                          tmp_path_factory):
    """build_runs with a driver thread pool (max_concurrency > 1) must
    produce the same index as the sequential build — same ledger groups,
    identical search results."""
    from colbert_live_spark.index.builder import merge_index
    base = tmp_path_factory.mktemp("conc")
    seq_dir, conc_dir = str(base / "seq"), str(base / "conc")
    for out, conc in ((seq_dir, 1), (conc_dir, 3)):
        build_runs(spark, documents, out, n_groups=4, max_concurrency=conc)
        merge_index(spark, out, n_shards=4, salt_rows=100)
    from colbert_live_spark.index.builder import completed_groups
    assert completed_groups(spark, seq_dir) == completed_groups(
        spark, conc_dir) == {0, 1, 2, 3}
    a = {(r.query_id, r.rank): (r.doc_id, round(r.score, 9))
         for r in wand_search(spark, seq_dir, DOC_QUERIES, k=K).collect()}
    b = {(r.query_id, r.rank): (r.doc_id, round(r.score, 9))
         for r in wand_search(spark, conc_dir, DOC_QUERIES, k=K).collect()}
    assert a == b and len(a) > 0


def test_resume_assignment_drift_fails_loudly(spark, documents,
                                              tmp_path_factory):
    """Completed groups whose recorded file lists no longer match the
    current assignment must abort the resume (silent reuse would skip or
    double-index docs)."""
    base = tmp_path_factory.mktemp("drift")
    raw = str(base / "raw")
    documents.repartition(4).write.parquet(raw)
    docs = spark.read.parquet(raw)
    out = str(base / "idx")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_runs(spark, docs, out, n_groups=2, fail_after_group=1)
    # a file appears between crash and resume → assignment drift
    src = glob.glob(f"{raw}/part-*.parquet")[0]
    shutil.copy(src, f"{raw}/part-zzz-extra.parquet")
    docs2 = spark.read.parquet(raw)
    with pytest.raises(RuntimeError, match="resume mismatch"):
        build_runs(spark, docs2, out, n_groups=2)
