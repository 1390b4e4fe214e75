"""End-to-end over the north-rule input shape (url, warc_ts, html, text,
lang): byte-identical extraction invariant, dense doc-id assignment, full
index build + golden keyword→top-1 (the exact analog of the reference's
`assert top_fname == fname`, tests/test_colbert_live.py:19-20,33-34)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from colbert_live_spark.index.builder import build_index
from colbert_live_spark.index.ids import assign_dense_ids
from colbert_live_spark.operators.wand import wand_search
from colbert_live_spark.oracle import build_oracle_index, oracle_search
from colbert_live_spark.queryset import webpage_queries
from colbert_live_spark.sources.webpages import (
    N_KEYWORDS, extract_text, generate_webpages,
)

N_ROWS = 300


@pytest.fixture(scope="module")
def webpages(spark):
    return generate_webpages(spark, N_ROWS, n_partitions=6).persist()


def test_schema_matches_input_hint(webpages):
    assert [(f.name, f.dataType.simpleString()) for f in webpages.schema.fields] == [
        ("url", "string"), ("warc_ts", "timestamp"), ("html", "binary"),
        ("text", "string"), ("lang", "string")]


def test_extraction_byte_identity(webpages):
    """extract(html) == text per url — the north-rule per-row invariant."""
    bad = webpages.filter(extract_text(F.col("html")) != F.col("text")).count()
    assert bad == 0
    # and byte-level, not just string-level
    bad_bytes = webpages.filter(
        F.encode(extract_text(F.col("html")), "UTF-8")
        != F.encode(F.col("text"), "UTF-8")).count()
    assert bad_bytes == 0


def test_generation_deterministic_across_partitionings(spark, webpages):
    other = generate_webpages(spark, N_ROWS, n_partitions=13)
    sym = webpages.select("url", "text").exceptAll(
        other.select("url", "text")).count()
    assert sym == 0 and other.count() == N_ROWS


def test_dense_ids(webpages):
    with_ids = assign_dense_ids(webpages, "url")
    rows = with_ids.select("url", "doc_id").collect()
    ids = sorted(r.doc_id for r in rows)
    assert ids == list(range(N_ROWS))
    by_url = sorted(rows, key=lambda r: r.url)
    assert [r.doc_id for r in by_url] == list(range(N_ROWS))  # ordered by key


@pytest.fixture(scope="module")
def web_index(spark, webpages, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("webidx") / "idx")
    docs = assign_dense_ids(webpages, "url")
    build_index(spark, docs, out, n_groups=3, n_shards=4, salt_rows=64,
                doc_meta=docs.select("doc_id", "url", "lang"))
    return out


def test_golden_keyword_top1(spark, webpages, web_index):
    """Query kw{j} → top-1 must be the designated page (tf=5 planting)."""
    queries = [(f"kw{j:02d}", f"kw{j:02d}") for j in range(N_KEYWORDS)]
    res = wand_search(spark, web_index, queries, k=1)
    docs_tbl = spark.read.parquet(f"{web_index}/docs").select("doc_id", "url")
    top1 = {r.query_id: r.url for r in res.join(docs_tbl, "doc_id").collect()}
    rows = webpages.select("url", "text").collect()
    for j in range(N_KEYWORDS):
        kw = f"kw{j:02d}"
        designated = [r.url for r in rows if f" {kw} {kw} " in f" {r.text} "
                      or r.text.startswith(f"{kw} {kw}")]
        assert len(designated) == 1, kw
        assert top1[kw] == designated[0], kw


def test_web_rank_identity_vs_oracle(spark, webpages, web_index):
    docs = assign_dense_ids(webpages, "url")
    oracle = build_oracle_index(
        [(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()])
    queries = webpage_queries()
    got = {}
    for r in wand_search(spark, web_index, queries, k=10).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score))
    for qid, qtext in queries:
        expect = oracle_search(oracle, qtext, k=10)
        g = sorted(got.get(qid, []))
        assert [d for _, d, _ in g] == [d for d, _ in expect], (qid, qtext)


def test_lang_predicate_composes(spark, webpages, web_index):
    """F1 analog: metadata predicate at query time — filter candidates by a
    doc-table attribute joined post-scoring (predicate-composable search,
    reference README.md:21-23 + `example/cmdline/db.py:82-88`)."""
    queries = [("wq01", "word000 word001")]
    res = wand_search(spark, web_index, queries, k=50)
    docs_tbl = spark.read.parquet(f"{web_index}/docs")
    filtered = res.join(docs_tbl.select("doc_id", "lang"), "doc_id").filter(
        F.col("lang") == "de")
    langs = {r.lang for r in filtered.collect()}
    assert langs <= {"de"}
