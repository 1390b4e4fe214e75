"""Rank-identity of the DataFrame BM25 path vs the pure-Python oracle —
the analog of the reference's golden tests (`tests/test_colbert_live.py`)
backed by its brute-force oracle (`tests/db.py:29-39`)."""
from __future__ import annotations

import math

import pytest

from colbert_live_spark.operators import bm25
from colbert_live_spark.oracle import oracle_search
from colbert_live_spark.queryset import DOC_QUERIES

K = 10
ATOL = 1e-9


def _engine_results(spark, documents, queries, conjunctive=False):
    df = bm25.search(spark, documents, queries, k=K, conjunctive=conjunctive)
    out: dict[str, list[tuple[int, float]]] = {q: [] for q, _ in queries}
    for r in df.orderBy("query_id", "rank").collect():
        out[r.query_id].append((r.doc_id, r.score))
    return out


@pytest.fixture(scope="module")
def engine_disjunctive(spark, documents):
    return _engine_results(spark, documents, DOC_QUERIES)


def test_rank_identical_disjunctive(engine_disjunctive, oracle_index):
    for qid, qtext in DOC_QUERIES:
        expect = oracle_search(oracle_index, qtext, k=K)
        got = engine_disjunctive[qid]
        assert [d for d, _ in got] == [d for d, _ in expect], (qid, qtext)
        for (gd, gs), (ed, es) in zip(got, expect):
            assert math.isclose(gs, es, abs_tol=ATOL), (qid, gd, gs, es)


def test_rank_identical_conjunctive(spark, documents, oracle_index):
    queries = [(q, t) for q, t in DOC_QUERIES]
    got_all = _engine_results(spark, documents, queries, conjunctive=True)
    for qid, qtext in queries:
        expect = oracle_search(oracle_index, qtext, k=K, conjunctive=True)
        got = got_all[qid]
        assert [d for d, _ in got] == [d for d, _ in expect], (qid, qtext)
        for (gd, gs), (ed, es) in zip(got, expect):
            assert math.isclose(gs, es, abs_tol=ATOL)


def test_empty_query_returns_empty(engine_disjunctive):
    assert engine_disjunctive["q009"] == []  # F3 empty-result guard analog


def test_duplicate_terms_weighting(engine_disjunctive, oracle_index):
    # q011 "spark spark join": qtf=2 on spark must match oracle weighting
    expect = oracle_search(oracle_index, "spark spark join", k=K)
    got = engine_disjunctive["q011"]
    assert [d for d, _ in got] == [d for d, _ in expect]


def test_no_python_udf_in_plan(spark, documents):
    """North-rule guard: no row-at-a-time Python in the hot path
    (SURVEY.md §7 hard part 5)."""
    df = bm25.search(spark, documents, DOC_QUERIES[:4], k=K)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
