"""Pure-Python exact BM25 oracle.

The analog of the reference's brute-force in-memory oracle DB
(``tests/db.py:29-39``: full-scan cosine + exact sort standing in for the ANN
index). Every engine query path (SQL BM25, compressed-index WAND) must be
rank-identical to this oracle with scores matching to atol=1e-9.

Deterministic throughout: idf/tf math in float64, per-doc score sums terms in
sorted-term order, final sort by (score DESC, doc_id ASC).
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass

from colbert_live_spark import BM25_B, BM25_K1
from colbert_live_spark.functions.tokenize import py_tokenize


@dataclass
class OracleIndex:
    n_docs: int
    avgdl: float
    doc_len: dict[int, int]                 # doc_id -> dl
    postings: dict[str, dict[int, int]]     # term -> {doc_id: tf}

    @property
    def df(self) -> dict[str, int]:
        return {t: len(p) for t, p in self.postings.items()}


def build_oracle_index(docs: list[tuple[int, str]]) -> OracleIndex:
    """docs: list of (doc_id, text)."""
    doc_len: dict[int, int] = {}
    postings: dict[str, dict[int, int]] = {}
    for doc_id, text in docs:
        toks = py_tokenize(text)
        doc_len[doc_id] = len(toks)
        for term, tf in Counter(toks).items():
            postings.setdefault(term, {})[doc_id] = tf
    n = len(doc_len)
    avgdl = (sum(doc_len.values()) / n) if n else 0.0
    return OracleIndex(n_docs=n, avgdl=avgdl, doc_len=doc_len, postings=postings)


def idf(n_docs: int, df: int) -> float:
    """Lucene-style BM25 idf: ln(1 + (N - df + 0.5)/(df + 0.5))."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_term_weight(tf: int, dl: int, avgdl: float,
                     k1: float = BM25_K1, b: float = BM25_B) -> float:
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def oracle_search(
    index: OracleIndex,
    query: str,
    k: int = 10,
    conjunctive: bool = False,
    doc_filter: set[int] | None = None,
) -> list[tuple[int, float]]:
    """Exact BM25 top-k: [(doc_id, score)] sorted by score DESC, doc_id ASC.

    ``conjunctive=True`` keeps only docs containing every distinct query term
    (posting-list intersection semantics, SURVEY.md §2.9); the default is the
    reference's union-like disjunctive semantics
    (``colbert_live/colbert_live.py:189-194``).
    """
    qtf = Counter(py_tokenize(query))
    terms = sorted(t for t in qtf if t in index.postings)
    if not terms or (conjunctive and len(terms) < len(set(qtf))):
        return []
    scores: dict[int, float] = {}
    hits: dict[int, int] = {}
    for term in terms:  # sorted-term order => deterministic float summation
        plist = index.postings[term]
        w_idf = idf(index.n_docs, len(plist))
        for doc_id, tf in plist.items():
            if doc_filter is not None and doc_id not in doc_filter:
                continue
            w = qtf[term] * w_idf * bm25_term_weight(
                tf, index.doc_len[doc_id], index.avgdl)
            scores[doc_id] = scores.get(doc_id, 0.0) + w
            hits[doc_id] = hits.get(doc_id, 0) + 1
    if conjunctive:
        scores = {d: s for d, s in scores.items() if hits[d] == len(terms)}
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]
