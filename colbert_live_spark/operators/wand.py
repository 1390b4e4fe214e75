"""Query serving over the compressed term-sharded index with block-max
pruning — the scale path for the reference's search
(`colbert_live/colbert_live.py:146-208`).

Plan shape per batch of queries (salt_v3 file-task topology):
1. driver tokenizes queries (tiny; T1 analog `colbert_live/models.py:92-93`),
2. driver-side dictionary point-lookup for matched terms (pyarrow, zero
   Spark jobs; OR-of-equality predicate → parquet row-group pruning — the
   analog of the reference's per-token index probe,
   `colbert_live/db/astra.py:235-247`),
3. the query-term table (query_id, term_id, qtf·idf) is broadcast to every
   task as a plain broadcast variable — it never joins against blocks, so
   NO per-query replication of compressed data ever happens,
4. ONE TASK PER POSTINGS FILE — the build wrote each doc shard
   (salt = hash(doc_id) mod D, index/builder.py) wholly into one file, so a
   file is the complete mini-index of its doc subset. Each task
   pyarrow-reads its own file (term_id predicate → row-group pruning),
   decodes every matched list at most ONCE (term-level decode+weight
   cache), and scores ALL queries of the batch with local-θ MaxScore
   pruning. Compressed block bytes NEVER enter a Spark Exchange — with a
   doc_filter, only the 8-byte filter ids shuffle (grouped by shard) and
   each group task reads its shard's file the same way.
5. each (query, file) emits ≤ k exact-scored candidates (a doc's whole
   score is computed inside its shard, so the global top-k is a subset of
   the per-shard top-k union); the global merge ranks ≤ D·k tiny rows via
   WindowGroupLimit (partial top-k before the merge shuffle).
Non-salt_v3 layouts (builder's one-file-per-salt check failed) fall back
to ``groupBy(salt).applyInPandas`` / cogroup — blocks shuffle once per
batch; correct, plan-distinct, result-identical (tested).

Safe-pruning invariant (tested): pruned output == unpruned output exactly.
The pruning logic: process term lists in descending list-max-impact order,
maintaining a sorted accumulator of (doc_id, partial score). θ = k-th largest
accumulated score (a valid lower bound: scores only grow). New docs are
admitted only while Σ max-impact of the remaining lists ≥ θ — a doc first
seen later can never reach θ. Once admission closes, a block is decoded only
if its [first_doc, last_doc] range intersects the accumulator (skip
pointers); accumulated docs always receive exact contributions, so surviving
scores are exact. This is the inverted-index re-expression of the
reference's two-phase cheap-candidates→exact-rescore design
(`colbert_live/colbert_live.py:189-204`).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from colbert_live_spark.functions.tokenize import py_tokenize
from colbert_live_spark.index.codec import bm25_weight_np

OUT_SCHEMA = "query_id string, rank int, doc_id long, score double"


def expand_budget(k: int, a: float = 94.9, b: float = 11.0,
                  c: float = -1.48) -> int:
    """Candidate-budget heuristic, same shape as the reference's ``_expand``
    (`colbert_live/colbert_live.py:14-20`: max(x, a + b·x + c·x·ln x) —
    superlinear growth that decays as k grows; its fitted LoTTE constants
    give f(10)=171). Used to cap the scorer's accumulator between term
    lists: docs outside the top expand_budget(k) by upper bound can never
    enter the final top-k."""
    import math
    return int(max(k, a + b * k + c * k * math.log(max(k, 2))))


def _decode_many(first_docs, ns, docs_blobs, tfs_blobs, dls_blobs):
    """Decode a set of blocks into flat (doc_ids, tfs, dls) arrays —
    single-pass vectorized (see codec.decode_blocks)."""
    from colbert_live_spark.index.codec import decode_blocks
    return decode_blocks(first_docs, ns, list(docs_blobs), list(tfs_blobs),
                         list(dls_blobs))


def _merge_acc(acc_d, acc_s, new_d, new_s):
    """Merge sorted accumulator with new sorted, doc-unique (doc, score)
    contributions — vectorized two-way sorted merge, no re-sort (the
    accumulator path is the batched-serving hot loop)."""
    if acc_d.size == 0:
        return new_d.copy(), new_s.astype(np.float64, copy=True)
    pos = np.searchsorted(acc_d, new_d)
    pos_c = np.minimum(pos, acc_d.size - 1)
    hit = acc_d[pos_c] == new_d
    # existing docs: add in place (term order preserved → deterministic)
    acc_s = acc_s.copy()
    acc_s[pos_c[hit]] += new_s[hit]
    miss_d, miss_s = new_d[~hit], new_s[~hit]
    if miss_d.size == 0:
        return acc_d, acc_s
    # classic vectorized merge placement of the misses
    ins = np.searchsorted(acc_d, miss_d)
    total = acc_d.size + miss_d.size
    take = np.zeros(total, dtype=bool)
    take[ins + np.arange(miss_d.size)] = True
    out_d = np.empty(total, dtype=np.int64)
    out_s = np.empty(total, dtype=np.float64)
    out_d[take], out_d[~take] = miss_d, acc_d
    out_s[take], out_s[~take] = miss_s, acc_s
    return out_d, out_s


def intersect_query_blocks(
    pdf: pd.DataFrame,
    avgdl: float,
    k: int,
    n_query_terms: int,
    stats: dict | None = None,
) -> pd.DataFrame:
    """Exact conjunctive (posting-list intersection) top-k for one query.

    Classic merge-based intersection with skip pointers: start from the
    smallest list; every other list decodes only blocks whose
    [first_doc, last_doc] range intersects the surviving candidate set
    (the north rule's 'posting-list intersection' with block skipping).
    If any query term is absent from the index (matched terms <
    n_query_terms) the intersection is empty.
    """
    qid = pdf["query_id"].iloc[0]
    empty = pd.DataFrame({"query_id": pd.array([], dtype="str"),
                          "rank": pd.array([], dtype="int32"),
                          "doc_id": pd.array([], dtype="int64"),
                          "score": pd.array([], dtype="float64")})
    if pdf["term_id"].nunique() < n_query_terms:
        return empty
    # smallest list first: order terms by total postings (ties on term_id
    # for shuffle-order-independent float summation)
    sizes = pdf.groupby("term_id", sort=False)["n"].sum()
    term_order = sizes.index.to_numpy()[np.lexsort(
        (sizes.index.to_numpy(), sizes.to_numpy()))]
    cand_d = None
    cand_s = None
    decoded = 0
    for term_id in term_order:
        rows = pdf[pdf["term_id"] == term_id]
        qtf = float(rows["qtf"].iloc[0])
        idf = float(rows["idf"].iloc[0])
        if cand_d is not None:
            if cand_d.size == 0:
                break
            lo = np.searchsorted(cand_d, rows["first_doc"].to_numpy())
            hi = np.searchsorted(cand_d, rows["last_doc"].to_numpy(),
                                 side="right")
            rows = rows[hi > lo]
        decoded += len(rows)
        d, tf, dl = _decode_many(rows["first_doc"].to_numpy(),
                                 rows["n"].to_numpy(),
                                 rows["docs"].to_list(),
                                 rows["tfs"].to_list(),
                                 rows["dls"].to_list())
        if d.size and not np.all(d[:-1] <= d[1:]):
            order = np.argsort(d, kind="stable")
            d, tf, dl = d[order], tf[order], dl[order]
        w = qtf * idf * bm25_weight_np(tf, dl, avgdl) if d.size else d.astype(np.float64)
        if cand_d is None:
            cand_d, cand_s = d, w
        else:
            pos = np.searchsorted(d, cand_d)
            pos_c = np.minimum(pos, max(d.size - 1, 0))
            hit = (d[pos_c] == cand_d) if d.size else np.zeros(cand_d.size, bool)
            cand_d = cand_d[hit]
            cand_s = cand_s[hit] + w[pos_c[hit]]
    if stats is not None:
        stats["blocks_total"] = stats.get("blocks_total", 0) + len(pdf)
        stats["blocks_decoded"] = stats.get("blocks_decoded", 0) + decoded
    if cand_d is None or cand_d.size == 0:
        return empty
    kk = min(k, cand_d.size)
    order = np.lexsort((cand_d, -cand_s))[:kk]
    return pd.DataFrame({
        "query_id": qid,
        "rank": np.arange(1, kk + 1, dtype=np.int32),
        "doc_id": cand_d[order],
        "score": cand_s[order],
    })


def score_query_blocks(
    pdf: pd.DataFrame,
    avgdl: float,
    k: int,
    prune: bool = True,
    stats: dict | None = None,
    filter_ids=None,
) -> pd.DataFrame:
    """Exact top-k for one query from its matched compressed blocks.

    pdf columns: term_id, salt, block_id, first_doc, last_doc, n, max_weight,
    docs, tfs, dls, qtf, idf, query_id.

    ``filter_ids``: optional sorted int64 array of permitted doc ids — the
    query-time metadata predicate (reference analog: tag filter inside the
    ANN scan, `example/cmdline/db.py:82-88`). Corpus statistics stay global,
    matching the reference's semantics (the model's weights don't change
    when a filter is applied).
    """
    qid = pdf["query_id"].iloc[0]
    doc_filter = None
    if filter_ids is not None:
        doc_filter = np.asarray(filter_ids, dtype=np.int64)
    # per-term list-level max impact σ_t = qtf·idf·max(block max_weight);
    # σ-ties break on term_id so the float summation order (and hence the
    # bit-exact scores) is independent of shuffle row order
    g = pdf.groupby("term_id", sort=False)
    sigma = (g["max_weight"].max() * g["qtf"].first() * g["idf"].first())
    sigma = sigma.iloc[np.lexsort((sigma.index.to_numpy(),
                                   -sigma.to_numpy()))]
    term_order = sigma.index.to_numpy()
    sigma_v = sigma.to_numpy()
    suffix = np.concatenate([np.cumsum(sigma_v[::-1])[::-1], [0.0]])

    acc_d = np.zeros(0, dtype=np.int64)
    acc_s = np.zeros(0, dtype=np.float64)
    total_blocks = len(pdf)
    decoded_blocks = 0
    admission = True
    for ti, term_id in enumerate(term_order):
        rows = pdf[pdf["term_id"] == term_id]
        qtf = float(rows["qtf"].iloc[0])
        idf = float(rows["idf"].iloc[0])
        theta = (np.partition(acc_s, acc_s.size - k)[acc_s.size - k]
                 if acc_s.size >= k else 0.0)
        if prune and admission and suffix[ti] < theta:
            admission = False
        if prune and not admission:
            if acc_d.size == 0:
                break
            lo = np.searchsorted(acc_d, rows["first_doc"].to_numpy())
            hi = np.searchsorted(acc_d, rows["last_doc"].to_numpy(), side="right")
            keep = hi > lo
            # block-max refinement: a surviving block still can't matter if
            # θ already dominates every accumulated doc's bound... exactness
            # for accumulated docs forbids skipping intersecting blocks.
            rows = rows[keep]
        decoded_blocks += len(rows)
        d, tf, dl = _decode_many(rows["first_doc"].to_numpy(),
                                 rows["n"].to_numpy(),
                                 rows["docs"].to_list(),
                                 rows["tfs"].to_list(),
                                 rows["dls"].to_list())
        if d.size == 0:
            continue
        # salted sub-lists are doc-disjoint but interleaved: sort for merge
        if not np.all(d[:-1] <= d[1:]):
            order = np.argsort(d, kind="stable")
            d, tf, dl = d[order], tf[order], dl[order]
        if doc_filter is not None and d.size:
            pos = np.searchsorted(doc_filter, d)
            pos_c = np.minimum(pos, doc_filter.size - 1)
            ok = doc_filter[pos_c] == d
            d, tf, dl = d[ok], tf[ok], dl[ok]
            if d.size == 0:
                continue
        if prune and not admission:
            # search the small accumulator into the big decoded list and
            # weight only the hits (same values/order as the full-list
            # form — elementwise BM25 on the hit subset)
            pos = np.minimum(np.searchsorted(d, acc_d), d.size - 1)
            hit = d[pos] == acc_d
            if hit.any():
                ph = pos[hit]
                acc_s[hit] += qtf * idf * bm25_weight_np(tf[ph], dl[ph],
                                                         avgdl)
        else:
            w = qtf * idf * bm25_weight_np(tf, dl, avgdl)
            acc_d, acc_s = _merge_acc(acc_d, acc_s, d, w)
        # safe accumulator cap (C2 _expand analog): a doc whose score plus
        # every remaining list's max impact is below θ can never reach the
        # top-k — drop it. Bounds scorer memory on huge disjunctions.
        cap = max(4 * k, expand_budget(k))
        if prune and acc_s.size > cap:
            th = np.partition(acc_s, acc_s.size - k)[acc_s.size - k]
            keep = acc_s + suffix[ti + 1] >= th
            if int(keep.sum()) >= k:
                acc_d, acc_s = acc_d[keep], acc_s[keep]
    if stats is not None:
        stats["blocks_total"] = stats.get("blocks_total", 0) + total_blocks
        stats["blocks_decoded"] = stats.get("blocks_decoded", 0) + decoded_blocks
    if acc_d.size == 0:
        return pd.DataFrame({"query_id": pd.array([], dtype="str"),
                             "rank": pd.array([], dtype="int32"),
                             "doc_id": pd.array([], dtype="int64"),
                             "score": pd.array([], dtype="float64")})
    kk = min(k, acc_d.size)
    # top-k with deterministic (score DESC, doc_id ASC) order
    order = np.lexsort((acc_d, -acc_s))[:kk]
    return pd.DataFrame({
        "query_id": qid,
        "rank": np.arange(1, kk + 1, dtype=np.int32),
        "doc_id": acc_d[order],
        "score": acc_s[order],
    })


def matched_query_terms(spark: SparkSession, index_dir: str,
                        queries: list[tuple[str, str]]) -> DataFrame:
    """(query_id, term_id, qtf, idf) for terms present in the dictionary.
    One driver job (dictionary point-lookup, term-pruned by parquet stats);
    the per-query expansion happens driver-side — queries are tiny (the T1
    query-encode analog, `colbert_live/models.py:92-93`)."""
    return spark.createDataFrame(
        _matched_query_rows(spark, index_dir, queries),
        "query_id string, term_id long, qtf int, idf double")


def pruning_isin(field: str, values):
    """A pyarrow predicate equivalent to ``field.isin(values)`` that
    actually PRUNES parquet row groups. pyarrow evaluates only
    equality/comparison guarantees against row-group statistics — a bare
    ``isin`` reads every row group (measured: 20/20 matched on a
    1000-term/20-row-group file; OR-of-equalities matched 2). Small value
    sets (queries are dozens of terms) become the OR chain; larger sets
    keep ``isin`` for the row filter but add a min/max range conjunct so
    stats pruning still skips row groups outside the value span."""
    import functools
    import operator

    import pyarrow.dataset as pads
    vals = sorted(values)
    if not vals:
        return pads.field(field).isin(vals)
    if len(vals) <= 64:
        return functools.reduce(
            operator.or_, [pads.field(field) == v for v in vals])
    return ((pads.field(field) >= vals[0]) & (pads.field(field) <= vals[-1])
            & pads.field(field).isin(vals))


def _dict_point_lookup(index_dir: str, terms: list[str]) -> dict:
    """term -> (term_id, idf) for the given terms — a DRIVER-SIDE pyarrow
    point-lookup, zero Spark jobs.

    A Spark job here was ~0.5-1 s of fixed per-batch overhead that does not
    parallelize (it is the same at 2 and at 8 cores), directly eating
    scaling efficiency. The dictionary files are term-sorted, so the isin
    predicate prunes to the row groups containing the queried terms — the
    read is O(matched row groups), not O(vocabulary), which is what keeps
    this driver-side lookup viable at a 10^8-term web vocabulary (the same
    access path a dedicated serving tier would use)."""
    import pyarrow.dataset as pads

    from colbert_live_spark.index import fsio
    if not terms:
        return {}
    fs, p = fsio.resolve(f"{index_dir}/dict")
    t = (pads.dataset(p, format="parquet", filesystem=fs)
         .to_table(filter=pruning_isin("term", terms),
                   columns=["term", "term_id", "idf"]))
    return {term: (int(tid), float(idf)) for term, tid, idf in
            zip(t.column("term").to_pylist(),
                t.column("term_id").to_pylist(),
                t.column("idf").to_pylist())}


def _matched_terms(spark, index_dir, queries) -> dict:
    """term -> (term_id, idf) for every query term present in the
    dictionary (cluster serving path — one uncached point-lookup per
    batch)."""
    all_terms = sorted({t for _, q in queries for t in py_tokenize(q)})
    return _dict_point_lookup(index_dir, all_terms)


def _matched_query_rows(spark, index_dir, queries):
    matched = _matched_terms(spark, index_dir, queries)
    rows = []
    for qid, qtext in queries:
        counts: dict[str, int] = {}
        for t in py_tokenize(qtext):
            counts[t] = counts.get(t, 0) + 1
        for term, qtf in sorted(counts.items()):
            if term in matched:
                tid, idf = matched[term]
                rows.append((qid, tid, qtf, float(idf)))
    return rows


def build_qmeta(queries: list[tuple[str, str]], resolve) -> tuple[dict, dict]:
    """(qmeta, nq_map) shared by every serving path: qmeta maps query_id →
    [(term_id, qtf·idf)] in the query's GLOBAL processing order (impact
    desc, term_id tiebreak — LOAD-BEARING: every shard must sum a doc's
    contributions in the same float order or ties break shard-dependently);
    nq_map maps query_id → raw distinct-token count (conjunctive emptiness
    checks). ``resolve(term) -> (term_id, idf) | None``. One implementation
    so local, cluster, and segment paths cannot drift apart."""
    qmeta: dict[str, list[tuple[int, float]]] = {}
    nq_map: dict[str, int] = {}
    for qid, qtext in queries:
        counts: dict[str, int] = {}
        for t in py_tokenize(qtext):
            counts[t] = counts.get(t, 0) + 1
        nq_map[qid] = len(counts)
        terms = []
        for term, qtf in sorted(counts.items()):
            r = resolve(term)
            if r is not None:
                terms.append((r[0], qtf * r[1]))
        terms.sort(key=lambda x: (-x[1], x[0]))
        if terms:
            qmeta[qid] = terms
    return qmeta, nq_map


# ------------------------------------------------------- shard-batch scoring

PARTIAL_SCHEMA = "query_id string, doc_id long, score double"


def _empty_partial() -> pd.DataFrame:
    return pd.DataFrame({"query_id": pd.array([], dtype="str"),
                         "doc_id": pd.array([], dtype="int64"),
                         "score": pd.array([], dtype="float64")})


def _member_mask(ids: np.ndarray, members: np.ndarray) -> np.ndarray:
    """Boolean mask: ids[i] in members (members sorted unique)."""
    if members.size == 0:
        return np.zeros(ids.size, dtype=bool)
    pos = np.minimum(np.searchsorted(members, ids), members.size - 1)
    return members[pos] == ids


class ShardLists:
    """One doc shard's matched posting lists: lazy decode + idf-free weight
    cache. A list is decoded at most once per (shard, batch) no matter how
    many queries subscribe to its term — together with the shard grouping,
    this is what makes batched throughput independent of batch size.
    Optional ``filter_ids`` (permitted) / ``exclude_ids`` (tombstoned) apply
    once at decode time (they are query-independent)."""

    def __init__(self, pdf: pd.DataFrame, avgdl: float,
                 filter_ids: np.ndarray | None = None,
                 exclude_ids: np.ndarray | None = None):
        self._avgdl = avgdl
        self._filter = filter_ids
        self._exclude = exclude_ids
        self._groups: dict[int, pd.DataFrame] = {}
        self._sigma: dict[int, float] = {}
        self._sizes: dict[int, int] = {}
        if len(pdf):
            for tid, sub in pdf.groupby("term_id", sort=False):
                tid = int(tid)
                self._groups[tid] = sub
                self._sigma[tid] = float(sub["max_weight"].max())
                self._sizes[tid] = int(sub["n"].sum())
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def __contains__(self, tid: int) -> bool:
        return tid in self._groups

    def sigma_base(self, tid: int) -> float:
        return self._sigma[tid]

    def size(self, tid: int) -> int:
        return self._sizes[tid]

    def get(self, tid: int) -> tuple[np.ndarray, np.ndarray]:
        """(doc_ids sorted, idf-free weights) for the shard-local list."""
        hit = self._cache.get(tid)
        if hit is None:
            rows = self._groups[tid]
            d, tf, dl = _decode_many(rows["first_doc"].to_numpy(),
                                     rows["n"].to_numpy(),
                                     rows["docs"].to_list(),
                                     rows["tfs"].to_list(),
                                     rows["dls"].to_list())
            if d.size and not np.all(d[:-1] <= d[1:]):
                order = np.argsort(d, kind="stable")
                d, tf, dl = d[order], tf[order], dl[order]
            if self._filter is not None:
                keep = _member_mask(d, self._filter)
                d, tf, dl = d[keep], tf[keep], dl[keep]
            if self._exclude is not None and self._exclude.size:
                keep = ~_member_mask(d, self._exclude)
                d, tf, dl = d[keep], tf[keep], dl[keep]
            hit = (d, bm25_weight_np(tf, dl, self._avgdl))
            self._cache[tid] = hit
        return hit


def _score_one(lists: ShardLists, qterms: list[tuple[int, float]], k: int,
               prune: bool) -> tuple[np.ndarray, np.ndarray]:
    """Exact shard-local top-k for one query (disjunctive MaxScore).
    ``qterms``: [(term_id, qtf·idf)] — only terms present in this shard,
    in the query's GLOBAL processing order (driver-fixed: impact desc,
    term_id tiebreak). The order must be identical in every shard so that
    two docs with equal contribution multisets sum in the same float order
    and tie bit-identically regardless of which shard they live in; the
    MaxScore admission proof holds for ANY fixed order (suffix bounds are
    computed over the order actually processed), per-shard σ only loses a
    little tightness vs a per-shard σ-desc order."""
    infos = [(coef * lists.sigma_base(tid), tid, coef) for tid, coef in qterms]
    sigma_v = np.array([s for s, _, _ in infos], dtype=np.float64)
    suffix = np.concatenate([np.cumsum(sigma_v[::-1])[::-1], [0.0]])
    acc_d = np.zeros(0, dtype=np.int64)
    acc_s = np.zeros(0, dtype=np.float64)
    admission = True
    for ti, (_sig, tid, coef) in enumerate(infos):
        theta = (np.partition(acc_s, acc_s.size - k)[acc_s.size - k]
                 if acc_s.size >= k else 0.0)
        if prune and admission and suffix[ti] < theta:
            admission = False
        if prune and not admission and acc_d.size == 0:
            break
        d, wb = lists.get(tid)
        if d.size == 0:
            continue
        if prune and not admission:
            # admission closed: only accumulated docs can gain — search the
            # SMALL accumulator into the big list (O(|acc|·log|list|), not
            # O(|list|·log|acc|)) and weight only the hits. Each doc occurs
            # at most once per list, so the per-doc addition order is
            # unchanged (bit-identical to the unpruned sum — tested).
            pos = np.minimum(np.searchsorted(d, acc_d), d.size - 1)
            hit = d[pos] == acc_d
            if hit.any():
                acc_s[hit] += coef * wb[pos[hit]]
        else:
            acc_d, acc_s = _merge_acc(acc_d, acc_s, d, coef * wb)
        cap = max(4 * k, expand_budget(k))
        if prune and acc_s.size > cap:
            th = np.partition(acc_s, acc_s.size - k)[acc_s.size - k]
            keep = acc_s + suffix[ti + 1] >= th
            if int(keep.sum()) >= k:
                acc_d, acc_s = acc_d[keep], acc_s[keep]
    if acc_d.size == 0:
        return acc_d, acc_s
    kk = min(k, acc_d.size)
    order = np.lexsort((acc_d, -acc_s))[:kk]
    return acc_d[order], acc_s[order]


def _intersect_one(lists: ShardLists, qterms: list[tuple[int, float]],
                   k: int) -> tuple[np.ndarray, np.ndarray]:
    """Exact shard-local conjunctive top-k (the caller guarantees every raw
    query term is present in this shard). Candidate generation intersects
    smallest list first (cheap); SCORING then sums in the query's global
    processing order so float ties resolve identically across shards."""
    ordered = sorted(qterms, key=lambda x: (lists.size(x[0]), x[0]))
    cand_d: np.ndarray | None = None
    for tid, _coef in ordered:
        d, _w = lists.get(tid)
        if cand_d is None:
            cand_d = d
            continue
        if cand_d.size == 0 or d.size == 0:
            cand_d = cand_d[:0]
            break
        pos = np.minimum(np.searchsorted(d, cand_d), d.size - 1)
        cand_d = cand_d[d[pos] == cand_d]
    if cand_d is None or cand_d.size == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64)
    cand_s = np.zeros(cand_d.size, dtype=np.float64)
    for tid, coef in qterms:  # global fixed order — candidates ⊆ every list
        d, wb = lists.get(tid)
        pos = np.searchsorted(d, cand_d)
        cand_s += coef * wb[pos]
    kk = min(k, cand_d.size)
    order = np.lexsort((cand_d, -cand_s))[:kk]
    return cand_d[order], cand_s[order]


def score_shard_queries(
    pdf: pd.DataFrame,
    qmeta: dict[str, list[tuple[int, float]]],
    nq_map: dict[str, int],
    avgdl: float,
    k: int,
    prune: bool = True,
    conjunctive: bool = False,
    filter_ids: np.ndarray | None = None,
    exclude_ids: np.ndarray | None = None,
) -> pd.DataFrame:
    """Score EVERY query of the batch against one doc shard's matched
    blocks; emit ≤ k exact candidates per query. Queries iterate in sorted
    qid order (determinism is data-defined, not partitioning-defined)."""
    if not len(pdf):
        return _empty_partial()
    lists = ShardLists(pdf, avgdl, filter_ids, exclude_ids)
    out_q: list[np.ndarray] = []
    out_d: list[np.ndarray] = []
    out_s: list[np.ndarray] = []
    for qid in sorted(qmeta):
        present = [(tid, coef) for tid, coef in qmeta[qid] if tid in lists]
        if not present:
            continue
        if conjunctive:
            if len(present) < nq_map[qid]:
                continue  # a query term has no postings in this doc shard
            d, s = _intersect_one(lists, present, k)
        else:
            d, s = _score_one(lists, present, k, prune)
        if d.size:
            out_q.append(np.full(d.size, qid, dtype=object))
            out_d.append(d)
            out_s.append(s)
    if not out_d:
        return _empty_partial()
    return pd.DataFrame({"query_id": np.concatenate(out_q),
                         "doc_id": np.concatenate(out_d),
                         "score": np.concatenate(out_s)})


def _salt_file_map(files: list[str]) -> dict[int, str]:
    """salt → its single postings file, parsed from the ``salt=<s>/``
    partition directories of a salt_v3 layout (one file per salt, verified
    at build time before the layout tag is stamped)."""
    import re
    out: dict[int, str] = {}
    for f in files:
        m = re.search(r"salt=(\d+)/", f)
        if m is not None:
            out[int(m.group(1))] = f
    return out


def shard_expr(doc_id_col, doc_shards: int):
    """The doc-shard assignment expression — MUST match the build-side salt
    (index/builder.py merge_index)."""
    return F.pmod(F.xxhash64(doc_id_col.cast("long")),
                  F.lit(doc_shards)).cast("int")


def merge_topk(partial: DataFrame, k: int) -> DataFrame:
    """Global merge of per-shard candidates: D·k tiny rows per query."""
    from colbert_live_spark.operators.bm25 import topk
    return topk(partial, k)


# ------------------------------------------------- low-latency local serving

# index_dir -> (meta_text, hot-term cache {term: (tid, idf) | None}, avgdl).
# ``None`` entries are negative hits (term absent from the index) so
# repeated unknown-term queries don't re-read the dictionary. The per-index
# cache is an LRU bounded at _DICT_CACHE_MAX entries (positive AND negative
# alike — an adversarial stream of distinct absent terms must not grow
# driver memory without bound, advice r4); evicted terms simply fall back
# to the point-lookup path on their next appearance.
_DICT_CACHE: dict[str, tuple[str, dict, float]] = {}
_DICT_CACHE_MAX = 65536  # ~hot web working set; ≈4 MB of (term, id, idf)


def _local_dict(index_dir: str, terms: list[str]) -> tuple[dict, float]:
    """({term -> (term_id, idf) | None for each requested term}, avgdl).

    Scale shape: this NEVER loads the dictionary table — cache misses go
    through the same row-group-pruned pyarrow point-lookup as the cluster
    path (:func:`_dict_point_lookup`), so driver memory holds only the
    hot-term working set, not the 10^8-term web vocabulary. The cache is
    validated against the index's ``_INDEX_META.json`` content on every
    call (one tiny file read): if the index at this path was rebuilt by a
    long-lived serving process, term_ids may have been reassigned, and
    applying stale entries to freshly-read postings would silently
    mis-score. Identical meta content implies the same deterministic build
    inputs, hence the same dictionary."""
    from colbert_live_spark.index import fsio
    meta_text = fsio.read_text(f"{index_dir}/_INDEX_META.json")
    hit = _DICT_CACHE.get(index_dir)
    if hit is None or hit[0] != meta_text:
        meta = json.loads(meta_text)
        hit = (meta_text, {}, float(meta["avgdl"]))
        _DICT_CACHE[index_dir] = hit
    _, cache, avgdl = hit
    misses = [t for t in terms if t not in cache]
    if misses:
        found = _dict_point_lookup(index_dir, misses)
        for t in misses:
            cache[t] = found.get(t)  # None = negative cache entry
    out = {}
    for t in terms:
        # LRU touch: dicts iterate in insertion order, so re-inserting a
        # hit moves it to the back; eviction pops the front (oldest)
        v = cache.pop(t)
        cache[t] = v
        out[t] = v
    while len(cache) > _DICT_CACHE_MAX:
        cache.pop(next(iter(cache)))
    return out, avgdl


def wand_search_local(
    index_dir: str,
    queries: list[tuple[str, str]],
    k: int = 10,
    prune: bool = True,
    conjunctive: bool = False,
    filter_ids=None,
) -> pd.DataFrame:
    """Low-latency serving mode: score on the driver with ZERO Spark jobs —
    the answer to "a user issues one query and waits". The dictionary is
    cached in-process; matched blocks are read via pyarrow with a term_id
    predicate (pushed to parquet row-group pruning, same pruning the
    cluster path gets); scoring reuses the exact shard scorer as one
    logical shard, so results are identical to :func:`wand_search`
    (tested). Appropriate while Σ matched-list bytes fit one process —
    p50 ≈ tens of ms vs the ~1 s Spark job round trip; beyond that, use
    the batched cluster path. Reference cost-model analog:
    O(log n) probe + O(candidates) rescore, colbert_live.py:167-169."""
    import pyarrow.dataset as ds

    from colbert_live_spark.index import fsio

    all_terms = sorted({t for _, q in queries for t in py_tokenize(q)})
    dct, avgdl = _local_dict(index_dir, all_terms)
    qmeta, nq_map = build_qmeta(queries, dct.get)
    term_ids = {tid for terms in qmeta.values() for tid, _ in terms}
    empty = pd.DataFrame({"query_id": pd.array([], dtype="str"),
                          "rank": pd.array([], dtype="int32"),
                          "doc_id": pd.array([], dtype="int64"),
                          "score": pd.array([], dtype="float64")})
    if not qmeta:
        return empty
    _pfs, _ppath = fsio.resolve(f"{index_dir}/postings")
    dataset = ds.dataset(_ppath, format="parquet", filesystem=_pfs)
    blocks = dataset.to_table(
        filter=pruning_isin("term_id", term_ids)).to_pandas()
    fids = None
    if filter_ids is not None:
        # accept any iterable of ids (set/list/array — the oracle-side
        # filter API is a set, so mirror that tolerance)
        fids = np.unique(np.fromiter((int(x) for x in filter_ids),
                                     dtype=np.int64))
    partial = score_shard_queries(blocks, qmeta, nq_map, avgdl, k,
                                  prune=prune, conjunctive=conjunctive,
                                  filter_ids=fids)
    if not len(partial):
        return empty
    out = []
    for qid, g in partial.groupby("query_id", sort=True):
        order = np.lexsort((g["doc_id"].to_numpy(),
                            -g["score"].to_numpy()))[:k]
        gg = g.iloc[order].reset_index(drop=True)
        gg.insert(1, "rank", np.arange(1, len(gg) + 1, dtype=np.int32))
        out.append(gg)
    return pd.concat(out, ignore_index=True)


def wand_search(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[str, str]],
    k: int = 10,
    prune: bool = True,
    conjunctive: bool = False,
    doc_filter: DataFrame | None = None,
) -> DataFrame:
    """Batched top-k over a built index. Returns
    (query_id, rank, doc_id, score). ``conjunctive=True`` switches to
    posting-list-intersection semantics (AND across query terms); it
    composes with ``doc_filter`` (intersection ∩ filter).

    ``doc_filter``: optional single-column (doc_id) DataFrame of permitted
    docs — the composable metadata predicate. It is distributed end-to-end:
    filter ids shuffle by the same doc-shard key as the index, so nothing
    is ever collected to the driver (reference analog: tag filter inside
    the ANN scan, `example/cmdline/db.py:82-88`; corpus statistics stay
    GLOBAL, matching the reference's semantics).

    Topology: on a ``salt_v3`` index (every doc shard's blocks wholly
    inside one postings file — verified at build time) NO path ever
    shuffles block bytes:
    - unfiltered: ONE TASK PER FILE — each task pyarrow-reads its own file
      with the term_id predicate pushed to row-group pruning, scores all
      queries, and emits ≤ k candidates per query;
    - filtered: the filter ids (8-byte rows — the minimum possible shuffle)
      group by their doc shard; each shard's group task reads that shard's
      ONE postings file directly and scores under the filter. A shard with
      no permitted ids is never read at all (filter-directed pruning).
    Non-salt_v3 layouts fall back to the groupBy(salt) / cogroup topology
    (blocks shuffle once per batch — correct, but the old scaling cost)."""
    from colbert_live_spark.index import fsio
    meta = json.loads(fsio.read_text(f"{index_dir}/_INDEX_META.json"))
    avgdl = float(meta["avgdl"])
    doc_shards = meta.get("doc_shards")
    if doc_shards is None:
        raise ValueError(
            f"{index_dir} uses the pre-doc-shard layout (no 'doc_shards' in "
            "_INDEX_META.json); rebuild the index with the current builder")

    matched = _matched_terms(spark, index_dir, queries)
    qmeta, nq_map = build_qmeta(queries, matched.get)
    if not qmeta:
        return spark.createDataFrame([], OUT_SCHEMA)
    term_ids = sorted({tid for terms in qmeta.values() for tid, _ in terms})
    bc = spark.sparkContext.broadcast((qmeta, nq_map))

    if meta.get("layout") == "salt_v3":
        files = fsio.list_files(f"{index_dir}/postings", ".parquet")
        if not files:
            return spark.createDataFrame([], OUT_SCHEMA)

        if doc_filter is None:
            # one row per file, one PARTITION per file (parallelize slices
            # the list evenly) → mapInPandas runs one scoring task per file
            # with no shuffle anywhere before the tiny D·k-per-query merge
            fdf = spark.createDataFrame(
                spark.sparkContext.parallelize([(f,) for f in files],
                                               len(files)),
                "path string")

            def run_files(it):
                import pyarrow.dataset as pads
                qm, nq = bc.value
                for pdf in it:
                    for path in pdf["path"]:
                        fs, p = fsio.resolve(path)
                        tab = (pads.dataset(p, format="parquet",
                                            filesystem=fs)
                               .to_table(filter=pruning_isin(
                                   "term_id", term_ids)))
                        out = score_shard_queries(tab.to_pandas(), qm, nq,
                                                  avgdl, k, prune,
                                                  conjunctive)
                        if len(out):
                            yield out

            partial = fdf.mapInPandas(run_files, schema=PARTIAL_SCHEMA)
            return merge_topk(partial, k)

        # filtered fast path: group the PERMITTED ids by doc shard (the only
        # Exchange — id rows, never block bytes); each group task reads its
        # shard's single postings file via pyarrow. A doc can only score in
        # its own shard, so shards absent from the filter contribute nothing
        # and are skipped entirely.
        salt_files = _salt_file_map(files)
        fdf = (doc_filter
               .select(F.col(doc_filter.columns[0]).cast("long")
                       .alias("doc_id"))
               .withColumn("shard", shard_expr(F.col("doc_id"), doc_shards)))

        def run_salt(key: tuple, filt_pdf: pd.DataFrame) -> pd.DataFrame:
            import pyarrow.dataset as pads
            qm, nq = bc.value
            path = salt_files.get(int(key[0]))
            if path is None:
                return _empty_partial()
            fs, p = fsio.resolve(path)
            tab = (pads.dataset(p, format="parquet", filesystem=fs)
                   .to_table(filter=pruning_isin("term_id", term_ids)))
            fids = np.unique(filt_pdf["doc_id"].to_numpy(np.int64))
            return score_shard_queries(tab.to_pandas(), qm, nq, avgdl, k,
                                       prune, conjunctive, filter_ids=fids)

        partial = fdf.groupBy("shard").applyInPandas(
            run_salt, schema=PARTIAL_SCHEMA)
        return merge_topk(partial, k)

    postings = (spark.read.parquet(f"{index_dir}/postings")
                .filter(F.col("term_id").isin(term_ids)))

    if doc_filter is not None:
        fdf = doc_filter.select(
            F.col(doc_filter.columns[0]).cast("long").alias("doc_id"))
        fdf = fdf.withColumn("shard", shard_expr(F.col("doc_id"), doc_shards))

        def run2(blocks_pdf: pd.DataFrame,
                 filt_pdf: pd.DataFrame) -> pd.DataFrame:
            qm, nq = bc.value
            fids = np.unique(filt_pdf["doc_id"].to_numpy(np.int64))
            return score_shard_queries(blocks_pdf, qm, nq, avgdl, k, prune,
                                       conjunctive, filter_ids=fids)

        partial = (postings.groupBy("salt")
                   .cogroup(fdf.groupBy("shard"))
                   .applyInPandas(run2, schema=PARTIAL_SCHEMA))
    else:
        def run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            qm, nq = bc.value
            return score_shard_queries(pdf, qm, nq, avgdl, k, prune,
                                       conjunctive)

        partial = postings.groupBy("salt").applyInPandas(
            run, schema=PARTIAL_SCHEMA)
    return merge_topk(partial, k)
