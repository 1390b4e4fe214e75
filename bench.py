"""Benchmark harness — one JSON line on stdout.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]. Each query is forced with a count() so the full
plan executes. Scaling-efficiency evidence (N vs 4N cores) lives in
bench_scaling.py → BENCH/BASELINE.md.

Noise discipline (this host shows 3-4x wall-clock noise under neighbor
load — BENCH/ANALYSIS.md):
- the compressed index builds into a FRESH mktemp dir every run, so
  ``index_build`` measures a real build, never a /tmp cache hit;
- every query runs ``SPARK_GRAFT_BENCH_REPEATS`` (default 3) times,
  INTERLEAVED round-robin (a noise burst hits one repeat of many queries
  instead of all repeats of one), and the reported time is the MIN across
  repeats with the max-min spread alongside — min-of-N is the standard
  noise-floor estimator for a deterministic workload;
- the headline total is the sum of per-query minima plus the (single,
  honest) index build.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    n_repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    # fresh index root: the build below must be a real build every run
    idx_root = tempfile.mkdtemp(prefix="bench_idx_")
    os.environ["SPARK_GRAFT_INDEX_ROOT"] = idx_root
    try:
        _run(sf_dir, sf, n_repeats, idx_root)
    finally:
        # a query raising mid-bench must not leak a full index build under
        # /tmp per failed run (advice r3)
        shutil.rmtree(idx_root, ignore_errors=True)


def _run(sf_dir: str, sf: str, n_repeats: int, idx_root: str) -> None:
    from colbert_live_spark.session import get_spark
    from colbert_live_spark import entry_queries as eq

    spark = get_spark("bench")
    # warm the JVM + parquet footers so per-query numbers measure the engine
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    bench_queries = [
        "bm25_topk_wand",
        "postings_build",
        "bm25_topk",
        "bm25_conjunctive",
        "bm25_lang_filtered",
        "bm25_filtered_wand",
        "bm25_phrase",
        "bm25_phrase_wand",
        "doc_keywords",
        "rrf_fusion",
        "topk_payload",
        "dedup_exact",
        "ngram_jaccard",
        "minhash_lsh",
        "simhash_pairs",
        "knn_bruteforce",
        "knn_ivf",
        "knn_ivf_sampled",
        "maxsim_topk",
        "maxsim_topk_ivf",
        "maxsim_topk_ivf_capped",
        "text_stats",
        "fingerprint",
        "embedding_neardup_lsh",
        "dedup_keep",
        "media_histogram",
    ]
    qmap = eq.query_map()
    bench_queries = [q for q in bench_queries if q in qmap]

    # compressed-index path: build once into the fresh root (its own
    # honest metric), then the serving queries repeat against it
    t0 = time.time()
    eq.built_index(spark, sf_dir)
    index_build = round(time.time() - t0, 3)
    print(f"# index_build: {index_build}s (fresh dir {idx_root})",
          file=sys.stderr)

    samples: dict[str, list[float]] = {q: [] for q in bench_queries}
    rows_seen: dict[str, int] = {}
    for rep in range(n_repeats):
        for name in bench_queries:
            t0 = time.time()
            n = qmap[name](spark, sf_dir).count()
            dt = time.time() - t0
            samples[name].append(dt)
            rows_seen[name] = n
            print(f"# [{rep + 1}/{n_repeats}] {name}: {n} rows "
                  f"in {dt:.3f}s", file=sys.stderr)

    timings = {"index_build": index_build}
    spread: dict[str, float] = {}
    total = index_build
    for name in bench_queries:
        s = samples[name]
        timings[name] = round(min(s), 3)
        spread[name] = round(max(s) - min(s), 3)
        total += min(s)

    # approximation quality, reported alongside speed: recall@10 of each
    # ANN path vs its exact counterpart
    def topk_sets(name, id_field):
        out = {}
        for r in qmap[name](spark, sf_dir).collect():
            out.setdefault(r.query_id, set()).add(getattr(r, id_field))
        return out

    def recall(approx_name, exact_name, id_field):
        exact = topk_sets(exact_name, id_field)
        approx = topk_sets(approx_name, id_field)
        rs = [len(exact[q] & approx.get(q, set())) / len(exact[q])
              for q in exact if exact[q]]
        return round(sum(rs) / len(rs), 4) if rs else None

    recall10 = recall("knn_ivf", "knn_bruteforce", "vec_id")
    recall10_sampled = recall("knn_ivf_sampled", "knn_bruteforce", "vec_id")
    maxsim_recall10 = recall("maxsim_topk_ivf", "maxsim_topk", "doc_id")
    maxsim_capped_recall10 = recall("maxsim_topk_ivf_capped", "maxsim_topk",
                                    "doc_id")

    # the capped rescore on the CLUSTERED corpus derivation: exact baseline
    # computed on the same transformed vectors (not a queries() entry — the
    # entry oracle already proves the capped pipeline; this is the recall
    # evidence that the cap's cost is the uniform corpus, not the cut)
    from colbert_live_spark import entry_queries_pipeline as pl
    from colbert_live_spark.operators import similarity
    cemb = pl.clustered_emb(pl._emb(spark, sf_dir))
    cl_exact = {}
    for r in similarity.maxsim_topk(cemb, pl.MAXSIM_QUERIES, pl.MAXSIM_K,
                                    tokens_per_doc=pl.MAXSIM_T).collect():
        cl_exact.setdefault(r.query_id, set()).add(r.doc_id)
    cl_approx = topk_sets("maxsim_capped_clustered", "doc_id")
    crs = [len(cl_exact[q] & cl_approx.get(q, set())) / len(cl_exact[q])
           for q in cl_exact if cl_exact[q]]
    maxsim_capped_clustered_recall10 = (round(sum(crs) / len(crs), 4)
                                        if crs else None)
    print(f"# recall@10 vs exact: knn_ivf={recall10} "
          f"knn_ivf_sampled={recall10_sampled} "
          f"maxsim_ivf={maxsim_recall10} "
          f"maxsim_ivf_capped={maxsim_capped_recall10} "
          f"maxsim_capped_clustered={maxsim_capped_clustered_recall10}",
          file=sys.stderr)

    # low-latency local serving mode p50 (zero Spark jobs; see wand.py)
    from colbert_live_spark.operators.wand import wand_search_local
    from colbert_live_spark.queryset import DOC_QUERIES
    idx = eq.built_index(spark, sf_dir)
    wand_search_local(idx, DOC_QUERIES[:1])  # warm dict cache
    lats = []
    for qid, qtext in DOC_QUERIES[:8]:
        t0 = time.time()
        wand_search_local(idx, [(qid, qtext)])
        lats.append(time.time() - t0)
    lats.sort()
    local_p50 = round(lats[len(lats) // 2], 4)
    print(f"# local-mode single-query p50: {local_p50}s", file=sys.stderr)

    # segmented (live-root) local serving p50 — same zero-Spark-job mode
    # over the two-segment root the incremental entries build
    from colbert_live_spark.index.segments import segment_search_local
    live_root = eq.built_live_root(spark, sf_dir)
    segment_search_local(live_root, DOC_QUERIES[:1])  # warm footers
    slats = []
    for qid, qtext in DOC_QUERIES[:8]:
        t0 = time.time()
        segment_search_local(live_root, [(qid, qtext)])
        slats.append(time.time() - t0)
    slats.sort()
    seg_local_p50 = round(slats[len(slats) // 2], 4)
    print(f"# segmented local-mode single-query p50: {seg_local_p50}s",
          file=sys.stderr)

    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "repeats": n_repeats,
        "knn_ivf_recall_at_10": recall10,
        "knn_ivf_sampled_recall_at_10": recall10_sampled,
        "maxsim_ivf_recall_at_10": maxsim_recall10,
        "maxsim_ivf_capped_recall_at_10": maxsim_capped_recall10,
        "maxsim_capped_clustered_recall_at_10":
            maxsim_capped_clustered_recall10,
        "local_query_p50_s": local_p50,
        "segmented_local_query_p50_s": seg_local_p50,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
