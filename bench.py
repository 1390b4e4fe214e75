"""Benchmark harness — one JSON line on stdout.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]. Each query is forced with a count()/collect so
the full plan executes. Scaling-efficiency evidence (N vs 4N cores) lives in
bench_scaling.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    from colbert_live_spark.session import get_spark
    from colbert_live_spark import entry_queries as eq

    spark = get_spark("bench")
    # warm the JVM + parquet footers so per-query numbers measure the engine
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    bench_queries = [
        "postings_build",
        "bm25_topk",
        "bm25_conjunctive",
        "bm25_lang_filtered",
        "bm25_filtered_wand",
        "rrf_fusion",
        "topk_payload",
        "dedup_exact",
        "ngram_jaccard",
        "minhash_lsh",
        "simhash_pairs",
        "knn_bruteforce",
        "knn_ivf",
        "text_stats",
        "fingerprint",
        "embedding_neardup_lsh",
        "dedup_keep",
        "media_histogram",
    ]
    qmap = eq.query_map()
    timings: dict[str, float] = {}
    total = 0.0

    # compressed-index path: build once (its own metric), then serve
    t0 = time.time()
    eq.built_index(spark, sf_dir)
    timings["index_build"] = round(time.time() - t0, 3)
    total += timings["index_build"]
    t0 = time.time()
    n = qmap["bm25_topk_wand"](spark, sf_dir).count()
    timings["bm25_topk_wand"] = round(time.time() - t0, 3)
    total += timings["bm25_topk_wand"]
    print(f"# index_build: {timings['index_build']}s; "
          f"bm25_topk_wand: {n} rows in {timings['bm25_topk_wand']}s",
          file=sys.stderr)

    for name in bench_queries:
        if name not in qmap:
            continue
        t0 = time.time()
        df = qmap[name](spark, sf_dir)
        n = df.count()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {n} rows in {dt:.3f}s", file=sys.stderr)

    # IVF quality: recall@10 vs brute force (approximation quality of the
    # deterministic k-means IVF path, reported alongside its speed)
    def topk_sets(name):
        out = {}
        for r in qmap[name](spark, sf_dir).collect():
            out.setdefault(r.query_id, set()).add(r.vec_id)
        return out
    brute, ivf = topk_sets("knn_bruteforce"), topk_sets("knn_ivf")
    recalls = [len(brute[q] & ivf.get(q, set())) / len(brute[q])
               for q in brute if brute[q]]
    recall10 = round(sum(recalls) / len(recalls), 4) if recalls else None
    print(f"# knn_ivf recall@10 vs brute force: {recall10}", file=sys.stderr)

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

    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "knn_ivf_recall_at_10": recall10,
        "local_query_p50_s": local_p50,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
