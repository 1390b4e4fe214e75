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

    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
