"""Supplementary measurement harness for the optimization round (guide
§1.4/§7.2). NOT the driver's bench — bench.py stays frozen; this file
exists so optimization evidence (noop-sink isolation, plan capture,
per-query repeats) can be produced without touching it.

Usage:
  python bench_extra.py plans <tag> [name ...]   # write plans/r06/<name>_<tag>.txt
  python bench_extra.py time [name ...]          # noop-sink min-of-N per query
  python bench_extra.py build                    # time built_index into a fresh dir

The noop sink computes every column of every row (guide §1.4) — unlike
bench.py's count(), which lets the optimizer prune; both numbers are
reported in OPTIMIZATION_r06.md where they differ materially.
"""
from __future__ import annotations

import json
import os
import sys
import time

BENCH_QUERIES = [
    "bm25_topk_wand", "postings_build", "bm25_topk", "bm25_conjunctive",
    "bm25_lang_filtered", "bm25_filtered_wand", "bm25_phrase",
    "bm25_phrase_wand", "doc_keywords", "rrf_fusion", "topk_payload",
    "dedup_exact", "ngram_jaccard", "minhash_lsh", "simhash_pairs",
    "knn_bruteforce", "knn_ivf", "knn_ivf_sampled", "maxsim_topk",
    "maxsim_topk_ivf", "maxsim_topk_ivf_capped", "text_stats", "fingerprint",
    "embedding_neardup_lsh", "dedup_keep", "media_histogram",
]


def _explain_str(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from colbert_live_spark.session import get_spark
    from colbert_live_spark import entry_queries as eq

    spark = get_spark("bench_extra")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warm
    qmap = eq.query_map()

    if mode == "build":
        import shutil
        import tempfile
        n = int(os.environ.get("BENCH_EXTRA_REPEATS", "3"))
        times = []
        for _ in range(n):
            idx_root = tempfile.mkdtemp(prefix="bx_idx_")
            os.environ["SPARK_GRAFT_INDEX_ROOT"] = idx_root
            eq._INDEX_CACHE.clear()
            t0 = time.time()
            eq.built_index(spark, sf_dir)
            times.append(round(time.time() - t0, 3))
            shutil.rmtree(idx_root, ignore_errors=True)
        print(json.dumps({"index_build_samples": times,
                          "min": min(times)}))
        return

    if mode == "plans":
        tag = sys.argv[2]
        names = sys.argv[3:] or BENCH_QUERIES
        os.makedirs("plans/r06", exist_ok=True)
        for name in names:
            df = qmap[name](spark, sf_dir)
            with open(f"plans/r06/{name}_{tag}.txt", "w") as f:
                f.write(_explain_str(df))
            print(f"# wrote plans/r06/{name}_{tag}.txt", file=sys.stderr)
        return

    names = sys.argv[2:] or BENCH_QUERIES
    n = int(os.environ.get("BENCH_EXTRA_REPEATS", "3"))
    out = {}
    samples: dict[str, list[float]] = {q: [] for q in names}
    for rep in range(n):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = qmap[name](spark, sf_dir)
            if mode == "count":  # bench.py's exact forcing methodology
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            samples[name].append(dt)
            print(f"# [{rep + 1}/{n}] {name}: {dt:.3f}s", file=sys.stderr)
            spark.sparkContext.setJobDescription(None)
    for name in names:
        s = samples[name]
        out[name] = {"min": round(min(s), 3),
                     "spread": round(max(s) - min(s), 3)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
