"""In-sandbox evidence for the `pre_encode` merge-shuffle mode (r4 verdict
ask #1a): the mode targets NETWORK-shuffle clusters, where merge-phase
shuffle bytes cross NICs, but this sandbox's local-mode shuffle never
leaves the page cache, so the prior A/B (raw 120s vs pack 237s @8c, round
4) measures the pack CPU cost while pricing the moved bytes at ~0.

Two measurements per {raw, pre_encode} arm, fresh JVM each trial,
interleaved arms (host noise is one-sided):

1. **Merge-phase shuffle WRITE bytes** (Spark REST API, stage-level
   `shuffleWriteBytes` delta across the merge phase) with the production
   lz4 codec ON — the actual volume a cluster moves across NICs. The
   raw/pre ratio is the speedup bound when the network is the
   bottleneck: at NIC bandwidth B and per-node shuffle volume V, the
   merge's network floor is V/B and pre_encode divides V by the measured
   ratio regardless of its extra CPU passes (which overlap the wire).
2. **Wall-clock A/B with shuffle compression OFF**
   (`spark.shuffle.compress=false`, `spark.shuffle.spill.compress=false`)
   — the closest local proxy for a byte-constrained shuffle path: every
   shuffled byte now hits serializer + disk/page-cache at full width, so
   if pre_encode's byte reduction outweighs its pack cost in THIS
   configuration, the crossover regime is demonstrated in-sandbox.

Usage:  python bench_pre_encode.py [--rows 1000000] [--cores 8]
            [--repeats 2] [--out BENCH/pre_encode_evidence.json]

Writes one JSON with per-trial phase walls + merge shuffle bytes and the
derived ratios. Corpus parquet is reused from bench_scaling's cache
(/tmp/cls_bench_corpus_<rows>) or generated if absent.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

N_GROUPS = 2
N_SHARDS = 32


def _rest_shuffle_write_bytes(spark) -> int:
    """Sum shuffleWriteBytes over all completed stages so far (REST API)."""
    import urllib.request
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        stages = json.load(r)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def worker(rows: int, cores: int, pre: bool, compress: bool,
           out_json: str) -> None:
    from colbert_live_spark.index.builder import build_runs, merge_index
    from colbert_live_spark.session import get_spark

    corpus = f"/tmp/cls_bench_corpus_{rows}"
    spark = get_spark(
        f"pre-encode-{'pre' if pre else 'raw'}", cores=cores,
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "true",   # REST API for stage byte counters
            "spark.shuffle.compress": str(compress).lower(),
            "spark.shuffle.spill.compress": str(compress).lower(),
        })
    if not os.path.exists(corpus):
        from colbert_live_spark.index.ids import assign_dense_ids
        from colbert_live_spark.sources.webpages import generate_webpages_fast
        assign_dense_ids(generate_webpages_fast(spark, rows, 128), "url",
                         n_parts=128).write.mode("overwrite").parquet(corpus)
    docs = spark.read.parquet(corpus)
    docs.count()  # warm JVM + footers

    idx = f"/tmp/cls_pre_idx_{cores}_{int(pre)}_{int(compress)}_{rows}"
    import shutil
    shutil.rmtree(idx, ignore_errors=True)

    t0 = time.time()
    build_runs(spark, docs, idx, n_groups=N_GROUPS)
    t_runs = time.time() - t0
    sw_before = _rest_shuffle_write_bytes(spark)
    t1 = time.time()
    merge_index(spark, idx, n_shards=N_SHARDS, salt_rows=200_000,
                pre_encode=pre)
    t_merge = time.time() - t1
    sw_merge = _rest_shuffle_write_bytes(spark) - sw_before

    idx_bytes = sum(os.path.getsize(os.path.join(r, f))
                    for r, _, fs in os.walk(f"{idx}/postings") for f in fs)
    json.dump({
        "rows": rows, "cores": cores, "pre_encode": pre,
        "shuffle_compress": compress,
        "runs_wall_s": round(t_runs, 1), "merge_wall_s": round(t_merge, 1),
        "merge_shuffle_write_bytes": sw_merge, "index_bytes": idx_bytes,
    }, open(out_json, "w"))
    shutil.rmtree(idx, ignore_errors=True)
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--out", default="BENCH/pre_encode_evidence.json")
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--pre", type=int, default=0)
    ap.add_argument("--compress", type=int, default=1)
    ap.add_argument("--out-json", default="")
    args = ap.parse_args()

    if args.worker:
        worker(args.rows, args.cores, bool(args.pre), bool(args.compress),
               args.out_json)
        return

    trials = []
    # interleave arms within each repeat; measurement 1 (compress on, byte
    # ratio) then measurement 2 (compress off, wall A/B)
    for compress in (1, 0):
        for rep in range(args.repeats):
            for pre in (0, 1):
                oj = f"/tmp/cls_pre_out_{compress}_{rep}_{pre}.json"
                cmd = [sys.executable, __file__, "--worker",
                       "--rows", str(args.rows), "--cores", str(args.cores),
                       "--pre", str(pre), "--compress", str(compress),
                       "--out-json", oj]
                print(f"# trial compress={compress} rep={rep} pre={pre}",
                      file=sys.stderr, flush=True)
                subprocess.run(cmd, check=True)
                t = json.load(open(oj))
                print(json.dumps(t), flush=True)
                trials.append(t)

    def best_merge(pre: bool, compress: bool) -> float:
        return min(t["merge_wall_s"] for t in trials
                   if t["pre_encode"] == pre
                   and t["shuffle_compress"] == compress)

    def bytes_of(pre: bool, compress: bool) -> int:
        # byte counters are deterministic per arm; take min (identical mod
        # AQE nondeterminism)
        return min(t["merge_shuffle_write_bytes"] for t in trials
                   if t["pre_encode"] == pre
                   and t["shuffle_compress"] == compress)

    summary = {
        "rows": args.rows, "cores": args.cores, "repeats": args.repeats,
        "trials": trials,
        "merge_shuffle_bytes_raw_lz4": bytes_of(False, True),
        "merge_shuffle_bytes_pre_lz4": bytes_of(True, True),
        "wire_byte_ratio_lz4": round(
            bytes_of(False, True) / max(1, bytes_of(True, True)), 3),
        "merge_wall_raw_nocompress_s": best_merge(False, False),
        "merge_wall_pre_nocompress_s": best_merge(True, False),
        "merge_wall_raw_lz4_s": best_merge(False, True),
        "merge_wall_pre_lz4_s": best_merge(True, True),
    }
    json.dump(summary, open(args.out, "w"), indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "trials"}))


if __name__ == "__main__":
    main()
