"""Incremental (live-update) index maintenance via segments + compaction.

The reference's defining property is live updates: rows inserted into the
backing DB are immediately searchable because the index is update-in-place
(README.md:3-4,21-23; inserts `example/cmdline/db.py:95-105`). The Spark
analog is merge-on-read segments — the Lucene/LSM pattern:

- ``add_segment``: each ingest batch becomes an independent mini-index
  (built with the same two-stage builder), registered in a root MANIFEST.
  Doc ids are made globally unique by a per-segment base offset.
- ``segment_search``: queries union all active segments' matched posting
  blocks; **corpus statistics (N, avgdl, df→idf) are computed globally
  across segments at query time**, so scores are exactly what a
  from-scratch rebuild would produce (rank-identity preserved under
  incremental ingest — tested). This works because blocks store the
  idf-free BM25 weight; idf multiplies in at query time.
- ``compact``: folds all segments' stage-1 runs into one new segment via
  the ordinary merge (the LSM compaction), then swaps the manifest.

Scale: a segment is the unit of ingest atomicity; query cost grows with
segment count only in the tiny dictionary-lookup phase (block reads stay
proportional to matched postings), and compaction bounds segment count.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from colbert_live_spark.functions.tokenize import py_tokenize
from colbert_live_spark.index.builder import build_index, merge_index
from colbert_live_spark.operators.wand import OUT_SCHEMA, score_query_blocks

MANIFEST = "MANIFEST.json"


def _read_manifest(root: str) -> dict:
    p = os.path.join(root, MANIFEST)
    if not os.path.exists(p):
        return {"segments": [], "next_doc_base": 0, "seq": 0}
    with open(p) as f:
        return json.load(f)


def _write_manifest(root: str, m: dict) -> None:
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(m, f)
    os.replace(tmp, os.path.join(root, MANIFEST))


def add_segment(
    spark: SparkSession,
    docs: DataFrame,
    root: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 4,
    salt_rows: int = 1_000_000,
) -> str:
    """Ingest one batch as a new segment; ``id_col`` values must be locally
    unique — they are offset by the manifest's next_doc_base for global
    uniqueness. Returns the segment name."""
    m = _read_manifest(root)
    base = m["next_doc_base"]
    seg = f"seg{m['seq']:05d}"
    seg_dir = os.path.join(root, "segments", seg)
    shifted = docs.withColumn(id_col, F.col(id_col) + F.lit(base))
    build_index(spark, shifted, seg_dir, id_col=id_col, text_col=text_col,
                n_shards=n_shards, salt_rows=salt_rows)
    with open(os.path.join(seg_dir, "_INDEX_META.json")) as f:
        meta = json.load(f)
    max_id = spark.read.parquet(f"{seg_dir}/docs").agg(
        F.max("doc_id")).collect()[0][0]
    m["segments"].append({"name": seg, "n_docs": meta["n_docs"],
                          "avgdl": meta["avgdl"], "doc_base": base,
                          "ts": int(time.time())})
    m["next_doc_base"] = int(max_id) + 1
    m["seq"] += 1
    _write_manifest(root, m)
    return seg


def _global_stats(m: dict) -> tuple[int, float]:
    n = sum(s["n_docs"] for s in m["segments"])
    total_dl = sum(s["avgdl"] * s["n_docs"] for s in m["segments"])
    return n, (total_dl / n if n else 0.0)


def segment_search(
    spark: SparkSession,
    root: str,
    queries: list[tuple[str, str]],
    k: int = 10,
    prune: bool = True,
) -> DataFrame:
    """Batched top-k across all active segments, scores identical to a
    monolithic index over the union of all ingested docs."""
    import math

    import pandas as pd

    m = _read_manifest(root)
    if not m["segments"]:
        return spark.createDataFrame([], OUT_SCHEMA)
    n_docs, avgdl = _global_stats(m)

    all_terms = sorted({t for _, q in queries for t in py_tokenize(q)})
    # per-segment dictionary lookups (tiny: |terms| rows each)
    seg_dicts: dict[str, dict[str, tuple[int, int]]] = {}
    global_df: dict[str, int] = {}
    for s in m["segments"]:
        d = (spark.read.parquet(f"{root}/segments/{s['name']}/dict")
             .filter(F.col("term").isin(all_terms))
             .select("term", "term_id", "df").collect())
        seg_dicts[s["name"]] = {r.term: (r.term_id, r.df) for r in d}
        for r in d:
            global_df[r.term] = global_df.get(r.term, 0) + r.df

    gterm_id = {t: i for i, t in enumerate(sorted(global_df))}
    idf = {t: math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           for t, df in global_df.items()}

    qrows = []  # (seg, local term_id) -> (query_id, qtf, global term, idf)
    for qid, qtext in queries:
        counts: dict[str, int] = {}
        for t in py_tokenize(qtext):
            counts[t] = counts.get(t, 0) + 1
        for term, qtf in sorted(counts.items()):
            if term not in global_df:
                continue
            for seg_name, d in seg_dicts.items():
                if term in d:
                    qrows.append((seg_name, d[term][0], qid, qtf,
                                  gterm_id[term], idf[term]))
    if not qrows:
        return spark.createDataFrame([], OUT_SCHEMA)
    qdf = spark.createDataFrame(
        qrows, "seg string, term_id long, query_id string, qtf int, "
               "gterm long, idf double")

    parts = []
    for s in m["segments"]:
        local_ids = [d[0] for d in seg_dicts[s["name"]].values()]
        if not local_ids:
            continue
        p = (spark.read.parquet(f"{root}/segments/{s['name']}/postings")
             .filter(F.col("term_id").isin(local_ids))
             .withColumn("seg", F.lit(s["name"])))
        parts.append(p)
    if not parts:
        return spark.createDataFrame([], OUT_SCHEMA)
    blocks = parts[0]
    for p in parts[1:]:
        blocks = blocks.unionByName(p)
    joined = (blocks.join(F.broadcast(qdf), ["seg", "term_id"])
              .drop("term_id").withColumnRenamed("gterm", "term_id"))

    def run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        return score_query_blocks(pdf, avgdl=avgdl, k=k, prune=prune)

    return joined.groupBy("query_id").applyInPandas(run, schema=OUT_SCHEMA)


def compact(spark: SparkSession, root: str, n_shards: int = 4,
            salt_rows: int = 1_000_000) -> str:
    """Fold all segments into one (runs are re-merged, doc ids preserved).

    Reuses every segment's checkpointed stage-1 runs — compaction never
    re-tokenizes. Old segments are dropped from the manifest (directories
    left for the caller/GC to remove)."""
    m = _read_manifest(root)
    assert m["segments"], "nothing to compact"
    seg = f"seg{m['seq']:05d}"
    seg_dir = os.path.join(root, "segments", seg)
    os.makedirs(seg_dir, exist_ok=True)
    for sub in ("runs", "doclens"):
        for s in m["segments"]:
            src = f"{root}/segments/{s['name']}/{sub}"
            for gid_dir in os.listdir(src):
                # no '=' in the name — it would be misread as a partition key
                dst = (f"{seg_dir}/{sub}/"
                       f"{s['name']}-{gid_dir.replace('gid=', 'g')}")
                shutil.copytree(f"{src}/{gid_dir}", dst)
    merge_index(spark, seg_dir, n_shards=n_shards, salt_rows=salt_rows)
    n_docs, avgdl = _global_stats(m)
    old = [s["name"] for s in m["segments"]]
    m["segments"] = [{"name": seg, "n_docs": n_docs, "avgdl": avgdl,
                      "doc_base": 0, "ts": int(time.time())}]
    m["seq"] += 1
    _write_manifest(root, m)
    return seg
