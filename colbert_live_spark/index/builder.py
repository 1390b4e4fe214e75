"""Distributed, resumable inverted-index build (SURVEY.md §7 stages 3-6).

The Spark re-expression of the reference's ingest path
(`example/bench/lotte.py:50-95`: batch → encode → bulk insert, resumable from
``start_ordinal`` `:81-83`, idempotence guard `:67-69`):

Stage 1 — ``build_runs``: input docs are split into commit groups (by input
file when available — the real-scale path where groups = ingest increments —
else by hash of doc id). Each group is one Spark job producing a sorted
posting run ``(term, doc_id, tf, dl)`` under ``runs/gid=N/`` plus a ledger row
(lineage: group id, files, row counts, postings/sec, bytes, wall ms). A killed
build resumes by anti-joining pending groups against the ledger — completed
groups are never re-read.

Stage 2 — ``merge_index``: one idempotent job (overwrite semantics):
dictionary with dense term ids + exact df/idf, head-term salting
(``n_salts = ceil(df / salt_rows)``), then the big merge-shuffle:
``repartitionByRange(term_id, salt, doc_id)`` + ``sortWithinPartitions`` +
streaming group-encode in ``mapInPandas`` → block-compressed term-sharded
postings, written sorted by term_id so parquet row-group stats prune
query-time term lookups.

Scale notes:
- the ONLY large shuffle is the range partition of runs; salting bounds the
  largest (term, salt) group to ~``salt_rows`` rows regardless of Zipf skew.
- the dictionary build shuffles one small row per distinct (term) — vocab,
  not corpus, sized.
- dense doc ids are taken from the input when present (our corpora provide
  them); ``assign_dense_ids`` provides the zipWithIndex-pattern fallback.
"""

from __future__ import annotations

import json
import math
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from colbert_live_spark.index import codec

RUN_SCHEMA = "term string, doc_id long, tf int, dl int"
BLOCK_SCHEMA = ("term_id long, salt int, block_id int, first_doc long, "
                "last_doc long, n int, max_weight double, "
                "docs binary, tfs binary, dls binary")
LEDGER_SCHEMA = ("gid int, stage string, n_docs long, n_postings long, "
                 "bytes long, wall_ms long, files string")


def _tokenized(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    from colbert_live_spark.functions.tokenize import tokenize_expr
    return docs.select(F.col(id_col).alias("doc_id"),
                       tokenize_expr(text_col).alias("tokens"))


def _runs_from_tokens(toks: DataFrame) -> DataFrame:
    return (toks.select("doc_id", F.size("tokens").alias("dl"),
                        F.explode("tokens").alias("term"))
                .groupBy("term", "doc_id", "dl")
                .agg(F.count(F.lit(1)).cast("int").alias("tf"))
                .select("term", "doc_id", "tf", "dl"))


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _parquet_rows(path: str) -> int:
    """Row count from parquet footers, driver-side (no Spark job)."""
    import pyarrow.parquet as pq
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return total


def _ledger_files(out_dir: str) -> list[str]:
    ledger = f"{out_dir}/ledger"
    if not os.path.isdir(ledger):
        return []
    return [os.path.join(ledger, f) for f in sorted(os.listdir(ledger))
            if f.endswith(".parquet")]


def completed_groups(spark: SparkSession, out_dir: str) -> set[int]:
    import pyarrow.parquet as pq
    done: set[int] = set()
    for f in _ledger_files(out_dir):
        t = pq.read_table(f, columns=["gid", "stage"]).to_pylist()
        done.update(r["gid"] for r in t if r["stage"] == "runs")
    return done


def _append_ledger(spark: SparkSession, out_dir: str, row: tuple) -> None:
    """Driver-side pyarrow append — the commit record must not cost a Spark
    job (it was 1-6s of fixed overhead per group as a Spark write). One file
    per commit keeps appends atomic (write temp + rename)."""
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(f"{out_dir}/ledger", exist_ok=True)
    names = [f.split(" ")[0] for f in LEDGER_SCHEMA.split(", ")]
    table = pa.table({n: [v] for n, v in zip(names, row)},
                     schema=pa.schema([
                         ("gid", pa.int32()), ("stage", pa.string()),
                         ("n_docs", pa.int64()), ("n_postings", pa.int64()),
                         ("bytes", pa.int64()), ("wall_ms", pa.int64()),
                         ("files", pa.string())]))
    tmp = f"{out_dir}/ledger/.tmp-{uuid.uuid4().hex}"
    pq.write_table(table, tmp)
    os.replace(tmp, f"{out_dir}/ledger/commit-{uuid.uuid4().hex}.parquet")


def build_runs(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_groups: int | None = None,
    fail_after_group: int | None = None,
) -> list[int]:
    """Stage 1. Returns the list of group ids processed in this invocation.

    ``fail_after_group`` is test hookery for the kill-and-resume fixture
    (FIXTURES.md §5): raise after committing that many groups.
    """
    files = sorted(docs.inputFiles())
    done = completed_groups(spark, out_dir)
    if files:
        if n_groups is None:
            n_groups = len(files)
        groups = {g: [f for i, f in enumerate(files) if i % n_groups == g]
                  for g in range(n_groups)}
        groups = {g: fl for g, fl in groups.items() if fl}
    else:
        n_groups = n_groups or 16
        groups = {g: None for g in range(n_groups)}

    processed: list[int] = []
    for gid in sorted(groups):
        if gid in done:
            continue
        t0 = time.time()
        if groups[gid] is not None:
            part = spark.read.schema(docs.schema).parquet(*groups[gid])
        else:
            part = docs.filter(
                F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_groups)) == gid)
        toks = _tokenized(part, id_col, text_col)
        run_path = f"{out_dir}/runs/gid={gid}"
        _runs_from_tokens(toks).write.mode("overwrite").parquet(run_path)
        # second pass re-tokenizes: cheaper than caching the token arrays
        toks.select("doc_id", F.size("tokens").alias("dl")).write.mode(
            "overwrite").parquet(f"{out_dir}/doclens/gid={gid}")
        # counts from parquet footers — driver-side, no Spark jobs
        n_docs = _parquet_rows(f"{out_dir}/doclens/gid={gid}")
        n_post = _parquet_rows(run_path)
        wall_ms = int((time.time() - t0) * 1000)
        _append_ledger(spark, out_dir, (
            gid, "runs", n_docs, n_post, _dir_bytes(run_path), wall_ms,
            json.dumps(groups[gid] or [])))
        processed.append(gid)
        if fail_after_group is not None and len(processed) >= fail_after_group:
            raise RuntimeError(f"injected failure after group {gid}")
    return processed


def _dense_term_ids(spark: SparkSession, terms: DataFrame,
                    n_parts: int) -> DataFrame:
    """(term, df) -> (term, df, term_id dense 0..V-1)."""
    from colbert_live_spark.index.ids import assign_dense_ids
    return assign_dense_ids(terms, "term", "term_id", n_parts)


def merge_index(
    spark: SparkSession,
    out_dir: str,
    n_shards: int = 16,
    salt_rows: int = 1_000_000,
    block_size: int = codec.BLOCK_SIZE,
    doc_meta: DataFrame | None = None,
) -> None:
    """Stage 2: runs → dictionary + compressed term-sharded postings + stats.

    ``salt_rows``: max postings per (term, salt) sub-list — the head-term
    skew bound (north rule). Sub-lists are doc-disjoint (salt = hash(doc_id)
    mod n_salts) and each is doc-sorted, so query-time treats them as
    independent sorted lists of the same term.
    """
    t0 = time.time()
    runs = (spark.read.option("recursiveFileLookup", "true")
            .parquet(f"{out_dir}/runs"))

    dstats = (spark.read.option("recursiveFileLookup", "true")
              .parquet(f"{out_dir}/doclens").select("doc_id", "dl"))
    if doc_meta is not None:
        dstats = dstats.join(doc_meta, "doc_id", "left")
    dstats.write.mode("overwrite").parquet(f"{out_dir}/docs")
    dstats = spark.read.parquet(f"{out_dir}/docs")

    st = dstats.agg(F.count(F.lit(1)).alias("n_docs"),
                    F.avg("dl").alias("avgdl")).collect()[0]
    n_docs, avgdl = st.n_docs, float(st.avgdl)
    # stats table written driver-side (single row — not worth a Spark job)
    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(f"{out_dir}/stats", exist_ok=True)
    pq.write_table(
        pa.table({"n_docs": [int(n_docs)], "avgdl": [avgdl]},
                 schema=pa.schema([("n_docs", pa.int64()),
                                   ("avgdl", pa.float64())])),
        f"{out_dir}/stats/stats.parquet")

    df_t = runs.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    dict_df = _dense_term_ids(spark, df_t, n_parts=max(4, n_shards))
    dict_df = dict_df.select(
        "term", "term_id", "df",
        F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5)
              / (F.col("df") + 0.5)).alias("idf"),
        F.greatest(F.lit(1), F.ceil(F.col("df") / F.lit(salt_rows)))
         .cast("int").alias("n_salts"))
    # few files (query-time dictionary point-lookups pay per-file overhead).
    # MUST be repartition, not coalesce: coalesce fuses into the id-assign
    # mapInPandas stage and changes TaskContext.partitionId() under it,
    # corrupting the dense-id offsets; repartition is a shuffle barrier.
    dict_df.repartition(max(2, n_shards // 8)).write.mode(
        "overwrite").parquet(f"{out_dir}/dict")
    # NOT re-read from disk: assign_dense_ids keeps its input persisted, so
    # reuse stays deterministic and we skip a read-back job
    dict_df = dict_df

    # The merge-shuffle: postings + term ids, salted, range-partitioned so
    # each (term_id, salt) group is contiguous and sorted by doc_id.
    tagged = (runs.join(F.broadcast(dict_df.select("term", "term_id",
                                                   "n_salts")), "term")
              .select("term_id",
                      F.pmod(F.xxhash64("doc_id"), F.col("n_salts"))
                       .cast("int").alias("salt"),
                      "doc_id", "tf", "dl"))
    # hash repartition, not repartitionByRange: the range sampler would scan
    # the whole join twice; hash keeps each (term_id, salt) group whole and
    # the salt bound keeps groups balanced under Zipf skew
    parted = (tagged.repartition(n_shards, "term_id", "salt")
                    .sortWithinPartitions("term_id", "salt", "doc_id"))

    def encode_partition(it):
        import numpy as np
        import pandas as pd
        buf: list[pd.DataFrame] = []
        cur_key: tuple | None = None

        def flush():
            if cur_key is None or not buf:
                return None
            g = pd.concat(buf, ignore_index=True) if len(buf) > 1 else buf[0]
            blocks = codec.encode_posting_list_columns(
                g["doc_id"].to_numpy(np.int64), g["tf"].to_numpy(np.int64),
                g["dl"].to_numpy(np.int64), avgdl, block_size)
            out = pd.DataFrame(blocks)
            out.insert(0, "salt", cur_key[1])
            out.insert(0, "term_id", cur_key[0])
            return out

        for pdf in it:
            if pdf.empty:
                continue
            keys = pdf[["term_id", "salt"]].to_numpy()
            # split the arrow batch at key-change boundaries
            change = np.flatnonzero((keys[1:] != keys[:-1]).any(axis=1)) + 1
            start = 0
            for end in list(change) + [len(pdf)]:
                seg = pdf.iloc[start:end]
                key = (int(seg["term_id"].iloc[0]), int(seg["salt"].iloc[0]))
                if cur_key is not None and key != cur_key:
                    flushed = flush()
                    if flushed is not None:
                        yield flushed
                    buf.clear()
                cur_key = key
                buf.append(seg)
                start = end
        flushed = flush()
        if flushed is not None:
            yield flushed

    blocks_df = parted.mapInPandas(encode_partition, schema=BLOCK_SCHEMA)
    blocks_df.write.mode("overwrite").parquet(f"{out_dir}/postings")

    n_blocks = _parquet_rows(f"{out_dir}/postings")
    _append_ledger(spark, out_dir, (
        -1, "merge", n_docs, n_blocks, _dir_bytes(f"{out_dir}/postings"),
        int((time.time() - t0) * 1000), "[]"))
    with open(f"{out_dir}/_INDEX_META.json", "w") as f:
        json.dump({"n_shards": n_shards, "salt_rows": salt_rows,
                   "block_size": block_size, "n_docs": int(n_docs),
                   "avgdl": avgdl}, f)


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_groups: int | None = None,
    n_shards: int = 16,
    salt_rows: int = 1_000_000,
    doc_meta: DataFrame | None = None,
) -> None:
    """Full build: checkpointed runs then merge. Safe to re-invoke after a
    failure — completed run groups are skipped via the ledger."""
    build_runs(spark, docs, out_dir, id_col, text_col, n_groups)
    merge_index(spark, out_dir, n_shards=n_shards, salt_rows=salt_rows,
                doc_meta=doc_meta)
