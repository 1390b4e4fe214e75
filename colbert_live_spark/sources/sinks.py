"""Sinks and the eval harness (reference S9/A6 analogs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def write_rankings_tsv(topk: DataFrame, path: str) -> None:
    """qid \\t doc_id \\t rank \\t score — the reference's rankings sink
    (`example/bench/lotte.py:111-116`), rank recomputed defensively."""
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    (topk.withColumn("rank", F.row_number().over(w))
     .select(F.col("query_id").alias("qid"), "doc_id", "rank", "score")
     .write.mode("overwrite").option("sep", "\t").csv(path))


def success_at_k(topk: DataFrame, qrels: DataFrame, k: int = 5) -> DataFrame:
    """(query_id, success) — 1 if any relevant doc in top-k; the
    Success@k eval (`example/bench/evaluate_lotte_rankings.py:27-44`)."""
    hits = (topk.filter(F.col("rank") <= k)
            .join(qrels, ["query_id", "doc_id"], "left_semi")
            .select("query_id").distinct()
            .withColumn("success", F.lit(1)))
    return (topk.select("query_id").distinct()
            .join(hits, "query_id", "left")
            .select("query_id", F.coalesce("success", F.lit(0)).alias("success")))
