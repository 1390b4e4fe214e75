"""Similarity search over embedding columns — the vector-native analog of
the reference's core capability (per-token ANN top-n, `colbert_live/db/db.py:
10-23`; brute-force oracle `tests/db.py:29-39`).

- :func:`knn_bruteforce` — exact cosine top-k, all JVM-side (zip_with +
  aggregate in double); the correctness baseline, O(Q·N).
- :func:`knn_ivf` — deterministic IVF: fixed centroid subset, assign via
  argmin over centroids (broadcast), probe ``nprobe`` nearest lists. The
  scale path: the probe join touches only assigned clusters, so cost drops
  to O(Q·N·nprobe/C). Fully deterministic → exactly reproducible by the SQL
  oracle (it is an *approximation* of brute force, but a *deterministic
  function* of its inputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _vecd(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _with_norm(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return emb.select(
        F.col(id_col).alias("id"), _vecd(F.col(vec_col)).alias("v")
    ).withColumn("n", F.sqrt(_dot(F.col("v"), F.col("v"))))


def knn_bruteforce(emb: DataFrame, query_ids: list[int], k: int = 10,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """(query_id, rank, vec_id, cos) exact top-k cosine, self excluded.
    Queries broadcast (tiny); ranking via per-query window top-k."""
    base = _with_norm(emb, id_col, vec_col)
    q = base.filter(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"),
        F.col("n").alias("qn"))
    scored = (base.crossJoin(F.broadcast(q))
              .filter(F.col("id") != F.col("query_id"))
              .select("query_id", F.col("id").alias("vec_id"),
                      (_dot(F.col("qv"), F.col("v"))
                       / (F.col("qn") * F.col("n"))).alias("cos")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "vec_id", "cos"))


def ivf_assign(emb: DataFrame, n_centroids: int, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """(id, v, n, centroid_id): assign each vector to its nearest centroid.
    Centroids = the n_centroids lowest-id vectors (deterministic; a k-means
    refinement would drop in here without changing the query plan)."""
    base = _with_norm(emb, id_col, vec_col)
    cents = base.orderBy("id").limit(n_centroids).select(
        F.col("id").alias("centroid_id"), F.col("v").alias("cv"),
        F.col("n").alias("cn"))
    scored = (base.crossJoin(F.broadcast(cents))
              .select("id", "v", "n", "centroid_id",
                      (_dot(F.col("v"), F.col("cv"))
                       / (F.col("n") * F.col("cn"))).alias("cos")))
    w = Window.partitionBy("id").orderBy(F.desc("cos"), F.asc("centroid_id"))
    return (scored.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") == 1).drop("r", "cos"))


def knn_ivf(emb: DataFrame, query_ids: list[int], k: int = 10,
            n_centroids: int = 16, nprobe: int = 4,
            id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(query_id, rank, vec_id, cos) IVF-approximate top-k: probe the
    nprobe nearest centroid lists only."""
    assigned = ivf_assign(emb, n_centroids, id_col, vec_col)
    base = _with_norm(emb, id_col, vec_col)
    cents = base.orderBy("id").limit(n_centroids).select(
        F.col("id").alias("centroid_id"), F.col("v").alias("cv"),
        F.col("n").alias("cn"))
    q = base.filter(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"),
        F.col("n").alias("qn"))
    qc = (q.crossJoin(F.broadcast(cents))
          .select("query_id", "qv", "qn", "centroid_id",
                  (_dot(F.col("qv"), F.col("cv"))
                   / (F.col("qn") * F.col("cn"))).alias("cos")))
    wq = Window.partitionBy("query_id").orderBy(F.desc("cos"),
                                                F.asc("centroid_id"))
    probes = (qc.withColumn("r", F.row_number().over(wq))
              .filter(F.col("r") <= nprobe)
              .select("query_id", "qv", "qn", "centroid_id"))
    scored = (assigned.join(F.broadcast(probes), "centroid_id")
              .filter(F.col("id") != F.col("query_id"))
              .select("query_id", F.col("id").alias("vec_id"),
                      (_dot(F.col("qv"), F.col("v"))
                       / (F.col("qn") * F.col("n"))).alias("cos")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "vec_id", "cos"))
