"""Dense id assignment — the zipWithIndex pattern, Arrow-vectorized.

The reference keys chunks by opaque PKs (uuid `example/cmdline/db.py:96`,
text ids `example/bench/db.py:67`); delta-compressed postings need *dense*
integer doc ids (SURVEY.md §4 custom-work item 5). No Spark built-in yields
dense ids (`monotonically_increasing_id` leaves 2^33-sized gaps between
partitions), so: range-partition by the key, count per partition (tiny
driver-side pass), broadcast cumulative offsets, assign offset+local_rank in
``mapInPandas``. Deterministic for a given key ordering; the key↔doc_id
mapping table is the url↔doc_id table from SURVEY.md §1.1.
"""

from __future__ import annotations

from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_dense_ids(df: DataFrame, key_col: str, id_name: str = "doc_id",
                     n_parts: int | None = None) -> DataFrame:
    """Returns df + ``id_name`` column: dense 0..N-1 ids ordered by key_col.

    The input is persisted for the two passes (range boundaries are
    sample-based and must match between the count and assign passes).

    WARNING: do not apply ``coalesce`` directly to the returned DataFrame —
    coalesce fuses into the assignment stage and changes the partition ids
    the offsets were computed for, corrupting ids. Use ``repartition`` (a
    shuffle barrier) if you need fewer output files.
    """
    spark = df.sparkSession
    if n_parts is None:
        n_parts = max(4, df.rdd.getNumPartitions())
    parted = (df.repartitionByRange(n_parts, key_col)
                .sortWithinPartitions(key_col)).persist()
    counts = {r.p: r.c for r in parted.select(
        F.spark_partition_id().alias("p")).groupBy("p").agg(
        F.count(F.lit(1)).alias("c")).collect()}
    offsets = {}
    acc = 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    bc = spark.sparkContext.broadcast(offsets)

    def assign(it):
        pid = TaskContext.get().partitionId()
        base = bc.value.get(pid, 0)
        seen = 0
        for pdf in it:
            pdf = pdf.copy()
            pdf[id_name] = range(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            yield pdf

    out_schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                           for f in parted.schema.fields) + f", {id_name} long"
    out = parted.mapInPandas(assign, schema=out_schema)
    # expose the persisted parent so callers can release it once the result
    # is materialized (otherwise each call leaks one cached DataFrame for
    # the session lifetime — e.g. one per streaming micro-batch)
    out._cls_persisted = parted
    return out
