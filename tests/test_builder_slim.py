"""The slim merge shuffle (dl stripped from posting rows, gathered back
from the per-salt dlmap sidecar at encode time) must produce postings
byte-identical to the fat-row path — same blocks, same bounds, same
compressed bytes."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from colbert_live_spark.index.builder import build_runs, merge_index


def _postings_pdf(spark, out):
    pdf = (spark.read.parquet(f"{out}/postings")
           .orderBy("term_id", "salt", "block_id").toPandas())
    # bytes-valued list columns: make hashable for frame compare
    for c in ("docs", "tfs", "dls"):
        pdf[c] = pdf[c].map(bytes)
    return pdf.reset_index(drop=True)


def test_slim_and_fat_merge_byte_identical(spark, documents,
                                           tmp_path_factory):
    base = tmp_path_factory.mktemp("slimfat")
    docs = documents.filter(F.col("doc_id") < 300)
    outs = {}
    for name, slim in (("s", True), ("f", False)):
        out = str(base / name)
        build_runs(spark, docs, out, n_groups=2)
        merge_index(spark, out, n_shards=4, salt_rows=100,
                    slim_shuffle=slim)
        outs[name] = _postings_pdf(spark, out)
    a, b = outs["s"], outs["f"]
    assert len(a) == len(b) and len(a) > 0
    for col in a.columns:
        assert (a[col] == b[col]).all(), f"column {col} differs"


def test_dlmap_missing_doc_fails_loudly(spark, documents, tmp_path):
    """A doc present in runs but absent from dlmap (stage-1 corruption)
    must raise, not silently mis-score."""
    import glob
    import os
    out = str(tmp_path / "idx")
    docs = documents.filter(F.col("doc_id") < 100)
    build_runs(spark, docs, out, n_groups=1)
    # first merge writes dlmap; sabotage it, then re-merge reusing it is
    # not possible (merge rewrites dlmap) — instead sabotage doclens so
    # dlmap comes out missing docs that runs still carry
    for f in glob.glob(f"{out}/doclens/*/*.parquet"):
        os.remove(f)
    docs.limit(10).select(
        "doc_id", F.lit(5).alias("dl")).write.mode("append").parquet(
        glob.glob(f"{out}/doclens/*")[0])
    with pytest.raises(Exception, match="dlmap|missing"):
        merge_index(spark, out, n_shards=4, salt_rows=100)
