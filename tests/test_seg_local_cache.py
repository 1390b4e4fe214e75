"""Manifest-keyed caches for the zero-Spark-job segmented local serving
path (r6 optimization; VERDICT r5 ask #5): dictionary/delta/tombstone
point-reads are cached per (root, manifest text), so any commit — ingest,
delete — rewrites the manifest and MUST invalidate. Staleness is the
failure mode these tests pin down."""
from __future__ import annotations

from colbert_live_spark.index.segments import (
    _SEG_LOCAL_CACHE, add_segment, delete_docs, segment_search_local)


def _ids(pdf):
    return set(int(x) for x in pdf["doc_id"])


def test_cache_hit_equals_cold_and_ingest_invalidates(spark, tmp_path):
    root = str(tmp_path / "root")
    docs1 = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha beta")],
        "doc_id long, text string")
    add_segment(spark, docs1, root, n_shards=2, salt_rows=100)

    cold = segment_search_local(root, [("q1", "alpha")], k=10)
    warm = segment_search_local(root, [("q1", "alpha")], k=10)  # cache hit
    assert cold.to_dict("records") == warm.to_dict("records")
    assert _ids(cold) == {0, 1}

    # serve -> add segment -> serve must see the new docs (the manifest
    # text changed, so every cached entry for this root is dropped)
    docs2 = spark.createDataFrame([(0, "alpha delta")],
                                  "doc_id long, text string")
    add_segment(spark, docs2, root, n_shards=2, salt_rows=100)
    after = segment_search_local(root, [("q1", "alpha")], k=10)
    assert _ids(after) == {0, 1, 2}  # new doc got global id next_doc_base+0
    only_new = segment_search_local(root, [("q2", "delta")], k=10)
    assert _ids(only_new) == {2}

    # cached-path answers must equal a completely cold cache
    _SEG_LOCAL_CACHE.clear()
    fresh = segment_search_local(root, [("q1", "alpha")], k=10)
    assert after.to_dict("records") == fresh.to_dict("records")


def test_delete_invalidates_excl_and_deltas(spark, tmp_path):
    root = str(tmp_path / "root")
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "alpha gamma"), (2, "alpha beta beta")],
        "doc_id long, text string")
    add_segment(spark, docs, root, n_shards=2, salt_rows=100)
    before = segment_search_local(root, [("q1", "beta")], k=10)
    assert _ids(before) == {0, 2}

    delete_docs(spark, root,
                spark.createDataFrame([(2,)], "doc_id long"))
    after = segment_search_local(root, [("q1", "beta")], k=10)
    assert _ids(after) == {0}
    # negative term stays correct through the cache
    assert len(segment_search_local(root, [("q2", "zzzmissing")], k=10)) == 0
