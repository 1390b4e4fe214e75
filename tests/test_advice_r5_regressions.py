"""Regression pins for the round-5 ADVICE findings (fixed in round 6):

- medium: update_docs on an id_mode='preserve' root re-adds docs under the
  SAME ids it tombstones — global tombstone exclusion hides them and
  compact() physically drops them. update_docs must refuse such roots.
- low: a manual add (batch_id=None) to a legacy root must not stamp
  ns_version=2 (erasing the migration marker) before the legacy token has
  been seeded into the namespaced map — a named stream resuming afterwards
  would re-ingest its replayed micro-batch as a duplicate segment.
- low: an empty first batch must not permanently fix the root's id mode
  (the first real preserve_ids batch would then raise).
"""
from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from colbert_live_spark.index.segments import (
    MANIFEST, _read_manifest, add_segment, segment_search_local, update_docs)


def test_update_docs_refuses_preserve_roots(spark, documents, tmp_path):
    root = str(tmp_path / "proot")
    docs = documents.limit(20)
    add_segment(spark, docs, root, salt_rows=100, preserve_ids=True)
    changed = docs.limit(5).withColumn(
        "text", F.concat(F.col("text"), F.lit(" rev2")))
    with pytest.raises(ValueError, match="preserve"):
        update_docs(spark, changed, root,
                    docs.limit(5).select("doc_id"), salt_rows=100)
    # the refusal must leave the root untouched (no staged tombstones)
    m = _read_manifest(root)
    assert m["tombstones"]["n_deleted"] == 0
    assert len(m["segments"]) == 1


def test_manual_add_keeps_legacy_migration_marker(spark, documents,
                                                  tmp_path):
    root = str(tmp_path / "legacy2")
    docs = documents.limit(20)
    assert add_segment(spark, docs, root, salt_rows=100, batch_id=2)
    # strip the namespacing marker — a pre-r4 manifest
    m = json.loads(open(f"{root}/{MANIFEST}").read())
    assert m["last_batch_id"] == 2
    del m["ns_version"]
    m.pop("stream_batch_ids", None)
    open(f"{root}/{MANIFEST}", "w").write(json.dumps(m))

    # ONE manual (non-streaming) add — previously stamped ns_version=2 and
    # erased the migration marker
    assert add_segment(spark, docs.withColumn(
        "doc_id", F.col("doc_id") + 500), root, salt_rows=100)
    m2 = _read_manifest(root)
    assert m2.get("ns_version", 1) < 2, \
        "manual add erased the legacy migration marker"

    # a named stream resuming the root must still treat the replayed
    # legacy batch id as a replay (dropped), not a fresh ingest
    n_before = len(m2["segments"])
    assert add_segment(spark, docs, root, salt_rows=100, batch_id=2,
                       stream_id="ckpt-z") is None
    assert len(_read_manifest(root)["segments"]) == n_before


def test_empty_first_batch_does_not_fix_id_mode(spark, documents, tmp_path):
    root = str(tmp_path / "emptyfirst")
    empty = documents.limit(0)
    # empty first micro-batch under the DEFAULT offset mode
    assert add_segment(spark, empty, root, salt_rows=100) is None
    # the first real batch arrives preserve_ids=True — must NOT raise
    assert add_segment(spark, documents.limit(10), root, salt_rows=100,
                       preserve_ids=True)
    assert _read_manifest(root)["id_mode"] == "preserve"
    assert len(segment_search_local(root, [("q", "spark")], k=5)) >= 0
