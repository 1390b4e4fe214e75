"""LSH band-bucket skew cap (VERDICT r3 ask #7): one degenerate band key —
e.g. thousands of identical boilerplate pages sharing a signature — must not
create a quadratic candidate bucket; small buckets must be untouched."""
from __future__ import annotations

from colbert_live_spark.operators.dedup import (exact_dup_pairs,
                                                minhash_lsh_pairs)

BOILER = ("the quick brown fox jumps over the lazy dog again and again "
          "while the lazy dog sleeps under the old oak tree all day long")
_BASE = ("alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu "
         "nu xi omicron pi rho sigma tau upsilon")
NEAR_A = _BASE + " phi"   # 19 shared shingles, 2 unique each side →
NEAR_B = _BASE + " chi"   # jaccard 0.9, bands 1-3 collide (verified)


def _pairs(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_band_bucket_cap_adversarial(spark):
    rows = [(i, BOILER) for i in range(40)]       # identical boilerplate
    rows += [(100, NEAR_A), (101, NEAR_B)]        # genuine near-dup pair
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = _pairs(minhash_lsh_pairs(docs, n_hashes=16, bands=4, n=3,
                                        threshold=0.3))
    capped = _pairs(minhash_lsh_pairs(docs, n_hashes=16, bands=4, n=3,
                                      threshold=0.3, max_band_bucket=32))
    # the degenerate 40-doc bucket is quadratic uncapped, dropped capped
    assert any(a < 40 and b < 40 for a, b in uncapped)
    assert not any(a < 40 and b < 40 for a, b in capped)
    # the small-bucket genuine pair survives the cap
    assert (100, 101) in uncapped
    assert (100, 101) in capped
    # composition invariant (the dedup_keep shape): identical docs the cap
    # skipped are exactly what the exact-dedup stage removes
    exact = {r.dup_doc_id for r in exact_dup_pairs(docs).collect()}
    assert exact == set(range(1, 40))
