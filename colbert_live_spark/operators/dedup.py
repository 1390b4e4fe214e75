"""Deduplication operators for large-scale training-data pipelines.

All hashes are engine-portable (md5-hex prefixes → integers) so every
operator has an exact DuckDB oracle; all heavy work is JVM-side DataFrame
ops. Scale notes per operator:

- exact: one hash-groupBy shuffle; at 100 TB hash first (md5 of text) so the
  shuffle moves 16-byte keys, not bodies.
- ngram-jaccard: exact pairs via the shingle inverted-index self-join —
  quadratic only inside a shingle bucket. At web scale the frequency cap
  (drop shingles with df > cap, standard in e.g. suffix-array dedup
  pipelines) and/or the MinHash-LSH variant below bound the join; the LSH
  variant is the honest 100 TB path, with the exact verify join running only
  on candidate pairs.
- minhash-lsh: signatures via one groupBy-min per (doc, perm); banding turns
  near-dup search into an equi-join on band keys — no pairwise scan ever
  materializes outside candidate buckets.
- simhash: 60-bit signature from per-term hash bit votes; near-dup pairs via
  4×15-bit band join + exact hamming verify (bit_count(xor)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from colbert_live_spark.functions.tokenize import tokenize_expr

# portable 60-bit hash: int of first 15 hex chars of md5
def _h60(col, salt=None):
    src = col if salt is None else F.concat(F.lit(f"{salt}:"), col)
    return F.conv(F.substring(F.md5(src), 1, 15), 16, 10).cast("long")


# All-pairs baselines refuse above this many input rows unless force=True:
# they exist as small-scale oracles/verifiers, and silently pointing one at
# a big table turns a labelled baseline into a quadratic job.
ALL_PAIRS_MAX_ROWS = 100_000


def _guard_all_pairs(df: DataFrame, op: str, force: bool) -> None:
    if force:
        return
    n = df.limit(ALL_PAIRS_MAX_ROWS + 1).count()
    if n > ALL_PAIRS_MAX_ROWS:
        raise ValueError(
            f"{op}: input has >{ALL_PAIRS_MAX_ROWS} rows — this is the "
            "quadratic small-scale baseline. Use the LSH/banded variant "
            f"at scale, or pass force=True to run it anyway.")


def exact_dup_pairs(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(keep_doc_id, dup_doc_id) — exact duplicates by text hash; the
    lowest doc id in each group is canonical.

    Shape: min-per-hash aggregate (map-side combined, one scalar per group)
    then an equi-join back on the 16-byte hash — NO collect_list: at web
    scale one boilerplate page can have 10^8 copies, and materializing that
    group as a single array row is a straggler/OOM, while the join form
    streams it."""
    hashed = docs.select(F.col(id_col).alias("doc_id"),
                         F.md5(F.col(text_col)).alias("h"))
    keepers = (hashed.groupBy("h")
               .agg(F.min("doc_id").alias("keep_doc_id"),
                    F.count(F.lit(1)).alias("n"))
               .filter(F.col("n") > 1)
               .select("h", "keep_doc_id"))
    return (hashed.join(keepers, "h")
            .filter(F.col("doc_id") != F.col("keep_doc_id"))
            .select("keep_doc_id", F.col("doc_id").alias("dup_doc_id")))


def shingles(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
             text_col: str = "text",
             max_shingle_df: int | None = None) -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams, JVM-side via transform
    over the token array.

    ``max_shingle_df``: drop shingles appearing in more than this many docs
    (the standard boilerplate cap — at web scale one shared boilerplate
    shingle with df=10^6 makes a 10^12-pair bucket in any shingle
    self-join; capped shingles bound every bucket). The cap changes the
    shingle sets on BOTH sides of downstream Jaccard, so oracles must apply
    the same cap."""
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       tokenize_expr(text_col).alias("t"))
    # short docs yield a NULL array (explode drops them) instead of a
    # .filter(size >= n): a filter on a tokenize-derived expression gets
    # pushed below the input-spread Exchange (PushPredicateThroughNonJoin)
    # and re-serializes the whole tokenize on the single scan task —
    # measured 3.5s → 16s at sf0.1 when that pushdown fired
    arr = F.when(F.size("t") >= n, F.array_distinct(_shingle_arr(n)))
    out = toks.select("doc_id", F.explode(arr).alias("shingle"))
    if max_shingle_df is not None:
        # window-based df cap: ONE pass over one Exchange(shingle) instead of
        # the groupBy + self-join form, which evaluated the tokenize+explode
        # subtree twice and shuffled it twice (guide §2.4: two operations
        # keyed the same way share one exchange). Kept set is identical:
        # count over the full shingle partition == the old groupBy count.
        w = Window.partitionBy("shingle")
        out = (out.withColumn("sh_df", F.count(F.lit(1)).over(w))
               .filter(F.col("sh_df") <= max_shingle_df)
               .select("doc_id", "shingle"))
    return out


def _shingle_arr(n: int):
    """array<string> of the doc's word n-grams from token array column t."""
    return F.transform(
        F.sequence(F.lit(0), F.size("t") - n),
        lambda i: F.concat_ws(" ", F.slice("t", i + 1, n)))


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.5,
                        id_col: str = "doc_id",
                        text_col: str = "text",
                        max_shingle_df: int | None = None,
                        force: bool = False) -> DataFrame:
    """(doc_a, doc_b, jaccard) exact n-gram Jaccard ≥ threshold, a < b.

    Quadratic inside a shingle bucket — at scale pass ``max_shingle_df`` to
    bound buckets, or use :func:`minhash_lsh_pairs` (candidates via banding,
    exact verify only on candidates). The UNCAPPED form refuses large
    inputs (``ALL_PAIRS_MAX_ROWS``) unless ``force=True``."""
    if max_shingle_df is None:
        _guard_all_pairs(docs, "ngram_jaccard_pairs(max_shingle_df=None)",
                         force)
    sh = shingles(docs, n, id_col, text_col, max_shingle_df)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    # join strategy deliberately left to the planner: hot boilerplate
    # shingles make the pair blowup quadratic INSIDE one shingle bucket, so
    # a shingle-partitioned SHJ/SMJ serializes the hot bucket's pairs into
    # one task (measured 17s vs 3.5s at sf0.1); the broadcast build keeps
    # the probe side spread-partitioned so the quadratic probe work spreads
    # evenly. This operator is the GUARDED small-scale baseline — the
    # broadcast of a shingle relation is bounded by ALL_PAIRS_MAX_ROWS.
    # (An n_sh-carried variant that skips the sizes joins was measured 5x
    # SLOWER: the pre-explode array rode every exploded row through the
    # Generate — recorded negative result, OPTIMIZATION_r06.md.)
    b = sh.alias("b")
    common = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                     & (F.col("a.doc_id") < F.col("b.doc_id")))
              .groupBy(F.col("a.doc_id").alias("doc_a"),
                       F.col("b.doc_id").alias("doc_b"))
              .agg(F.count(F.lit(1)).alias("common")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (common.join(sa, "doc_a").join(sb, "doc_b")
            .select("doc_a", "doc_b",
                    (F.col("common")
                     / (F.col("na") + F.col("nb") - F.col("common"))
                     ).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def minhash_signatures(docs: DataFrame, n_hashes: int = 16, n: int = 3,
                       id_col: str = "doc_id",
                       text_col: str = "text",
                       max_shingle_df: int | None = None) -> DataFrame:
    """(doc_id, perm, minhash) — one row per permutation; portable hashes.

    Fused single-pass form: all ``n_hashes`` permutation hashes are computed
    as columns of ONE row per shingle and min-aggregated together, so the
    signature shuffle moves one ~n_hashes·8-byte row per (doc, shingle)
    partial — not an n_hashes× exploded copy of the shingle stream (the
    map-side combine then collapses it to one row per doc per partition).
    Hash bytes are identical to the unfused form (md5 of "{perm}:{shingle}"),
    so the DuckDB oracle is unchanged."""
    sh = shingles(docs, n, id_col, text_col, max_shingle_df)
    mins = (sh.select("doc_id",
                      *[_h60(F.col("shingle"), salt=str(p)).alias(f"h{p}")
                        for p in range(n_hashes)])
            .groupBy("doc_id")
            .agg(*[F.min(f"h{p}").alias(f"h{p}") for p in range(n_hashes)]))
    pm = F.explode(F.array(*[
        F.struct(F.lit(p).alias("perm"), F.col(f"h{p}").alias("minhash"))
        for p in range(n_hashes)])).alias("pm")
    return (mins.select("doc_id", pm)
            .select("doc_id", F.col("pm.perm").alias("perm"),
                    F.col("pm.minhash").alias("minhash")))


def minhash_lsh_pairs(docs: DataFrame, n_hashes: int = 16, bands: int = 4,
                      n: int = 3, threshold: float = 0.5,
                      id_col: str = "doc_id",
                      text_col: str = "text",
                      max_shingle_df: int | None = None,
                      max_band_bucket: int | None = None) -> DataFrame:
    """(doc_a, doc_b, jaccard) — LSH-banded candidates, exact-verified.

    rows-per-band = n_hashes / bands. Candidates = docs sharing any band
    key; the expensive exact Jaccard join runs only on candidates.

    ``max_band_bucket``: drop band buckets holding more than this many docs
    before the candidate self-join. One degenerate band key (e.g. 10^8
    near-identical boilerplate pages sharing a signature band) would
    otherwise create a quadratic 10^16-pair bucket no matter how the rest
    is bounded. Docs in a dropped bucket can still pair through their
    OTHER bands; truly identical docs are the exact-dedup stage's job
    (dedup_keep composes both). The cap changes which candidates exist, so
    oracles must apply the same cap."""
    rows_per_band = n_hashes // bands
    sh = shingles(docs, n, id_col, text_col, max_shingle_df)
    # Fused single-aggregation signatures + per-doc shingle count: ONE
    # groupBy(doc_id) produces all n_hashes minima AND n_sh (the sizes
    # relation rode a second full shingle pass + shuffle before — guide
    # §2.3 "aggregate before you shuffle" / §2.4). Hash bytes identical to
    # minhash_signatures (md5 of "{perm}:{shingle}").
    mins = (sh.select("doc_id",
                      *[_h60(F.col("shingle"), salt=str(p)).alias(f"h{p}")
                        for p in range(n_hashes)])
            .groupBy("doc_id")
            .agg(*[F.min(f"h{p}").alias(f"h{p}") for p in range(n_hashes)],
                 F.count(F.lit(1)).alias("n_sh")))

    # band keys from the wide signature row — no explode + second groupBy:
    # same "{perm}:{minhash}" strings, same lexicographic sort, same md5 as
    # the (doc_id, band) collect_list form (oracle-identical keys)
    def band_key(b: int):
        parts = [F.concat_ws(":", F.lit(p), F.col(f"h{p}"))
                 for p in range(b * rows_per_band, (b + 1) * rows_per_band)]
        return F.md5(F.concat_ws(",", F.sort_array(F.array(*parts))))

    keys = (mins.select(
        "doc_id", "n_sh",
        F.explode(F.array(*[
            F.struct(F.lit(b).cast("int").alias("band"),
                     band_key(b).alias("band_key"))
            for b in range(bands)])).alias("bk"))
        .select("doc_id", "n_sh", F.col("bk.band").alias("band"),
                F.col("bk.band_key").alias("band_key")))
    if max_band_bucket is not None:
        # window-based bucket-skew cap: same kept set as the old
        # groupBy-count + join-back, one exchange instead of two
        wb = Window.partitionBy("band", "band_key")
        keys = (keys.withColumn("bn", F.count(F.lit(1)).over(wb))
                .filter(F.col("bn") <= max_band_bucket)
                .drop("bn"))
    a = keys.alias("a")
    b = keys.alias("b")
    # n_sh rides the candidate self-join (functionally dependent on the doc
    # id), so the final Jaccard needs NO join back to a sizes relation
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.band_key") == F.col("b.band_key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("a.n_sh").alias("na"),
                    F.col("b.doc_id").alias("doc_b"),
                    F.col("b.n_sh").alias("nb")).distinct())

    # exact-verify join over the full shingle relation. A candidate-id
    # restriction of the verify side (semi-join docs to the cand id set
    # before re-shingling) was measured SLOWER both capped and uncapped
    # (3.2s vs 2.0s warm uncapped, 4.7s vs 3.1s capped at sf0.1): deriving
    # the id set re-evaluates the whole signature pipeline a second time
    # (no exchange reuse across differently-pruned consumers), which costs
    # more than joining the shingles that are already computed. Recorded
    # trade in OPTIMIZATION_r06.md: on a shuffle-bound cluster the
    # restriction could win; measurement here says otherwise.
    sha = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    shb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (cand.join(sha, "doc_a").join(shb, ["doc_b", "shingle"])
              .groupBy("doc_a", "doc_b", "na", "nb")
              .agg(F.count(F.lit(1)).alias("common")))
    return (common
            .select("doc_a", "doc_b",
                    (F.col("common")
                     / (F.col("na") + F.col("nb") - F.col("common"))
                     ).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def simhash(docs: DataFrame, bits: int = 60, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """(doc_id, simhash) — tf-weighted bit votes over portable term hashes.

    Pure JVM: explode (term, bit) pairs; at scale this is a single
    map-side-combined groupBy (docs × vocab × bits rows never materialize —
    Catalyst pipelines explode into the partial agg).
    """
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       tokenize_expr(text_col).alias("t"))
    tf = (toks.select("doc_id", F.explode("t").alias("term"))
          .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
          .withColumn("h", _h60(F.col("term"))))
    # NOTE (r6 optimization round): a fused single-aggregation form (all 60
    # bit votes as sum columns of one groupBy(doc_id), minhash-style) was
    # implemented and measured SLOWER warm (1.77s vs 0.86s at sf0.1) — a
    # 60-buffer hash aggregate loses codegen efficiency; the explode rows
    # are cheap because Catalyst pipelines explode into the partial
    # aggregate. Kept the explode form deliberately (recorded negative
    # result, OPTIMIZATION_r06.md).
    votes = (tf.select("doc_id", "tf", "h",
                       F.explode(F.sequence(F.lit(0), F.lit(bits - 1)))
                       .alias("bit"))
             .withColumn("vote",
                         F.when(F.expr("(h >> bit) & 1") == 1,
                                F.col("tf")).otherwise(-F.col("tf"))))
    bitvals = (votes.groupBy("doc_id", "bit")
               .agg(F.sum("vote").alias("v"))
               .withColumn("bitval",
                           F.when(F.col("v") > 0,
                                  F.expr("shiftleft(1L, bit)"))
                           .otherwise(F.lit(0).cast("long"))))
    return bitvals.groupBy("doc_id").agg(F.sum("bitval").alias("simhash"))


def simhash_dup_pairs(docs: DataFrame, max_hamming: int = 8, bits: int = 60,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """(doc_a, doc_b, hamming) pairs with hamming(simhash) ≤ max_hamming.

    Candidates via 4 × 15-bit chunk equality (any chunk equal → candidate;
    complete for max_hamming ≤ 3 by pigeonhole, heuristic above), verified
    exactly with bit_count(xor)."""
    sig = simhash(docs, bits, id_col, text_col)
    chunks = sig.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.concat_ws(":", F.lit(i),
                        F.shiftright("simhash", i * 15).bitwiseAND(0x7FFF))
            for i in range(4)])).alias("chunk"))
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (a.join(b, (F.col("a.chunk") == F.col("b.chunk"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("a.simhash").alias("sig_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    F.col("b.simhash").alias("sig_b")).distinct())
    return (cand.withColumn(
        "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming"))


def hyperplanes(n_bits: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 random-hyperplane components derived from md5 —
    identical constants are inlined into the Spark plan and the DuckDB
    oracle SQL, so both engines bucket identically."""
    import hashlib
    return [[1.0 if int(hashlib.md5(f"rh:{j}:{i}".encode())
                        .hexdigest()[0], 16) & 1 else -1.0
             for i in range(dim)]
            for j in range(n_bits)]


def embedding_lsh_pairs(emb: DataFrame, threshold: float = 0.45,
                        n_bits: int = 16, bands: int = 4, dim: int = 64,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """(id_a, id_b, cos) — near-dup pairs via random-hyperplane (SimHash for
    vectors) LSH: sign-bit signatures, banded equi-join for candidates,
    exact cosine verify on candidates only. This is the 100 TB path for
    embedding near-dup: no all-pairs join ever materializes — candidate
    volume is bounded by band-bucket sizes (uniform under random
    hyperplanes), and the exact verify is a self-join on candidate ids.
    Recall vs the exact form is the standard LSH trade (tunable via
    n_bits/bands); determinism makes it exactly oracle-checkable."""
    planes = hyperplanes(n_bits, dim)
    per_band = n_bits // bands
    v = emb.select(F.col(id_col).alias("id"),
                   F.transform(F.col(vec_col),
                               lambda x: x.cast("double")).alias("v"))

    def dot_plane(j):
        plane = F.array(*[F.lit(x) for x in planes[j]])
        return F.aggregate(F.zip_with(F.col("v"), plane, lambda a, b: a * b),
                           F.lit(0.0), lambda acc, x: acc + x)

    band_cols = []
    for b in range(bands):
        key = F.lit(0).cast("long")
        for jj in range(per_band):
            j = b * per_band + jj
            bit = F.when(dot_plane(j) > 0, F.lit(1)).otherwise(F.lit(0))
            key = key + (bit.cast("long") * F.lit(1 << jj))
        band_cols.append(key.alias(f"bk{b}"))
    sig = v.select("id", *band_cols)
    keys = sig.select("id", F.explode(F.array(*[
        F.concat_ws(":", F.lit(b), F.col(f"bk{b}")) for b in range(bands)
    ])).alias("bkey"))
    a = keys.alias("a")
    b_ = keys.alias("b")
    cand = (a.join(b_, (F.col("a.bkey") == F.col("b.bkey"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b")).distinct())
    norm = v.withColumn(
        "n", F.sqrt(F.aggregate(F.transform(F.col("v"), lambda x: x * x),
                                F.lit(0.0), lambda acc, x: acc + x)))
    va = norm.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                     F.col("n").alias("na"))
    vb = norm.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                     F.col("n").alias("nb"))
    dot = F.aggregate(F.zip_with(F.col("va"), F.col("vb"),
                                 lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    return (cand.join(va, "id_a").join(vb, "id_b")
            .select("id_a", "id_b",
                    (dot / (F.col("na") * F.col("nb"))).alias("cos"))
            .filter(F.col("cos") >= threshold))


def embedding_neardup_pairs(emb: DataFrame, threshold: float = 0.95,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            force: bool = False) -> DataFrame:
    """(id_a, id_b, cos) — exact cosine near-dup pairs. JVM-side dot/norm
    via zip_with + aggregate (no Python). The all-pairs exact form is the
    small-scale oracle/verifier ONLY — it refuses large inputs
    (``ALL_PAIRS_MAX_ROWS``) unless ``force=True``; the scale path is
    :func:`embedding_lsh_pairs` (banded candidates, exact verify on
    candidates)."""
    _guard_all_pairs(emb, "embedding_neardup_pairs", force)
    v = emb.select(F.col(id_col).alias("id"),
                   F.transform(F.col(vec_col),
                               lambda x: x.cast("double")).alias("v"))
    norm = v.withColumn(
        "n", F.sqrt(F.aggregate(F.transform(F.col("v"), lambda x: x * x),
                                F.lit(0.0), lambda a, x: a + x)))
    a = norm.alias("a")
    b = norm.alias("b")
    dot = F.aggregate(F.zip_with(F.col("a.v"), F.col("b.v"),
                                 lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    return (a.join(b, F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    (dot / (F.col("a.n") * F.col("b.n"))).alias("cos"))
            .filter(F.col("cos") >= threshold))
