"""queries()/oracle_sql() entries for the training-data pipeline operators:
dedup family, similarity search, text analysis. Split from entry_queries.py
to keep module size sane; merged by __spark_entry__ via query_map/oracle_map.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from colbert_live_spark.functions import textstats as ts
from colbert_live_spark.functions.tokenize import DUCKDB_TOKENIZE
from colbert_live_spark.operators import dedup, similarity

ROUND = 6
NGRAM = 3
JACCARD_T = 0.5
MINHASH_N, MINHASH_BANDS = 16, 4
MAX_SH_DF = 50  # boilerplate shingle cap (dedup_keep path; see dedup.shingles)
MAX_BAND_BUCKET = 32  # LSH band-bucket size cap (dedup_keep path): one
# degenerate band key must never create a quadratic candidate bucket; docs
# in a dropped bucket can still pair via other bands, identical docs are
# exact-dedup's job (see dedup.minhash_lsh_pairs)
SIMHASH_BITS, SIMHASH_HAM = 60, 8
NEARDUP_COS = 0.45
EMB_LSH_BITS, EMB_LSH_BANDS, EMB_DIM = 16, 4, 64
KNN_QUERIES = [0, 1, 2, 3, 4]
KNN_K = 10
IVF_C, IVF_PROBE, KMEANS_ITERS = 16, 4, 2
IVF_TRAIN_SAMPLE = 800  # deterministic lowest-hash training sample (the
# 10^12-vector shape: Lloyd never iterates over the full corpus)
IVF_SAMPLED_NPROBE = 12  # the synthetic vectors are UNIFORM (measured
# intra/inter-label cosine 0.005/0.000 — no cluster structure), the
# ANN-hard worst case where IVF recall ≈ probed fraction regardless of
# training quality. nprobe=12/16 holds recall@10 ≥ 0.9 (bench-reported);
# on real embedding corpora with cluster structure the same code reaches
# that recall at much smaller probed fractions — that is where IVF's
# O(N·nprobe/C) speedup actually pays.
MAXSIM_T = 4            # token vectors per document (multi-vector model)
MAXSIM_QUERIES = [0, 1, 2, 3, 4]  # query DOC ids (each = T token vectors)
MAXSIM_K = 10
MAXSIM_NANN = 40        # per-token ANN candidate cut (reference n_ann_docs)
MAXSIM_NPROBE = 8       # per-token probe width (recall ≥ 0.9 on the
# uniform corpus; see IVF_SAMPLED_NPROBE note)
MAXSIM_NCAND = 64       # n_maxsim_candidates for the CAPPED variant — the
# reference's rescore-budget cut (`colbert_live/colbert_live.py:199-200`,
# `_expand` f(10)=20 scaled to our T·n_ann=160 union)
MAXSIM_CAPPED_NPROBE = 10  # probe width at the capped operating point.
# The reference tunes probe width alongside its rescore budget
# (`example/bench/lotte.py:119-124`); with the fused sum-of-token-cosine
# candidate ordering (similarity.maxsim_topk_ivf step 3) this holds
# recall@10 ≥ 0.9 on the uniform (ANN-hard) corpus at the SAME rescore
# budget — replica sweep: best-single-token ordering 0.86@nprobe=8 /
# 0.88@10; fused ordering 0.88@8 / 0.94@10 (bench-reported each round)


def _docs(spark, sf_dir):
    from colbert_live_spark.session import spread_input
    return spread_input(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _docs_bare(spark, sf_dir):
    """Un-spread scan for queries whose per-row work is trivial: the spread
    exchange measured as pure overhead there (r6; the heavy tokenize/hash
    pipelines keep the spread via _docs)."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark, sf_dir):
    from colbert_live_spark.session import spread_input
    return spread_input(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))


def _tok(col: str = "text") -> str:
    return DUCKDB_TOKENIZE.format(col=col)


# ------------------------------------------------------------------ dedup

def q_dedup_exact(spark, sf_dir):
    return dedup.exact_dup_pairs(_docs_bare(spark, sf_dir))


def q_ngram_jaccard(spark, sf_dir):
    return (dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), n=NGRAM,
                                      threshold=JACCARD_T)
            .withColumn("jaccard", F.round("jaccard", ROUND)))


def q_minhash_lsh(spark, sf_dir):
    return (dedup.minhash_lsh_pairs(_docs(spark, sf_dir), n_hashes=MINHASH_N,
                                    bands=MINHASH_BANDS, n=NGRAM,
                                    threshold=JACCARD_T)
            .withColumn("jaccard", F.round("jaccard", ROUND)))


def q_simhash(spark, sf_dir):
    return dedup.simhash(_docs(spark, sf_dir), bits=SIMHASH_BITS)


def q_simhash_pairs(spark, sf_dir):
    return dedup.simhash_dup_pairs(_docs(spark, sf_dir),
                                   max_hamming=SIMHASH_HAM, bits=SIMHASH_BITS)


def q_embedding_neardup(spark, sf_dir):
    return (dedup.embedding_neardup_pairs(_emb(spark, sf_dir),
                                          threshold=NEARDUP_COS)
            .withColumn("cos", F.round("cos", ROUND)))


def q_embedding_neardup_lsh(spark, sf_dir):
    """The 100 TB embedding near-dup path: random-hyperplane LSH banding →
    exact cosine verify on candidates only (no all-pairs join)."""
    return (dedup.embedding_lsh_pairs(_emb(spark, sf_dir),
                                      threshold=NEARDUP_COS,
                                      n_bits=EMB_LSH_BITS,
                                      bands=EMB_LSH_BANDS, dim=EMB_DIM)
            .withColumn("cos", F.round("cos", ROUND)))


def q_dedup_keep(spark, sf_dir):
    """Composed dedup pipeline output: the surviving document set after
    removing exact duplicates and near-duplicates — what a training-data
    pipeline actually ships downstream. The near-dup stage is the SCALE
    path: boilerplate-capped shingles (df ≤ MAX_SH_DF) + MinHash-LSH banded
    candidates with the band-bucket skew cap (≤ MAX_BAND_BUCKET docs per
    bucket — a degenerate band key can never go quadratic) + exact Jaccard
    verify on candidates only (higher doc_id of each pair ≥ 0.5 dropped);
    no quadratic shingle self-join anywhere."""
    docs = _docs(spark, sf_dir)
    exact = dedup.exact_dup_pairs(docs).select(
        F.col("dup_doc_id").alias("doc_id"))
    near = (dedup.minhash_lsh_pairs(docs, n_hashes=MINHASH_N,
                                    bands=MINHASH_BANDS, n=NGRAM,
                                    threshold=JACCARD_T,
                                    max_shingle_df=MAX_SH_DF,
                                    max_band_bucket=MAX_BAND_BUCKET)
            .select(F.col("doc_b").alias("doc_id")))
    drops = exact.union(near).distinct()
    return (docs.join(drops, "doc_id", "left_anti")
            .select("doc_id", "lang", "n_chars"))


# ------------------------------------------------------------- similarity

def q_knn_bruteforce(spark, sf_dir):
    return (similarity.knn_bruteforce(_emb(spark, sf_dir), KNN_QUERIES, KNN_K)
            .withColumn("cos", F.round("cos", ROUND)))


def q_knn_ivf(spark, sf_dir):
    return (similarity.knn_ivf(_emb(spark, sf_dir), KNN_QUERIES, KNN_K,
                               n_centroids=IVF_C, nprobe=IVF_PROBE)
            .withColumn("cos", F.round("cos", ROUND)))


def q_knn_ivf_sampled(spark, sf_dir):
    """IVF with SAMPLE-trained centroids: Lloyd runs over the
    IVF_TRAIN_SAMPLE lowest-hash vectors only (deterministic, oracle-
    reproducible), then the full corpus is assigned once and probed —
    the shape that survives 10^12 vectors (training cost is O(sample·C·
    iters), independent of corpus size)."""
    return (similarity.knn_ivf(_emb(spark, sf_dir), KNN_QUERIES, KNN_K,
                               n_centroids=IVF_C, nprobe=IVF_SAMPLED_NPROBE,
                               train_sample=IVF_TRAIN_SAMPLE)
            .withColumn("cos", F.round("cos", ROUND)))


def q_maxsim_topk(spark, sf_dir):
    """THE reference query shape (`colbert_live/colbert_live.py:177-208`,
    einsum `models.py:45-65`): multi-vector (late-interaction) retrieval —
    each doc is a SET of token vectors (consecutive runs of MAXSIM_T
    vec_ids), each query likewise; score = Σ over query tokens of max over
    doc tokens of cosine. Exact over all docs (the correctness baseline,
    analog of the reference's brute-force oracle `tests/db.py:29-39`)."""
    return (similarity.maxsim_topk(_emb(spark, sf_dir), MAXSIM_QUERIES,
                                   MAXSIM_K, tokens_per_doc=MAXSIM_T)
            .withColumn("score", F.round("score", ROUND)))


def q_maxsim_topk_ivf(spark, sf_dir):
    """The reference's full serving loop, scale-shaped: per query-token IVF
    probe → top-n_ann vector hits per token (C1/C5) → candidate-doc union
    (C4) → gather candidate docs' token vectors (R1/J5) → exact MaxSim
    rescore (R3) → top-k (R4). Rescore cost is independent of corpus size
    (≤ T·n_ann candidate docs per query)."""
    return (similarity.maxsim_topk_ivf(
        _emb(spark, sf_dir), MAXSIM_QUERIES, MAXSIM_K,
        tokens_per_doc=MAXSIM_T, n_centroids=IVF_C, nprobe=MAXSIM_NPROBE,
        n_ann=MAXSIM_NANN, train_sample=IVF_TRAIN_SAMPLE)
            .withColumn("score", F.round("score", ROUND)))


def q_maxsim_topk_ivf_capped(spark, sf_dir):
    """The serving loop WITH the reference's n_maxsim_candidates rescore
    budget (C5, `colbert_live/colbert_live.py:199-200`): the candidate
    union is cut to MAXSIM_NCAND by FUSED observed evidence (sum of
    per-token best cosines — the reference's fuse-before-cut shape,
    `colbert_live.py:189-200`) before the exact rescore — bounds rescore
    cost at large T·nprobe·n_ann. Recall on this cluster-free corpus is
    reported in BENCH next to the uncapped entry."""
    return (similarity.maxsim_topk_ivf(
        _emb(spark, sf_dir), MAXSIM_QUERIES, MAXSIM_K,
        tokens_per_doc=MAXSIM_T, n_centroids=IVF_C,
        nprobe=MAXSIM_CAPPED_NPROBE,
        n_ann=MAXSIM_NANN, train_sample=IVF_TRAIN_SAMPLE,
        n_maxsim_candidates=MAXSIM_NCAND)
            .withColumn("score", F.round("score", ROUND)))


def q_maxsim_capped_clustered(spark, sf_dir):
    """The SAME capped serving loop as maxsim_topk_ivf_capped, run over the
    deterministically CLUSTERED derivation of the corpus (clustered_emb):
    demonstrates that the rescore budget's recall cost is a property of the
    uniform worst-case corpus, not of the pipeline — bench reports recall
    on both corpora side by side (uniform 0.86 vs clustered ≈1)."""
    return (similarity.maxsim_topk_ivf(
        clustered_emb(_emb(spark, sf_dir)), MAXSIM_QUERIES, MAXSIM_K,
        tokens_per_doc=MAXSIM_T, n_centroids=IVF_C,
        nprobe=MAXSIM_CAPPED_NPROBE,
        n_ann=MAXSIM_NANN, train_sample=IVF_TRAIN_SAMPLE,
        n_maxsim_candidates=MAXSIM_NCAND)
            .withColumn("score", F.round("score", ROUND)))


# ------------------------------------------------------------ multimodal

def q_media_histogram(spark, sf_dir):
    """S6 multimodal plumbing, driver-oracle-checked end to end: documents
    become deterministic FAKE image payloads (binary columns through Arrow),
    a mapInPandas stage decodes them and emits exact integer bucket
    histograms (the integer core of the featurizer). Real codecs stay an
    honest stub (sources/multimodal.py) — this proves the schemas, batch
    shapes, and byte plumbing, not pixel math."""
    from colbert_live_spark.sources import multimodal
    media = multimodal.media_from_text(_docs_bare(spark, sf_dir))
    return multimodal.decode_histogram(media)


# ------------------------------------------------------------ text stats

def q_text_stats(spark, sf_dir):
    t = F.col("text")
    return _docs_bare(spark, sf_dir).select(
        "doc_id",
        ts.token_count(t).alias("n_tokens"),
        F.round(ts.punct_ratio(t), ROUND).alias("punct_ratio"),
        F.round(ts.stopword_ratio(t), ROUND).alias("stopword_ratio"),
        F.round(ts.quality_score(t), ROUND).alias("quality"))


def q_lang_id(spark, sf_dir):
    return _docs_bare(spark, sf_dir).select(
        "doc_id", ts.lang_id(F.col("text")).alias("lang_pred"))


def q_fingerprint(spark, sf_dir):
    return _docs_bare(spark, sf_dir).select(
        "doc_id", ts.fingerprint(F.col("text")).alias("fp"))


# -------------------------------------------------------------- oracles

_SHINGLES = f"""
shingles AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(list_transform(
      range(1, len(toks) - {NGRAM} + 2),
      i -> array_to_string(toks[i:i+{NGRAM - 1}], ' '))) AS shingle
    FROM (SELECT doc_id, {_tok()} AS toks FROM documents)
    WHERE len(toks) >= {NGRAM})
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id)
"""

# same shingle relation with the boilerplate-frequency cap applied — the
# dedup_keep scale path drops shingles with df > MAX_SH_DF on BOTH sides
_SHINGLES_CAPPED = f"""
shingles_raw AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(list_transform(
      range(1, len(toks) - {NGRAM} + 2),
      i -> array_to_string(toks[i:i+{NGRAM - 1}], ' '))) AS shingle
    FROM (SELECT doc_id, {_tok()} AS toks FROM documents)
    WHERE len(toks) >= {NGRAM})
),
shkeep AS (
  SELECT shingle FROM shingles_raw GROUP BY shingle
  HAVING count(*) <= {MAX_SH_DF}
),
shingles AS (
  SELECT s.doc_id, s.shingle FROM shingles_raw s JOIN shkeep USING (shingle)
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id)
"""

# MinHash signatures → banded candidates → exact common-shingle counts, over
# whatever `shingles` relation precedes it (capped or not);
# ``max_band_bucket`` mirrors dedup.minhash_lsh_pairs' bucket-skew cap
def _minhash_cand_common(max_band_bucket: int | None = None) -> str:
    if max_band_bucket is None:
        bands_src = "bands"
        cap_sql = ""
    else:
        bands_src = "bands_kept"
        cap_sql = f"""
bands_ok AS (
  SELECT band, band_key FROM bands GROUP BY band, band_key
  HAVING count(*) <= {max_band_bucket}
),
bands_kept AS (
  SELECT b.doc_id, b.band, b.band_key
  FROM bands b JOIN bands_ok USING (band, band_key)
),"""
    return f"""
sig AS (
  SELECT doc_id, perm,
         min(('0x' || substr(md5(perm::VARCHAR || ':' || shingle), 1, 15))::BIGINT)
           AS minhash
  FROM shingles CROSS JOIN (SELECT unnest(range(0, {MINHASH_N})) AS perm)
  GROUP BY doc_id, perm
),
bands AS (
  SELECT doc_id, (perm // {MINHASH_N // MINHASH_BANDS}) AS band,
         md5(array_to_string(list_sort(list(perm::VARCHAR || ':'
             || minhash::VARCHAR)), ',')) AS band_key
  FROM sig GROUP BY doc_id, band
),{cap_sql}
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM {bands_src} a JOIN {bands_src} b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
common AS (
  SELECT c.doc_a, c.doc_b, count(*)::BIGINT AS common
  FROM cand c
  JOIN shingles sa ON sa.doc_id = c.doc_a
  JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
)
"""

_JACCARD_TAIL = f"""
SELECT c.doc_a, c.doc_b,
       round(c.common / CAST(sa.n_sh + sb.n_sh - c.common AS DOUBLE), {ROUND})
         AS jaccard
FROM common c
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
WHERE c.common / CAST(sa.n_sh + sb.n_sh - c.common AS DOUBLE) >= {JACCARD_T}
"""

_SIMHASH_CTES = f"""
WITH tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf,
         ('0x' || substr(md5(term), 1, 15))::BIGINT AS h
  FROM (SELECT doc_id, unnest({_tok()}) AS term FROM documents)
  GROUP BY doc_id, term
),
votes AS (
  SELECT doc_id, bit,
         sum(CASE WHEN (h >> bit) & 1 = 1 THEN tf ELSE -tf END) AS v
  FROM tf CROSS JOIN (SELECT unnest(range(0, {SIMHASH_BITS})) AS bit)
  GROUP BY doc_id, bit
),
sig AS (
  SELECT doc_id,
         sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT
           AS simhash
  FROM votes GROUP BY doc_id
)
"""

_VECS = "vecs AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)"

# Deterministic CLUSTERED derivation of the embedding corpus: all T token
# vectors of a doc move to a shared per-doc-cluster centroid plus a scaled
# copy of the original vector. The synthetic corpus is uniform (the
# ANN-hard case, where the capped rescore's proxy cut costs recall —
# bench-reported 0.86); real embedding corpora are clustered, and this
# derivation demonstrates the SAME capped pipeline at high recall there.
# Both engines compute identical doubles: integer centroid arithmetic,
# one multiply-add in textual order, round(…, 9).
CLUSTER_C, CLUSTER_ALPHA = IVF_C, 0.2
_VECS_CLUSTERED = f"""vecs0 AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
),
vecs AS (
  SELECT vec_id,
         list(round(((((vec_id // {MAXSIM_T}) % {CLUSTER_C}) * 37
                      + (pos - 1) * 11) % 17 - 8) / 8.0
                    + {CLUSTER_ALPHA} * val, 9) ORDER BY pos) AS e
  FROM (SELECT vec_id, unnest(e) AS val,
               unnest(range(1, len(e) + 1)) AS pos FROM vecs0)
  GROUP BY vec_id
)"""


def clustered_emb(emb):
    """Spark twin of _VECS_CLUSTERED (same doubles, same 9dp round)."""
    return emb.select("vec_id", F.expr(
        f"transform(embedding, (v, i) -> "
        f"round(cast((((vec_id div {MAXSIM_T}) % {CLUSTER_C}) * 37 "
        f"+ i * 11) % 17 - 8 as double) / 8.0 "
        f"+ {CLUSTER_ALPHA} * cast(v as double), 9))").alias("embedding"))
_COS = ("list_dot_product({a}.e, {b}.e) / (sqrt(list_dot_product({a}.e, {a}.e))"
        " * sqrt(list_dot_product({b}.e, {b}.e)))")


def _embedding_lsh_sql() -> str:
    """Random-hyperplane LSH near-dup oracle: the SAME deterministic ±1
    hyperplane constants as the Spark plan (dedup.hyperplanes) are inlined
    as list literals, so both engines compute identical signatures, band
    keys, and candidate sets; exact cosine verify on candidates only."""
    from colbert_live_spark.operators.dedup import hyperplanes
    planes = hyperplanes(EMB_LSH_BITS, EMB_DIM)
    per_band = EMB_LSH_BITS // EMB_LSH_BANDS
    band_exprs = []
    for b in range(EMB_LSH_BANDS):
        bits = []
        for jj in range(per_band):
            j = b * per_band + jj
            lit = "[" + ", ".join(f"{x:.1f}" for x in planes[j]) + "]"
            bits.append(f"(CASE WHEN list_dot_product(e, {lit}) > 0 "
                        f"THEN {1 << jj} ELSE 0 END)")
        band_exprs.append("(" + " + ".join(bits) + f") AS bk{b}")
    key_list = ", ".join(
        f"'{b}:' || bk{b}::VARCHAR" for b in range(EMB_LSH_BANDS))
    cos_ab = _COS.format(a="va", b="vb")
    return f"""
WITH {_VECS},
sig AS (SELECT vec_id, {", ".join(band_exprs)} FROM vecs),
keys AS (SELECT vec_id, unnest([{key_list}]) AS bkey FROM sig),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM keys a JOIN keys b ON a.bkey = b.bkey AND a.vec_id < b.vec_id
)
SELECT c.id_a, c.id_b, round({cos_ab}, {ROUND}) AS cos
FROM cand c
JOIN vecs va ON va.vec_id = c.id_a
JOIN vecs vb ON vb.vec_id = c.id_b
WHERE {cos_ab} >= {NEARDUP_COS}
"""


def _sqlcos(e1, e2):
    return (f"list_dot_product({e1}, {e2}) / "
            f"(sqrt(list_dot_product({e1}, {e1}))"
            f" * sqrt(list_dot_product({e2}, {e2})))")


def _km_chain(train_sample: int | None = None) -> tuple[str, str]:
    """(CTE chain string ending with `assigned`, final-centroid CTE name):
    fixed-iteration k-means, unrolled — a{i} = assignment under cents{i};
    cents{i+1} = element-wise means rounded to 9dp (matches the Spark
    side's per-iteration rounding — similarity.kmeans_centroids).
    ``train_sample``: Lloyd runs over the lowest-hash sample relation
    (portable md5 order, vec_id tie-break — identical to the Spark plan's
    deterministic sample); full-corpus assignment is unchanged."""
    cos = _sqlcos
    pre = ""
    tr = "vecs"
    if train_sample is not None:
        pre = f"""svecs AS (
  SELECT vec_id, e FROM vecs
  ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT ASC,
           vec_id ASC
  LIMIT {train_sample}
),
"""
        tr = "svecs"
    km = [f"""cents0 AS (
  SELECT vec_id AS centroid_id, e AS cv FROM {tr}
  ORDER BY vec_id LIMIT {IVF_C}
)"""]
    for it in range(KMEANS_ITERS):
        km.append(f"""a{it} AS (
  SELECT vec_id, e, centroid_id FROM (
    SELECT v.vec_id, v.e, c.centroid_id,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {cos("v.e", "c.cv")} DESC,
                                       c.centroid_id ASC) AS r
    FROM {tr} v CROSS JOIN cents{it} c) WHERE r = 1
)""")
        km.append(f"""cents{it + 1} AS (
  SELECT centroid_id, list(m ORDER BY pos) AS cv FROM (
    SELECT centroid_id, pos, round(avg(val), 9) AS m
    FROM (SELECT centroid_id, unnest(e) AS val,
                 unnest(range(1, len(e) + 1)) AS pos FROM a{it})
    GROUP BY centroid_id, pos)
  GROUP BY centroid_id
)""")
    cents_final = f"cents{KMEANS_ITERS}"
    chain = f"""{pre}{",".join(km)},
assigned AS (
  SELECT vec_id, e, centroid_id FROM (
    SELECT v.vec_id, v.e, c.centroid_id,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {cos("v.e", "c.cv")} DESC,
                                       c.centroid_id ASC) AS r
    FROM vecs v CROSS JOIN {cents_final} c) WHERE r = 1
)"""
    return chain, cents_final


def _ivf_sql(train_sample: int | None = None,
             nprobe: int = IVF_PROBE) -> str:
    cos = _sqlcos
    chain, cents_final = _km_chain(train_sample)
    return f"""
WITH {_VECS},
{chain},
q AS (SELECT vec_id AS query_id, e AS qe FROM vecs
      WHERE vec_id IN ({", ".join(map(str, KNN_QUERIES))})),
qprobe AS (
  SELECT query_id, qe, centroid_id FROM (
    SELECT q.query_id, q.qe, c.centroid_id,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {cos("q.qe", "c.cv")} DESC,
                              c.centroid_id ASC) AS r
    FROM q CROSS JOIN {cents_final} c) WHERE r <= {nprobe}
),
scored AS (
  SELECT p.query_id, a.vec_id,
         {cos("p.qe", "a.e")} AS cos
  FROM assigned a JOIN qprobe p ON a.centroid_id = p.centroid_id
  WHERE a.vec_id != p.query_id
),
ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank::INT AS rank, vec_id, round(cos, {ROUND}) AS cos
FROM ranked WHERE rank <= {KNN_K}
"""


_MAXSIM_DV = f"""
dv AS (
  SELECT vec_id, vec_id // {MAXSIM_T} AS doc_id,
         (vec_id % {MAXSIM_T})::INT AS tpos, e
  FROM vecs
),
q AS (
  SELECT doc_id AS query_id, tpos AS qtpos, e AS qe FROM dv
  WHERE doc_id IN ({", ".join(map(str, MAXSIM_QUERIES))})
)"""

# pivoted per-token maxes + explicit left-to-right sum: max is order-free
# selection and the T-term addition is written out, so float summation
# order matches the Spark plan exactly (engine-independent hashes)
_MAXSIM_TAIL = f"""
pm AS (
  SELECT query_id, doc_id,
         {", ".join(f"max(CASE WHEN qtpos = {t} THEN c END) AS m{t}"
                    for t in range(MAXSIM_T))}
  FROM per_tok GROUP BY query_id, doc_id
),
scored AS (
  SELECT query_id, doc_id,
         {" + ".join(f"coalesce(m{t}, 0.0)" for t in range(MAXSIM_T))}
           AS score
  FROM pm
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank::INT AS rank, doc_id, round(score, {ROUND}) AS score
FROM ranked WHERE rank <= {MAXSIM_K}
"""


def _maxsim_sql() -> str:
    return f"""
WITH {_VECS},
{_MAXSIM_DV},
per_tok AS (
  SELECT q.query_id, d.doc_id, q.qtpos, {_sqlcos("q.qe", "d.e")} AS c
  FROM dv d CROSS JOIN q WHERE d.doc_id != q.query_id
),
{_MAXSIM_TAIL}"""


def _maxsim_ivf_sql(nprobe: int = MAXSIM_NPROBE,
                    n_cand: int | None = None,
                    vecs_cte: str | None = None) -> str:
    cos = _sqlcos
    chain, cents_final = _km_chain(IVF_TRAIN_SAMPLE)
    vecs_cte = vecs_cte or _VECS
    if n_cand is None:
        cand_sql = f"""
cand AS (
  SELECT DISTINCT query_id, cdoc AS doc_id FROM (
    SELECT query_id, cdoc,
           row_number() OVER (PARTITION BY query_id, qtpos
                              ORDER BY c DESC, vec_id ASC) AS r
    FROM tok_hits) WHERE r <= {MAXSIM_NANN}
)"""
    else:
        # the n_maxsim_candidates cut: rank the surviving union by FUSED
        # observed evidence — per-token best observed cosine (max is
        # order-free selection), then an explicit left-to-right sum over
        # the T query tokens with missing tokens as 0.0, bit-identical to
        # similarity.maxsim_topk_ivf's Spark plan; doc tie-break
        fused_sql = " + ".join(
            f"coalesce(max(CASE WHEN qtpos = {t} THEN c END), 0.0)"
            for t in range(MAXSIM_T))
        cand_sql = f"""
hits AS (
  SELECT query_id, qtpos, cdoc, c FROM (
    SELECT query_id, qtpos, cdoc, c,
           row_number() OVER (PARTITION BY query_id, qtpos
                              ORDER BY c DESC, vec_id ASC) AS r
    FROM tok_hits) WHERE r <= {MAXSIM_NANN}
),
cand AS (
  SELECT query_id, cdoc AS doc_id FROM (
    SELECT query_id, cdoc,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY ({fused_sql}) DESC, cdoc ASC) AS cr
    FROM hits GROUP BY query_id, cdoc) WHERE cr <= {n_cand}
)"""
    return f"""
WITH {vecs_cte},
{chain},
{_MAXSIM_DV},
qprobe AS (
  SELECT query_id, qtpos, qe, centroid_id FROM (
    SELECT q.query_id, q.qtpos, q.qe, c.centroid_id,
           row_number() OVER (PARTITION BY q.query_id, q.qtpos
                              ORDER BY {cos("q.qe", "c.cv")} DESC,
                                       c.centroid_id ASC) AS r
    FROM q CROSS JOIN {cents_final} c) WHERE r <= {nprobe}
),
tok_hits AS (
  SELECT p.query_id, p.qtpos, a.vec_id,
         (a.vec_id // {MAXSIM_T}) AS cdoc, {cos("p.qe", "a.e")} AS c
  FROM assigned a JOIN qprobe p ON a.centroid_id = p.centroid_id
  WHERE (a.vec_id // {MAXSIM_T}) != p.query_id
),
{cand_sql},
per_tok AS (
  SELECT cd.query_id, cd.doc_id, q.qtpos, {cos("q.qe", "d.e")} AS c
  FROM cand cd
  JOIN dv d ON d.doc_id = cd.doc_id
  JOIN q ON q.query_id = cd.query_id
),
{_MAXSIM_TAIL}"""


def oracle_map() -> dict[str, str]:
    cos_ab = _COS.format(a="a", b="b")
    knn_body = f"""
WITH {_VECS},
q AS (SELECT vec_id AS query_id, e AS qe FROM vecs
      WHERE vec_id IN ({", ".join(map(str, KNN_QUERIES))})),
scored AS (
  SELECT q.query_id, a.vec_id,
         list_dot_product(q.qe, a.e) / (sqrt(list_dot_product(q.qe, q.qe))
           * sqrt(list_dot_product(a.e, a.e))) AS cos
  FROM vecs a CROSS JOIN q WHERE a.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank::INT AS rank, vec_id, round(cos, {ROUND}) AS cos
FROM ranked WHERE rank <= {KNN_K}
"""
    ivf_body = _ivf_sql()
    ivf_sampled_body = _ivf_sql(train_sample=IVF_TRAIN_SAMPLE,
                                nprobe=IVF_SAMPLED_NPROBE)
    return {
        "dedup_exact": """
WITH h AS (SELECT doc_id, md5(text) AS h FROM documents),
g AS (SELECT h, min(doc_id) AS keep_doc_id FROM h
      GROUP BY h HAVING count(*) > 1)
SELECT g.keep_doc_id, h.doc_id AS dup_doc_id
FROM h JOIN g USING (h) WHERE h.doc_id != g.keep_doc_id
""",
        # the dedup_keep oracle mirrors the SCALE path exactly: capped
        # shingles (df ≤ MAX_SH_DF) → MinHash-LSH candidates → exact
        # Jaccard verify on candidates only
        "dedup_keep": f"""
WITH {_SHINGLES_CAPPED},
{_minhash_cand_common(MAX_BAND_BUCKET)},
near_drop AS (
  SELECT DISTINCT c.doc_b AS doc_id
  FROM common c
  JOIN sizes sa ON sa.doc_id = c.doc_a
  JOIN sizes sb ON sb.doc_id = c.doc_b
  WHERE c.common / CAST(sa.n_sh + sb.n_sh - c.common AS DOUBLE)
        >= {JACCARD_T}
),
hh AS (SELECT doc_id, md5(text) AS h FROM documents),
g AS (SELECT h, min(doc_id) AS keep_doc_id FROM hh
      GROUP BY h HAVING count(*) > 1),
exact_drop AS (
  SELECT hh.doc_id FROM hh JOIN g USING (h)
  WHERE hh.doc_id != g.keep_doc_id
),
drops AS (SELECT doc_id FROM exact_drop UNION SELECT doc_id FROM near_drop)
SELECT d.doc_id, d.lang, d.n_chars FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM drops)
""",
        "ngram_jaccard": f"""
WITH {_SHINGLES},
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS common
  FROM shingles a JOIN shingles b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
{_JACCARD_TAIL}
""",
        "minhash_lsh": f"""
WITH {_SHINGLES},
sig AS (
  SELECT doc_id, perm,
         min(('0x' || substr(md5(perm::VARCHAR || ':' || shingle), 1, 15))::BIGINT)
           AS minhash
  FROM shingles CROSS JOIN (SELECT unnest(range(0, {MINHASH_N})) AS perm)
  GROUP BY doc_id, perm
),
bands AS (
  SELECT doc_id, (perm // {MINHASH_N // MINHASH_BANDS}) AS band,
         md5(array_to_string(list_sort(list(perm::VARCHAR || ':'
             || minhash::VARCHAR)), ',')) AS band_key
  FROM sig GROUP BY doc_id, band
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
common AS (
  SELECT c.doc_a, c.doc_b, count(*)::BIGINT AS common
  FROM cand c
  JOIN shingles sa ON sa.doc_id = c.doc_a
  JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
)
{_JACCARD_TAIL}
""",
        "simhash_signatures": _SIMHASH_CTES + "SELECT doc_id, simhash FROM sig",
        "simhash_pairs": _SIMHASH_CTES + f""",
chunks AS (
  SELECT doc_id, simhash, ck::VARCHAR || ':'
         || (((simhash >> (ck * 15)) & 32767)::VARCHAR) AS chunk
  FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS ck)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sig_a,
                  b.doc_id AS doc_b, b.simhash AS sig_b
  FROM chunks a JOIN chunks b
    ON a.chunk = b.chunk AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, bit_count(xor(sig_a, sig_b))::INT AS hamming
FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= {SIMHASH_HAM}
""",
        "embedding_neardup": f"""
WITH {_VECS}
SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({cos_ab}, {ROUND}) AS cos
FROM vecs a JOIN vecs b ON a.vec_id < b.vec_id
WHERE {cos_ab} >= {NEARDUP_COS}
""",
        "embedding_neardup_lsh": _embedding_lsh_sql(),
        "knn_bruteforce": knn_body,
        "knn_ivf": ivf_body,
        "knn_ivf_sampled": ivf_sampled_body,
        "maxsim_topk": _maxsim_sql(),
        "maxsim_topk_ivf": _maxsim_ivf_sql(),
        "maxsim_topk_ivf_capped": _maxsim_ivf_sql(
            nprobe=MAXSIM_CAPPED_NPROBE, n_cand=MAXSIM_NCAND),
        "maxsim_capped_clustered": _maxsim_ivf_sql(
            nprobe=MAXSIM_CAPPED_NPROBE, n_cand=MAXSIM_NCAND,
            vecs_cte=_VECS_CLUSTERED),
        "text_stats": f"""
SELECT doc_id,
       {ts.sql_token_count('text')}::INT AS n_tokens,
       round({ts.sql_punct_ratio('text')}, {ROUND}) AS punct_ratio,
       round({ts.sql_stopword_ratio('text')}, {ROUND}) AS stopword_ratio,
       round({ts.sql_quality_score('text')}, {ROUND}) AS quality
FROM documents
""",
        "lang_id": f"""
SELECT doc_id, {ts.sql_lang_id('text')} AS lang_pred FROM documents
""",
        "fingerprint": f"""
SELECT doc_id, {ts.sql_fingerprint('text')} AS fp FROM documents
""",
        # corpus text is pure ASCII (verified: octet_length(encode(text)) ==
        # length(text)), so the byte histogram equals the codepoint histogram
        "media_histogram": """
WITH codes AS (
  SELECT media_id, unicode(substr(text, i::INT, 1)) AS c FROM (
    SELECT doc_id AS media_id, text,
           unnest(range(1, strlen(text) + 1)) AS i
    FROM documents)
),
hist AS (
  SELECT media_id, (c // 16) AS dim, count(*)::BIGINT AS count
  FROM codes GROUP BY media_id, (c // 16)
),
dims AS (
  SELECT doc_id AS media_id, strlen(text)::INT AS width,
         unnest(range(0, 16)) AS dim
  FROM documents
)
SELECT d.media_id, d.width, 1 AS height, 1 AS n_frames, d.dim::INT AS dim,
       coalesce(h.count, 0)::BIGINT AS count
FROM dims d LEFT JOIN hist h ON h.media_id = d.media_id AND h.dim = d.dim
""",
    }


def query_map():
    return {
        "dedup_exact": q_dedup_exact,
        "dedup_keep": q_dedup_keep,
        "ngram_jaccard": q_ngram_jaccard,
        "minhash_lsh": q_minhash_lsh,
        "simhash_signatures": q_simhash,
        "simhash_pairs": q_simhash_pairs,
        "embedding_neardup": q_embedding_neardup,
        "embedding_neardup_lsh": q_embedding_neardup_lsh,
        "knn_bruteforce": q_knn_bruteforce,
        "knn_ivf": q_knn_ivf,
        "knn_ivf_sampled": q_knn_ivf_sampled,
        "maxsim_topk": q_maxsim_topk,
        "maxsim_topk_ivf": q_maxsim_topk_ivf,
        "maxsim_topk_ivf_capped": q_maxsim_topk_ivf_capped,
        "maxsim_capped_clustered": q_maxsim_capped_clustered,
        "media_histogram": q_media_histogram,
        "text_stats": q_text_stats,
        "lang_id": q_lang_id,
        "fingerprint": q_fingerprint,
    }
