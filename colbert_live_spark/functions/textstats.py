"""Text-analysis functions for training-data pipelines: token counting,
quality scoring, n-gram/stopword language ID, rolling-hash fingerprints.
All pure JVM Catalyst expressions (whole-stage codegen) with exact DuckDB
oracle equivalents; hashes are portable md5-prefix integers.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from colbert_live_spark.functions.tokenize import tokenize_expr

EN_STOP = ["the", "a", "and", "of", "to", "in", "is", "it"]
DE_STOP = ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"]
FR_STOP = ["le", "la", "les", "et", "est", "un", "une", "de"]
ES_STOP = ["el", "la", "los", "las", "es", "un", "una", "de"]

MOD = 1_000_000_007
ROLL_B = 31


def token_count(text: Column) -> Column:
    return F.size(tokenize_expr(text))


def punct_ratio(text: Column) -> Column:
    """share of characters that are neither alphanumeric nor whitespace."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9\s]", "")
    return F.when(F.length(text) > 0,
                  F.length(stripped) / F.length(text)).otherwise(0.0)


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or EN_STOP
    toks = tokenize_expr(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(sw)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(0.0)


def quality_score(text: Column) -> Column:
    """Heuristic in [0,1]: rewards medium length, low punctuation noise,
    presence of stopwords (prose-ness). The BM25-era analog of model-based
    quality filters; deterministic and oracle-checkable."""
    n_tok = token_count(text)
    len_score = F.least(n_tok / 100.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - 4.0 * punct_ratio(text))
    sw_score = F.least(4.0 * stopword_ratio(text), F.lit(1.0))
    return (0.4 * len_score + 0.3 * punct_pen + 0.3 * sw_score)


def lang_hits(text: Column, stopwords: list[str]) -> Column:
    return F.size(F.filter(tokenize_expr(text), lambda t: t.isin(stopwords)))


def lang_id(text: Column) -> Column:
    """argmax of stopword hits across {en,de,fr,es}; ties and zero-hit →
    'und' (undetermined). Deterministic tie-break by fixed language order."""
    en, de = lang_hits(text, EN_STOP), lang_hits(text, DE_STOP)
    fr, es = lang_hits(text, FR_STOP), lang_hits(text, ES_STOP)
    best = F.greatest(en, de, fr, es)
    n_best = ((en == best).cast("int") + (de == best).cast("int")
              + (fr == best).cast("int") + (es == best).cast("int"))
    return (F.when((best == 0) | (n_best > 1), F.lit("und"))
            .when(en == best, F.lit("en"))
            .when(de == best, F.lit("de"))
            .when(fr == best, F.lit("fr"))
            .otherwise(F.lit("es")))


def token_hash(tok: Column) -> Column:
    """portable 28-bit token hash mod 1e9+7."""
    return F.conv(F.substring(F.md5(tok), 1, 7), 16, 10).cast("long") % MOD


def fingerprint(text: Column) -> Column:
    """Rolling polynomial hash over the token sequence:
    h = fold(h*31 + hash(tok)) mod 1e9+7 — order-sensitive (re-orderings
    change it), whitespace/punct-insensitive (tokenizer-normalized)."""
    toks = tokenize_expr(text)
    return F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda acc, t: (acc * ROLL_B + token_hash(t)) % MOD)


# ---- DuckDB oracle fragments (same formulas; {col} = text column name) ----

def _sql_tok(col: str) -> str:
    from colbert_live_spark.functions.tokenize import DUCKDB_TOKENIZE
    return DUCKDB_TOKENIZE.format(col=col)


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def sql_token_count(col: str) -> str:
    return f"len({_sql_tok(col)})"


def sql_punct_ratio(col: str) -> str:
    return (f"CASE WHEN length({col}) > 0 THEN "
            f"length(regexp_replace({col}, '[A-Za-z0-9\\s]', '', 'g'))"
            f" / CAST(length({col}) AS DOUBLE) ELSE 0.0 END")


def sql_lang_hits(col: str, words: list[str]) -> str:
    return (f"len(list_filter({_sql_tok(col)},"
            f" t -> list_contains({_sql_list(words)}, t)))")


def sql_stopword_ratio(col: str, words: list[str] | None = None) -> str:
    w = _sql_list(words or EN_STOP)
    return (f"CASE WHEN len({_sql_tok(col)}) > 0 THEN "
            f"len(list_filter({_sql_tok(col)}, t -> list_contains({w}, t)))"
            f" / CAST(len({_sql_tok(col)}) AS DOUBLE) ELSE 0.0 END")


def sql_quality_score(col: str) -> str:
    return (f"0.4 * least(len({_sql_tok(col)}) / 100.0, 1.0)"
            f" + 0.3 * greatest(0.0, 1.0 - 4.0 * ({sql_punct_ratio(col)}))"
            f" + 0.3 * least(4.0 * ({sql_stopword_ratio(col)}), 1.0)")


def sql_lang_id(col: str) -> str:
    en, de = sql_lang_hits(col, EN_STOP), sql_lang_hits(col, DE_STOP)
    fr, es = sql_lang_hits(col, FR_STOP), sql_lang_hits(col, ES_STOP)
    best = f"greatest({en}, {de}, {fr}, {es})"
    nbest = (f"(({en} = {best})::INT + ({de} = {best})::INT"
             f" + ({fr} = {best})::INT + ({es} = {best})::INT)")
    return (f"CASE WHEN {best} = 0 OR {nbest} > 1 THEN 'und'"
            f" WHEN {en} = {best} THEN 'en'"
            f" WHEN {de} = {best} THEN 'de'"
            f" WHEN {fr} = {best} THEN 'fr' ELSE 'es' END")


def sql_fingerprint(col: str) -> str:
    hashes = (f"list_transform({_sql_tok(col)}, t ->"
              f" CAST(('0x' || substr(md5(t), 1, 7)) AS BIGINT) % {MOD})")
    return (f"CASE WHEN len({_sql_tok(col)}) = 0 THEN 0 ELSE "
            f"list_reduce(list_prepend(CAST(0 AS BIGINT), {hashes}),"
            f" (acc, t) -> (acc * {ROLL_B} + t) % {MOD}) END")
