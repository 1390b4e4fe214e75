"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1) and the
html→text extraction transform with the byte-identical-text-per-url invariant.

The input table shape is BASELINE.json's input_hint:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.
Generation mirrors the reference's fixture strategy
(``tests/db.py:19-24`` directory-of-files corpus with planted keywords,
``tests/test_colbert_live.py:16-20`` keyword→top-1 golden tests): Zipfian
filler vocabulary for head-term skew + K planted out-of-vocabulary keywords,
each with high tf in exactly one designated page and tf=1 in three others.

Everything is seeded / per-row-keyed — no wall clock, no global RNG state,
so generation is reproducible per row regardless of partitioning.
"""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, StringType, StructField, StructType, TimestampType,
)

SEED = 42
N_KEYWORDS = 16
_EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

# ~1000-word vocabulary, deterministic (word{000..999}); Zipf s≈1.07 sampling.
VOCAB = [f"word{i:03d}" for i in range(1000)]
_ZIPF_S = 1.07
_ZIPF_W = [1.0 / (r + 1) ** _ZIPF_S for r in range(len(VOCAB))]
_ZIPF_CUM = []
_acc = 0.0
for _w in _ZIPF_W:
    _acc += _w
    _ZIPF_CUM.append(_acc)
_ZIPF_TOTAL = _acc

HTML_PREFIX = "<html><head><title>p</title></head><body><p>"
HTML_SUFFIX = "</p></body></html>"

SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), False),
    StructField("html", BinaryType(), False),
    StructField("text", StringType(), False),
    StructField("lang", StringType(), False),
])


def _rng_u64(*parts: object) -> int:
    """Deterministic per-row PRNG: sha256 of the key parts → u64."""
    h = hashlib.sha256(("|".join(str(p) for p in parts) + f"|{SEED}").encode())
    return int.from_bytes(h.digest()[:8], "big")


def _zipf_word(u: int) -> str:
    x = (u / 2**64) * _ZIPF_TOTAL
    lo, hi = 0, len(_ZIPF_CUM) - 1
    while lo < hi:
        mid = (lo + hi) // 2
        if _ZIPF_CUM[mid] < x:
            lo = mid + 1
        else:
            hi = mid
    return VOCAB[lo]


def page_text(i: int, n_rows: int) -> str:
    """Deterministic body for row i: Zipfian filler + planted keywords."""
    dl = 20 + _rng_u64("len", i) % 381  # 20..400 words
    words = [_zipf_word(_rng_u64("w", i, j)) for j in range(dl)]
    # keyword planting: keyword j designates page (j * n_rows // N_KEYWORDS)
    for j in range(N_KEYWORDS):
        if n_rows < 4:
            break
        designated = (j * n_rows) // N_KEYWORDS
        kw = f"kw{j:02d}"
        if i == designated:
            words[:0] = [kw] * 5          # high tf in exactly one page
        else:
            for r in range(1, 4):          # tf=1 in three other pages
                if i == (designated + r * max(1, n_rows // 7)) % n_rows:
                    words.insert(len(words) // 2, kw)
                    break
    return " ".join(words)


def page_row(i: int, n_rows: int, n_sites: int = 10) -> tuple:
    text = page_text(i, n_rows)
    url = f"https://site{i % n_sites}.example/page/{i:08d}"
    ts = _EPOCH + dt.timedelta(seconds=(i * 9973) % 31_536_000)
    html = (HTML_PREFIX + text + HTML_SUFFIX).encode("utf-8")
    lang = "en" if i % 20 < 18 else ("de" if i % 20 == 18 else "fr")
    return (url, ts, html, text, lang)


def generate_webpages(spark, n_rows: int, n_partitions: int = 8) -> DataFrame:
    """Distributed deterministic generation: parallelize row ids, map to rows.

    At real scale the corpus arrives as an Iceberg/parquet table (S1 analog,
    `example/bench/lotte.py:21-35`); this generator exists because no external
    data is permitted in-sandbox.
    """
    rdd = spark.sparkContext.parallelize(range(n_rows), n_partitions)
    return spark.createDataFrame(
        rdd.map(lambda i: page_row(i, n_rows)), SCHEMA)


def generate_webpages_fast(spark, n_rows: int, n_partitions: int = 32,
                           include_html: bool = False) -> DataFrame:
    """Bench-scale deterministic generator: numpy Philox keyed per row id,
    vectorized Zipf sampling via searchsorted — ~1000× the throughput of the
    sha256 fixture generator, same schema and statistical shape. Distributed
    via mapInPandas over a range() DataFrame, so generation itself scales
    with executors."""
    import numpy as np
    import pandas as pd

    zipf_cum = np.array(_ZIPF_CUM) / _ZIPF_TOTAL
    vocab = np.array(VOCAB)

    def gen(batches):
        for pdf in batches:
            urls, texts, langs, tss, htmls = [], [], [], [], []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.Generator(np.random.Philox(key=SEED + i))
                dl = 20 + int(rng.integers(0, 381))
                words = vocab[np.searchsorted(zipf_cum, rng.random(dl))]
                text = " ".join(words)
                texts.append(text)
                urls.append(f"https://site{i % 10}.example/page/{i:08d}")
                tss.append(_EPOCH + dt.timedelta(seconds=(i * 9973) % 31_536_000))
                langs.append("en" if i % 20 < 18 else ("de" if i % 20 == 18 else "fr"))
                if include_html:
                    htmls.append((HTML_PREFIX + text + HTML_SUFFIX).encode())
            out = {"url": urls, "warc_ts": tss, "text": texts, "lang": langs}
            if include_html:
                out["html"] = htmls
            yield pd.DataFrame(out)

    schema = ("url string, warc_ts timestamp, text string, lang string"
              + (", html binary" if include_html else ""))
    rng_df = spark.range(0, n_rows, 1, n_partitions)
    return rng_df.mapInPandas(gen, schema=schema)


def extract_text(html_col) -> F.Column:
    """html binary → text, byte-identical to the stored ``text`` column.

    Pure JVM expression (decode + fixed-wrapper strip) — the deterministic
    stand-in for the reference's PDF→image→encode ingest transform
    (`example/cmdline/main.py:16-29`); the invariant extract(html) == text is
    asserted per url in tests (north-rule requirement).
    """
    s = F.decode(html_col, "UTF-8")
    return F.regexp_replace(
        F.regexp_replace(s, r"^\Q" + HTML_PREFIX + r"\E", ""),
        r"\Q" + HTML_SUFFIX + r"\E$", "")
