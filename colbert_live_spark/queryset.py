"""Reference query sets (FIXTURES.md §2).

Two families:
- :data:`DOC_QUERIES` — over the driver's ``documents`` table (29-word corpus
  vocabulary observed at all SFs). Mix mirrors the fixture spec: single terms,
  two-term, three-term including head terms (WAND pruning stressors), terms
  absent from the corpus (empty-posting path,
  `colbert_live/colbert_live.py:196-198`), duplicate-term queries (query
  pooling analog, `colbert_live/colbert_live.py:22-49`), and the rare planted
  term ``dup``.
- :func:`webpage_queries` — for the synthetic webpages corpus: the 16 planted
  keywords (golden top-1, analog of `tests/test_colbert_live.py:19-20`) plus
  vocabulary mixes.
"""

from __future__ import annotations

DOC_QUERIES: list[tuple[str, str]] = [
    ("q001", "spark"),
    ("q002", "join"),
    ("q003", "dup"),                     # rare term → high idf
    ("q004", "hash join"),
    ("q005", "merge sort"),
    ("q006", "stream window batch"),
    ("q007", "join hash row"),           # all head terms
    ("q008", "customer order line"),
    ("q009", "zzzmissing"),              # empty-posting path
    ("q010", "spark zzzmissing"),        # partial miss
    ("q011", "spark spark join"),        # duplicate query term → qtf=2
    ("q012", "vector scan filter slow"),
]


# Phrase queries (token-ADJACENCY semantics — discriminates from plain
# conjunctive matching, whose doc sets are strict supersets): two-term and
# three-term phrases over corpus vocabulary, a repeated-token phrase, a
# single-term phrase (≡ conjunctive), and a no-match phrase.
PHRASE_QUERIES: list[tuple[str, str]] = [
    ("p001", "hash join"),
    ("p002", "batch batch"),
    ("p003", "stream window batch"),
    ("p004", "order sort table"),
    ("p005", "dup"),
    ("p006", "spark zzzmissing"),
]


def webpage_queries(n_keywords: int = 16) -> list[tuple[str, str]]:
    qs = [(f"kw{j:02d}", f"kw{j:02d}") for j in range(n_keywords)]
    qs += [
        ("wq01", "word000 word001"),
        ("wq02", "word005 word100 word500"),
        ("wq03", "word000 word000 word013"),
        ("wq04", "nosuchtoken"),
        ("wq05", "word002 nosuchtoken"),
    ]
    return qs
