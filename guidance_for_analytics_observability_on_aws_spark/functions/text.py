"""Text column functions + the dedup evaluation corpus.

The driver's ``documents`` table contains no duplicates, so dedup operators
are exercised against a deterministically augmented corpus: exact copies
(ids +1,000,000), token-reversed variants (+2,000,000 — same content
fingerprint, different byte hash) and 90%-truncations (+3,000,000 — high
Jaccard near-dups). The augmentation is a pure per-row projection, computed
identically by :func:`corpus` (Spark) and :data:`CORPUS_CTE` (DuckDB), so
oracle comparisons stay exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = r"\s+"


def tokens(col: Column) -> Column:
    return F.split(col, TOKEN_SPLIT)


def corpus(documents: DataFrame) -> DataFrame:
    toks = tokens(F.col("text"))
    n90 = F.greatest(F.lit(1), F.floor(F.size(toks) * 0.9).cast("int"))
    base = documents.select("doc_id", "text", "lang", "source")
    exact = documents.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "lang", "source"
    )
    reverse = documents.filter(F.col("doc_id") % 25 == 5).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.array_join(F.reverse(toks), " ").alias("text"),
        "lang",
        "source",
    )
    trunc = documents.filter(F.col("doc_id") % 25 == 10).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.array_join(F.slice(toks, 1, n90), " ").alias("text"),
        "lang",
        "source",
    )
    return base.unionByName(exact).unionByName(reverse).unionByName(trunc)


CORPUS_CTE = r"""
doc_toks AS (
  SELECT doc_id, text, lang, source,
         regexp_split_to_array(text, '\s+') AS toks
  FROM documents
),
corpus AS (
  SELECT doc_id, text, lang, source FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text, lang, source FROM documents WHERE doc_id % 25 = 0
  UNION ALL
  SELECT doc_id + 2000000, array_to_string(list_reverse(toks), ' '), lang, source
  FROM doc_toks WHERE doc_id % 25 = 5
  UNION ALL
  SELECT doc_id + 3000000,
         array_to_string(toks[1:GREATEST(1, CAST(FLOOR(len(toks) * 0.9) AS INTEGER))], ' '),
         lang, source
  FROM doc_toks WHERE doc_id % 25 = 10
)
"""


def shingles(toks: Column, k: int = 3) -> Column:
    """Distinct k-token shingles (1-based positional window join)."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda j: F.concat_ws(
                " ", *[F.element_at(toks, j + off) for off in range(k)]
            ),
        )
    )


SHINGLES_SQL = (
    "list_distinct(list_transform(generate_series(1, len(toks) - 2), "
    "j -> toks[j] || ' ' || toks[j+1] || ' ' || toks[j+2]))"
)
