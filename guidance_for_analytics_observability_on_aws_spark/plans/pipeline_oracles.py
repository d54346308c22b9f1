"""DuckDB oracle SQL for the training-data pipeline group (P).

Mirrors ``operators/pipeline.py`` op-for-op. ``dup_groups`` reuses the
MinHash-LSH pair pipeline CTEs from ``dedup_oracles`` verbatim and resolves
transitive closure with a recursive CTE — DuckDB's declarative equivalent of
the Spark side's iterative min-label propagation.
"""

from ..functions.hashing import md5_int_sql
from ..operators.pipeline import (
    PACK_CONTEXT,
    SAMPLE_PER_STRATUM,
    SPLIT_TRAIN,
    SPLIT_VAL,
)
from .dedup_oracles import MINHASH_BUCKET_CTES

PIPELINE_ORACLES: dict[str, str] = {}

_WS_TOKENS = "CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT)"

PIPELINE_ORACLES["train_val_split"] = f"""
WITH per_doc AS (
  SELECT CASE WHEN {md5_int_sql("CAST(doc_id AS VARCHAR)", 4)} % 100 < {SPLIT_TRAIN} THEN 'train'
              WHEN {md5_int_sql("CAST(doc_id AS VARCHAR)", 4)} % 100 < {SPLIT_VAL} THEN 'val'
              ELSE 'test' END AS split,
         source,
         {_WS_TOKENS} AS ws_tokens,
         CAST(n_chars AS BIGINT) AS n_chars
  FROM documents
)
SELECT split, source,
       COUNT(*) AS n_docs,
       CAST(SUM(ws_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM per_doc GROUP BY 1, 2
"""

PIPELINE_ORACLES["sample_stratified"] = f"""
WITH keyed AS (
  SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS sample_key
  FROM documents
),
ranked AS (
  SELECT source, doc_id, sample_key,
         CAST(ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY sample_key, doc_id) AS BIGINT) AS rank
  FROM keyed
)
SELECT source, rank, doc_id, sample_key
FROM ranked WHERE rank <= {SAMPLE_PER_STRATUM}
"""

PIPELINE_ORACLES["pack_sequences"] = f"""
WITH per_doc AS (
  SELECT doc_id, source, {_WS_TOKENS} AS ws_tokens FROM documents
),
binned AS (
  SELECT doc_id, source, ws_tokens,
         CAST(FLOOR((SUM(ws_tokens) OVER (PARTITION BY source ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - ws_tokens) / {PACK_CONTEXT}) AS BIGINT) AS bin
  FROM per_doc
)
SELECT source, bin,
       COUNT(*) AS n_docs,
       CAST(SUM(ws_tokens) AS BIGINT) AS bin_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM binned GROUP BY 1, 2
"""

# dup_groups: the D3 bucket CTE chain feeds a pair CTE; transitive closure +
# min-label resolved with a recursive CTE (DuckDB's declarative equivalent of
# the Spark side's iterative min-label propagation).
PIPELINE_ORACLES["dup_groups"] = (
    MINHASH_BUCKET_CTES.replace("WITH ", "WITH RECURSIVE ", 1)
    + """,
mh_pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a
  JOIN buckets b ON a.band_id = b.band_id AND a.band_hash = b.band_hash
               AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM mh_pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM mh_pairs
),
reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
labels AS (
  SELECT src, LEAST(src, MIN(dst)) AS group_id FROM reach GROUP BY src
)
SELECT group_id,
       COUNT(*) AS n_docs,
       array_to_string(list_sort(list(src)), ',') AS doc_ids
FROM labels GROUP BY 1 HAVING COUNT(*) >= 2
"""
)
