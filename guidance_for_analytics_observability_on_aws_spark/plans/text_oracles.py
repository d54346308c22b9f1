"""DuckDB oracle SQL for text analysis (X) and multimodal (M) groups."""

from ..functions.text import CORPUS_CTE, SHINGLES_SQL
from ..operators.textops import (
    BPE_PATTERN,
    GOPHER_ALPHA_MIN,
    GOPHER_MWL_HI,
    GOPHER_MWL_LO,
    GOPHER_STOP_MIN,
    GOPHER_SYMBOL_MAX,
    GOPHER_WORDS_HI,
    GOPHER_WORDS_LO,
    STOPWORDS,
)

TEXT_ORACLES: dict[str, str] = {}

_STOP_LIST = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"

TEXT_ORACLES["text_lang_id"] = r"""
WITH train AS (
  SELECT lang, unnest(regexp_split_to_array(text, '\s+')) AS token
  FROM documents WHERE doc_id % 2 = 0
),
freq AS (
  SELECT lang, token, COUNT(*) AS freq FROM train GROUP BY 1, 2
),
profile AS (
  SELECT lang AS profile_lang, token FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY freq DESC, token) AS rn
    FROM freq
  ) WHERE rn <= 20
),
test AS (
  SELECT doc_id, lang AS actual_lang,
         unnest(list_distinct(regexp_split_to_array(text, '\s+'))) AS token
  FROM documents WHERE doc_id % 2 = 1
),
scores AS (
  SELECT t.doc_id, t.actual_lang, p.profile_lang, COUNT(*) AS score
  FROM test t JOIN profile p USING (token)
  GROUP BY 1, 2, 3
),
best AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, profile_lang) AS rn
  FROM scores
)
SELECT doc_id, profile_lang AS predicted_lang, actual_lang,
       CAST(score AS BIGINT) AS marker_hits,
       profile_lang = actual_lang AS correct
FROM best WHERE rn = 1
"""

TEXT_ORACLES["text_quality_score"] = f"""
WITH base AS (
  SELECT doc_id, lang, source,
         CAST(length(text) AS BIGINT) AS n_chars_text,
         CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                              t -> list_contains({_STOP_LIST}, t))) AS BIGINT)
           AS stopword_count
  FROM documents
),
scored AS (
  SELECT doc_id, lang, source, n_chars_text, n_tokens, stopword_count,
         stopword_count / n_tokens AS stop_ratio,
         (n_chars_text - (n_tokens - 1)) / n_tokens AS avg_token_len,
         LEAST(1.0, 0.2 + 0.5 * LEAST(stopword_count / n_tokens * 4, 1.0)
                        + 0.3 * LEAST(n_tokens / 200.0, 1.0)) AS quality
  FROM base
)
SELECT *,
       CASE WHEN quality >= 0.8 THEN 'high'
            WHEN quality >= 0.5 THEN 'medium'
            ELSE 'low' END AS quality_band
FROM scored
"""

TEXT_ORACLES["text_gopher_quality"] = f"""
WITH base AS (
  SELECT doc_id, lang, source,
         regexp_split_to_array(text, '\\s+') AS toks,
         CAST(len(regexp_extract_all(text, '#|\\.\\.\\.|…')) AS BIGINT)
           AS n_symbols
  FROM documents
),
sig AS (
  SELECT doc_id, lang, source,
         CAST(len(toks) AS BIGINT) AS n_words,
         CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT)
           AS sum_word_len,
         n_symbols,
         CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))
           AS BIGINT) AS n_alpha_words,
         CAST(len(list_intersect(list_distinct(toks), {_STOP_LIST}))
           AS BIGINT) AS n_stop_types
  FROM base
),
scored AS (
  SELECT doc_id, lang, source, n_words,
         sum_word_len / n_words AS mean_word_len,
         n_symbols / n_words AS symbol_ratio,
         n_alpha_words / n_words AS alpha_frac,
         n_stop_types
  FROM sig
)
SELECT *,
       n_words >= {GOPHER_WORDS_LO} AND n_words <= {GOPHER_WORDS_HI} AS words_ok,
       mean_word_len >= {GOPHER_MWL_LO} AND mean_word_len <= {GOPHER_MWL_HI} AS mwl_ok,
       symbol_ratio <= {GOPHER_SYMBOL_MAX} AS symbol_ok,
       alpha_frac >= {GOPHER_ALPHA_MIN} AS alpha_ok,
       n_stop_types >= {GOPHER_STOP_MIN} AS stop_ok,
       (n_words >= {GOPHER_WORDS_LO} AND n_words <= {GOPHER_WORDS_HI})
         AND (mean_word_len >= {GOPHER_MWL_LO} AND mean_word_len <= {GOPHER_MWL_HI})
         AND symbol_ratio <= {GOPHER_SYMBOL_MAX}
         AND alpha_frac >= {GOPHER_ALPHA_MIN}
         AND n_stop_types >= {GOPHER_STOP_MIN} AS gopher_pass
FROM scored
"""

# X22: the Gopher line-shape rules — the SAME line convention as the
# operator (real newlines first, blocks wrapped at LINE_WRAP_TOKENS
# tokens), rebuilt in DuckDB list algebra; list slicing clamps at the
# list end exactly like Spark's slice.
from ..operators.textops import (  # noqa: E402
    GOPHER_BULLET_MAX,
    GOPHER_ELLIPSIS_MAX,
    LINE_WRAP_TOKENS,
)

TEXT_ORACLES["text_gopher_line_shape"] = f"""
WITH blocks AS (
  SELECT doc_id, lang, source, unnest(string_split(text, chr(10))) AS block
  FROM documents
),
blk AS (
  SELECT doc_id, lang, source,
         regexp_split_to_array(block, '\\s+') AS btoks
  FROM blocks
),
winidx AS (
  SELECT doc_id, lang, source, btoks,
         unnest(generate_series(1, GREATEST(1,
           CAST(CEIL(len(btoks) / {float(LINE_WRAP_TOKENS)}) AS INTEGER)))) AS i
  FROM blk
),
lines AS (
  SELECT doc_id, lang, source,
         array_to_string(
           btoks[((i - 1) * {LINE_WRAP_TOKENS} + 1):(i * {LINE_WRAP_TOKENS})],
           ' ') AS line
  FROM winidx
),
sig AS (
  SELECT doc_id, lang, source,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(CASE WHEN regexp_matches(line, '^[-*•‣·]')
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_bullet_lines,
         CAST(SUM(CASE WHEN regexp_matches(line, '(\\.\\.\\.|…)$')
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_ellipsis_lines
  FROM lines GROUP BY 1, 2, 3
)
SELECT doc_id, lang, source, n_lines, n_bullet_lines, n_ellipsis_lines,
       n_bullet_lines / n_lines AS bullet_frac,
       n_ellipsis_lines / n_lines AS ellipsis_frac,
       n_bullet_lines / n_lines <= {GOPHER_BULLET_MAX} AS bullet_ok,
       n_ellipsis_lines / n_lines <= {GOPHER_ELLIPSIS_MAX} AS ellipsis_ok,
       n_bullet_lines / n_lines <= {GOPHER_BULLET_MAX}
         AND n_ellipsis_lines / n_lines <= {GOPHER_ELLIPSIS_MAX}
         AS line_shape_pass
FROM sig
"""

TEXT_ORACLES["text_token_count"] = f"""
WITH per_doc AS (
  SELECT source,
         CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS ws_tokens,
         CAST(len(regexp_extract_all(lower(text), '{BPE_PATTERN}')) AS BIGINT) AS bpe_tokens
  FROM documents
),
agg AS (
  SELECT source,
         COUNT(*) AS n_docs,
         CAST(SUM(ws_tokens) AS BIGINT) AS total_ws_tokens,
         CAST(SUM(bpe_tokens) AS BIGINT) AS total_bpe_tokens,
         MAX(ws_tokens) AS max_ws_tokens,
         MIN(ws_tokens) AS min_ws_tokens
  FROM per_doc GROUP BY 1
)
SELECT *,
       total_ws_tokens / n_docs AS avg_ws_tokens,
       total_bpe_tokens / n_docs AS avg_bpe_tokens
FROM agg
"""

TEXT_ORACLES["text_fingerprint"] = f"""
WITH {CORPUS_CTE},
fps AS (
  SELECT md5(array_to_string(list_sort(list_distinct(
           regexp_split_to_array(text, '\\s+'))), ' ')) AS fingerprint,
         doc_id
  FROM corpus
)
SELECT fingerprint,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS keep_doc_id,
       array_to_string(list_sort(list(doc_id)), ',') AS doc_ids
FROM fps
GROUP BY 1
HAVING COUNT(*) >= 2
"""

TEXT_ORACLES["docs_stats_by_source"] = """
WITH agg AS (
  SELECT source, lang,
         COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         MIN(n_chars) AS min_chars,
         MAX(n_chars) AS max_chars
  FROM documents GROUP BY 1, 2
)
SELECT *, total_chars / n_docs AS avg_chars FROM agg
"""

TEXT_ORACLES["mm_binary_meta"] = """
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS modality,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       substr(hex(encode(text)), 1, 8) AS magic_hex,
       CASE WHEN doc_id % 3 = 0 THEN 64 + (doc_id * 7) % 1856 END AS width,
       CASE WHEN doc_id % 3 = 0 THEN 64 + (doc_id * 13) % 1016 END AS height,
       CASE WHEN doc_id % 3 = 1 THEN 8000 * (1 + doc_id % 5) END AS sample_rate,
       CASE WHEN doc_id % 3 = 1 THEN n_chars * 10 END AS duration_ms,
       CASE WHEN doc_id % 3 = 2 THEN CAST(FLOOR(n_chars / 16) AS BIGINT) END AS n_frames
FROM documents
"""

TEXT_ORACLES["mm_frame_sample"] = """
WITH meta AS (
  SELECT doc_id, CAST(FLOOR(n_chars / 16) AS BIGINT) AS n_frames
  FROM documents
  WHERE doc_id % 3 = 2 AND CAST(FLOOR(n_chars / 16) AS BIGINT) >= 1
),
frames AS (
  SELECT doc_id, n_frames, unnest(generate_series(0, n_frames - 1, 5)) AS frame_idx
  FROM meta
)
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx, n_frames,
       frame_idx * 1000.0 / 24.0 AS frame_ts_ms
FROM frames
"""

TEXT_ORACLES["text_winnow_fingerprint"] = """
WITH grams AS (
  SELECT doc_id,
         list_transform(range(1, len(text) - 8 + 2),
           i -> CAST('0x' || substr(md5(substr(text, i, 8)), 1, 12) AS BIGINT)) AS gh
  FROM documents
  WHERE len(text) >= 11
),
per_doc AS (
  SELECT doc_id,
         CAST(len(gh) AS BIGINT) AS n_grams,
         list_sort(list_distinct(list_transform(range(1, len(gh) - 4 + 2),
           j -> list_min(list_slice(gh, j, j + 3))))) AS fp
  FROM grams
),
sigs AS (
  SELECT doc_id, n_grams,
         CAST(len(fp) AS BIGINT) AS n_selected,
         md5(array_to_string(list_transform(fp, x -> CAST(x AS VARCHAR)), ',')) AS signature
  FROM per_doc
)
SELECT signature,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS keep_doc_id,
       CAST(MIN(n_grams) AS BIGINT) AS n_grams,
       CAST(MIN(n_selected) AS BIGINT) AS n_selected,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids
FROM sigs
GROUP BY 1
"""

TEXT_ORACLES["mm_feature_extract"] = """
WITH codes AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS modality,
         list_transform(string_split(text, ''), c -> ascii(c)) AS codes
  FROM documents
)
SELECT doc_id,
       modality,
       CAST(len(codes) AS BIGINT) AS n_units,
       CAST(list_sum(codes) AS BIGINT) AS code_sum,
       array_to_string(list_transform(range(0, 16),
         b -> CAST(len(list_filter(codes, c -> c % 16 = b)) AS VARCHAR)), ',') AS nibble_hist
FROM codes
"""

from ..operators.textops import PII_EMAIL, PII_PHONE  # noqa: E402
from ..functions.hashing import md5_int_sql  # noqa: E402

TEXT_ORACLES["text_pii_redact"] = f"""
WITH planted AS (
  SELECT doc_id, source,
         (CASE WHEN doc_id % 10 = 0
               THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
               ELSE text END)
         || (CASE WHEN doc_id % 15 = 0 THEN ' call 555-0199 today' ELSE '' END)
           AS text
  FROM documents
),
per_doc AS (
  SELECT source,
         CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS BIGINT) AS n_emails,
         CAST(len(regexp_extract_all(text, '{PII_PHONE}')) AS BIGINT) AS n_phones,
         regexp_replace(regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g'),
                        '{PII_PHONE}', '<PHONE>', 'g') AS redacted
  FROM planted
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_emails) AS BIGINT) AS total_emails,
       CAST(SUM(n_phones) AS BIGINT) AS total_phones,
       CAST(SUM(CASE WHEN n_emails > 0 OR n_phones > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_redacted_docs,
       CAST(SUM({md5_int_sql("redacted", 12)}) AS BIGINT) AS redacted_checksum
FROM per_doc GROUP BY 1
"""

TEXT_ORACLES["text_bigram_stats"] = """
WITH base AS (
  SELECT lang, regexp_split_to_array(text, '\\s+') AS t FROM documents
),
bigrams AS (
  SELECT lang,
         unnest(list_transform(generate_series(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i + 1])) AS bigram
  FROM base WHERE len(t) >= 2
),
counts AS (
  SELECT lang, bigram, COUNT(*) AS n FROM bigrams GROUP BY 1, 2
),
ranked AS (
  SELECT lang, bigram, n,
         CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, bigram)
              AS BIGINT) AS rank
  FROM counts
)
SELECT lang, rank, bigram, n FROM ranked WHERE rank <= 5
"""

TEXT_ORACLES["mm_audio_chunks"] = """
WITH meta AS (
  SELECT doc_id,
         8000 * (1 + doc_id % 5) AS sample_rate,
         n_chars * 10 AS duration_ms
  FROM documents
  WHERE doc_id % 3 = 1 AND n_chars * 10 >= 1
),
chunks AS (
  SELECT doc_id, sample_rate, duration_ms,
         unnest(generate_series(0, CAST(FLOOR((duration_ms - 1) / 10000) AS BIGINT)))
           AS chunk_idx
  FROM meta
)
SELECT doc_id, chunk_idx,
       chunk_idx * 10000 AS chunk_start_ms,
       LEAST(chunk_idx * 10000 + 10000, duration_ms) AS chunk_end_ms,
       (LEAST(chunk_idx * 10000 + 10000, duration_ms) - chunk_idx * 10000)
         * sample_rate // 1000 AS n_samples
FROM chunks
"""

TEXT_ORACLES["text_inverted_index"] = """
WITH postings AS (
  SELECT DISTINCT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
  FROM documents
),
index_t AS (
  SELECT term, COUNT(*) AS doc_freq,
         array_to_string(list_sort(list(doc_id))[1:50], ',') AS postings_head
  FROM postings WHERE term != ''
  GROUP BY 1
)
SELECT term, doc_freq, postings_head
FROM index_t
WHERE term IN ('the', 'data', 'spark', 'error')
"""

TEXT_ORACLES["text_lang_confusion"] = f"""
WITH preds AS ({TEXT_ORACLES["text_lang_id"]}),
cells AS (
  SELECT actual_lang, predicted_lang, COUNT(*) AS n_docs
  FROM preds GROUP BY 1, 2
)
SELECT actual_lang, predicted_lang, n_docs,
       n_docs / CAST(SUM(n_docs) OVER (PARTITION BY actual_lang) AS BIGINT)
         AS row_share,
       actual_lang = predicted_lang AS is_diagonal
FROM cells
"""

TEXT_ORACLES["text_repetition_stats"] = r"""
WITH base AS (
  SELECT doc_id, source, regexp_split_to_array(text, '\s+') AS toks
  FROM documents
  WHERE len(regexp_split_to_array(text, '\s+')) >= 2
),
tok_rows AS (SELECT doc_id, source, unnest(toks) AS token FROM base),
per_tok AS (
  SELECT doc_id, source, token, COUNT(*) AS cnt FROM tok_rows GROUP BY 1, 2, 3
),
doc_tok AS (
  SELECT doc_id, source, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
         COUNT(*) AS n_distinct, CAST(MAX(cnt) AS BIGINT) AS top_token_cnt
  FROM per_tok GROUP BY 1, 2
),
big_rows AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
         j -> toks[j] || ' ' || toks[j + 1])) AS bigram
  FROM base
),
per_big AS (SELECT doc_id, bigram, COUNT(*) AS cnt FROM big_rows GROUP BY 1, 2),
doc_big AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
         CAST(MAX(cnt) AS BIGINT) AS top_bigram_cnt
  FROM per_big GROUP BY 1
),
per_doc AS (SELECT * FROM doc_tok JOIN doc_big USING (doc_id))
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN n_distinct / n_tokens < 0.3
                      OR top_bigram_cnt / n_bigrams > 0.18
                THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_distinct) AS BIGINT) AS total_distinct,
       MAX(top_bigram_cnt / n_bigrams) AS max_top_bigram_share
FROM per_doc GROUP BY 1
"""

# M7: DuckDB mirror of the shard manifest (modality/metadata derivation
# matches mm_binary_meta's arithmetic; cumulative bytes via window).
TEXT_ORACLES["mm_shard_manifest"] = """
WITH meta AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS modality,
         CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
  FROM documents
),
cum AS (
  SELECT *,
         CAST(SUM(byte_len) OVER (PARTITION BY modality ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_bytes
  FROM meta
),
sharded AS (
  SELECT *, CAST(FLOOR((cum_bytes - byte_len) / 65536) AS BIGINT) AS shard
  FROM cum
)
SELECT modality, shard,
       COUNT(*) AS n_payloads,
       CAST(SUM(byte_len) AS BIGINT) AS shard_bytes,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM sharded GROUP BY 1, 2
"""

TEXT_ORACLES["text_top_terms"] = r"""
WITH tok AS (
  SELECT source, unnest(regexp_split_to_array(text, '\s+')) AS token
  FROM documents
),
tf AS (SELECT source, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT token, COUNT(*) AS df_sources FROM tf GROUP BY 1),
ns AS (SELECT COUNT(DISTINCT source) AS n_sources FROM documents),
scored AS (
  SELECT t.source, t.token, t.tf, d.df_sources,
         t.tf * ns.n_sources / d.df_sources AS score
  FROM tf t JOIN df d USING (token), ns
),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY score DESC, token) AS BIGINT) AS rank
  FROM scored
)
SELECT source, rank, token, tf, df_sources, score
FROM ranked WHERE rank <= 5
"""

TEXT_ORACLES["text_tfidf_topk"] = r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, COUNT(*) AS df_docs FROM tf GROUP BY 1),
nd AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.term, t.tf, d.df_docs,
         t.tf * nd.n_docs / d.df_docs AS score
  FROM tf t JOIN df d USING (term), nd
),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
            ORDER BY score DESC, term) AS BIGINT) AS rank
  FROM scored
)
SELECT doc_id, rank, term, tf, df_docs, score
FROM ranked WHERE rank <= 3
"""

TEXT_ORACLES["text_bigram_lift"] = """
WITH base AS (
  SELECT lang, regexp_split_to_array(text, '\\s+') AS t FROM documents
),
bigrams AS (
  SELECT lang,
         unnest(list_transform(generate_series(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i + 1])) AS bigram
  FROM base WHERE len(t) >= 2
),
pair_counts AS (
  SELECT lang, bigram, COUNT(*) AS n_ab FROM bigrams GROUP BY 1, 2
),
n_positions AS (
  SELECT lang, CAST(SUM(n_ab) AS BIGINT) AS n_positions
  FROM pair_counts GROUP BY 1
),
unigrams AS (
  SELECT lang, unnest(regexp_split_to_array(text, '\\s+')) AS token
  FROM documents
),
uni_counts AS (
  SELECT lang, token, COUNT(*) AS n_tok FROM unigrams GROUP BY 1, 2
),
split AS (
  SELECT lang, CAST(n_ab AS BIGINT) AS n_ab,
         split_part(bigram, ' ', 1) AS w1,
         split_part(bigram, ' ', 2) AS w2
  FROM pair_counts WHERE n_ab >= 5
),
joined AS (
  SELECT s.lang, s.rank_w1 AS w1, s.w2, s.n_ab,
         CAST(a.n_tok AS BIGINT) AS n_a, CAST(b.n_tok AS BIGINT) AS n_b,
         p.n_positions,
         (p.n_positions * s.n_ab) / (CAST(a.n_tok AS BIGINT) * CAST(b.n_tok AS BIGINT)) AS lift
  FROM (SELECT lang, n_ab, w1 AS rank_w1, w2 FROM split) s
  JOIN uni_counts a ON a.lang = s.lang AND a.token = s.rank_w1
  JOIN uni_counts b ON b.lang = s.lang AND b.token = s.w2
  JOIN n_positions p ON p.lang = s.lang
),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY lang
            ORDER BY lift DESC, w1, w2) AS BIGINT) AS rank
  FROM joined
)
SELECT lang, rank, w1, w2, n_ab, n_a, n_b, n_positions, lift
FROM ranked WHERE rank <= 5
"""

# M9: byte-budget media sample — mm_binary_meta's modality/byte
# derivation, md5-permutation ranking, inclusive cum <= budget selection.
TEXT_ORACLES["mm_media_sample"] = """
WITH meta AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS modality,
         CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
         md5(CAST(doc_id AS VARCHAR)) AS sample_key
  FROM documents
),
budgets AS (
  SELECT modality, CAST(COUNT(*) AS BIGINT) AS n_total,
         CAST(SUM(byte_len) AS BIGINT) AS total_bytes,
         CAST(SUM(byte_len) AS BIGINT) // 4 AS budget_bytes
  FROM meta GROUP BY 1
),
cum AS (
  SELECT m.*,
         CAST(SUM(byte_len) OVER (PARTITION BY modality
              ORDER BY sample_key, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_bytes
  FROM meta m
),
flagged AS (
  SELECT c.modality, c.byte_len, b.n_total, b.total_bytes, b.budget_bytes,
         CASE WHEN c.cum_bytes <= b.budget_bytes THEN 1 ELSE 0 END AS selected
  FROM cum c JOIN budgets b USING (modality)
)
SELECT modality, MAX(n_total) AS n_total, MAX(total_bytes) AS total_bytes,
       MAX(budget_bytes) AS budget_bytes,
       CAST(SUM(selected) AS BIGINT) AS n_selected,
       CAST(SUM(selected * byte_len) AS BIGINT) AS selected_bytes,
       CAST(CAST(SUM(selected * byte_len) AS BIGINT) AS DOUBLE)
         / CAST(MAX(budget_bytes) AS DOUBLE) AS budget_utilization
FROM flagged GROUP BY 1 ORDER BY modality
"""


# X15: per-source length distribution — the shared order-statistic
# convention (value at row floor((n-1)*p)), X3's token definition.
TEXT_ORACLES["text_length_percentiles"] = r"""
WITH base AS (
  SELECT source, doc_id,
         CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens
  FROM documents
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_tokens, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM base
),
agg AS (
  SELECT source,
         CAST(MAX(n) AS BIGINT) AS n_docs,
         MAX(CASE WHEN rn - 1 = CAST(FLOOR((n - 1) * 0.25) AS BIGINT)
                  THEN n_tokens END) AS p25_tokens,
         MAX(CASE WHEN rn - 1 = CAST(FLOOR((n - 1) * 0.5) AS BIGINT)
                  THEN n_tokens END) AS p50_tokens,
         MAX(CASE WHEN rn - 1 = CAST(FLOOR((n - 1) * 0.75) AS BIGINT)
                  THEN n_tokens END) AS p75_tokens,
         MAX(CASE WHEN rn - 1 = CAST(FLOOR((n - 1) * 0.99) AS BIGINT)
                  THEN n_tokens END) AS p99_tokens,
         MIN(n_tokens) AS min_tokens,
         MAX(n_tokens) AS max_tokens,
         CAST(SUM(CASE WHEN n_tokens < 30 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_under_lo,
         CAST(SUM(CASE WHEN n_tokens > 80 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_over_hi
  FROM ranked GROUP BY 1
)
SELECT *,
       CASE WHEN n_docs = 0 THEN NULL
            ELSE n_under_lo / n_docs END AS share_under_lo,
       CASE WHEN n_docs = 0 THEN NULL
            ELSE n_over_hi / n_docs END AS share_over_hi
FROM agg
"""


# X16: Heaps-law vocabulary growth — equal-rank doc slices per source,
# a type is NEW at its min bucket (bucket monotone in rank → exact);
# all-BIGINT panel, try_divide mirrored as a NULL-on-zero CASE.
TEXT_ORACLES["text_vocab_growth"] = r"""
WITH base AS (
  SELECT doc_id, source, regexp_split_to_array(text, '\s+') AS toks
  FROM documents
),
ranked AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM base
),
bucketed AS (
  SELECT source, doc_id, CAST((rn - 1) * 10 // n AS BIGINT) AS bucket
  FROM ranked
),
toks AS (
  SELECT b.source, b.doc_id, bk.bucket, unnest(b.toks) AS token
  FROM base b JOIN bucketed bk ON b.source = bk.source AND b.doc_id = bk.doc_id
),
occ AS (
  SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS n_tokens
  FROM toks GROUP BY 1, 2
),
first_seen AS (
  SELECT source, token, MIN(bucket) AS bucket FROM toks GROUP BY 1, 2
),
news AS (
  SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS new_types
  FROM first_seen GROUP BY 1, 2
),
docs AS (
  SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM bucketed GROUP BY 1, 2
),
panel AS (
  SELECT d.source, d.bucket, d.n_docs,
         COALESCE(o.n_tokens, 0) AS n_tokens,
         COALESCE(nw.new_types, 0) AS new_types
  FROM docs d
  LEFT JOIN occ o ON o.source = d.source AND o.bucket = d.bucket
  LEFT JOIN news nw ON nw.source = d.source AND nw.bucket = d.bucket
)
SELECT source, bucket, n_docs, n_tokens, new_types,
       CAST(SUM(new_types) OVER w AS BIGINT) AS cum_types,
       CAST(SUM(n_tokens) OVER w AS BIGINT) AS cum_tokens,
       CASE WHEN CAST(SUM(n_tokens) OVER w AS BIGINT) = 0 THEN NULL
            ELSE CAST(SUM(new_types) OVER w AS BIGINT)
                 / CAST(SUM(n_tokens) OVER w AS BIGINT) END AS type_token_ratio
FROM panel
WINDOW w AS (PARTITION BY source ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


# M10: cross-video shared-frame detection — content-addressed md5 frame
# fingerprints over M1's n_chars DIV 16 frame geometry, distinct per
# video, pairwise shared counts + both-direction containments.
TEXT_ORACLES["mm_frame_dedup"] = """
WITH vids AS (
  SELECT doc_id, text, n_chars FROM documents
  WHERE doc_id % 3 = 2 AND n_chars >= 16
),
idx AS (
  SELECT doc_id, text,
         unnest(generate_series(0, CAST(n_chars // 16 - 1 AS BIGINT))) AS i
  FROM vids
),
fps AS (
  SELECT DISTINCT doc_id, md5(substr(text, CAST(16 * i + 1 AS BIGINT), 16)) AS fp
  FROM idx
),
sizes AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM fps GROUP BY 1
),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared_frames
  FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= 1
)
SELECT doc_a, doc_b, n_shared_frames,
       sa.sz AS n_a, sb.sz AS n_b,
       n_shared_frames / CAST(sa.sz AS DOUBLE) AS containment_a,
       n_shared_frames / CAST(sb.sz AS DOUBLE) AS containment_b
FROM shared
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
"""


# X17: duplicate-fraction distribution — corpus shingle df >= 2 marks a
# shingle as duplicated; per-doc dup share binned by the cross-multiplied
# integer rule; per-(source, bin) panel with windowed token shares.
TEXT_ORACLES["text_dup_fraction"] = f"""
WITH {CORPUS_CTE},
base AS (
  SELECT doc_id, source, {SHINGLES_SQL} AS sh,
         CAST(len(toks) AS BIGINT) AS ws_tokens
  FROM (
    SELECT doc_id, source, regexp_split_to_array(text, '\\s+') AS toks
    FROM corpus
  ) WHERE len(toks) >= 3
),
ex AS (SELECT doc_id, unnest(sh) AS shingle FROM base),
df_tbl AS (
  SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df FROM ex GROUP BY 1
),
per_doc AS (
  SELECT e.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(SUM(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
  FROM ex e JOIN df_tbl d USING (shingle)
  GROUP BY 1
),
scored AS (
  SELECT b.source, b.ws_tokens, p.n_shingles, p.n_dup,
         LEAST(p.n_dup * 10 // p.n_shingles, 9) AS dup_bin
  FROM base b JOIN per_doc p USING (doc_id)
),
panel AS (
  SELECT source, CAST(dup_bin AS BIGINT) AS dup_bin,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(ws_tokens) AS BIGINT) AS total_tokens,
         CAST(SUM(n_dup) AS BIGINT) AS total_dup_shingles,
         CAST(SUM(n_shingles) AS BIGINT) AS total_shingles
  FROM scored GROUP BY 1, 2
)
SELECT *,
       CASE WHEN CAST(SUM(total_tokens) OVER (PARTITION BY source) AS BIGINT) = 0
            THEN NULL
            ELSE total_tokens /
                 CAST(SUM(total_tokens) OVER (PARTITION BY source) AS DOUBLE)
       END AS token_share_of_source
FROM panel
"""


# X18: unigram surprisal — bitlen(N) - bitlen(c) per token (exact integer
# log2 granularity; length(bin(BIGINT)) agrees between engines), doc sums,
# cross-multiplied above-average verdict.
TEXT_ORACLES["text_unigram_surprisal"] = r"""
WITH tok AS (
  SELECT doc_id, source, unnest(regexp_split_to_array(text, '\s+')) AS token
  FROM documents
),
freq AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY 1),
total AS (
  SELECT SUM(c) AS n_total,
         CAST(length(bin(CAST(SUM(c) AS BIGINT))) AS BIGINT) AS total_bits
  FROM freq
),
per_doc AS (
  SELECT doc_id, source,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(total_bits
                  - length(bin(CAST(f.c AS BIGINT)))) AS BIGINT)
           AS sum_surprisal_bits
  FROM tok t JOIN freq f USING (token) CROSS JOIN total
  GROUP BY 1, 2
),
scored AS (
  SELECT *, sum_surprisal_bits * 100 // n_tokens AS mean_surprisal_x100
  FROM per_doc
),
cm AS (
  SELECT SUM(sum_surprisal_bits) AS corpus_bits,
         SUM(n_tokens) AS corpus_tokens
  FROM scored
)
SELECT doc_id, source, n_tokens, sum_surprisal_bits, mean_surprisal_x100,
       CAST(CASE WHEN sum_surprisal_bits * corpus_tokens
                      > corpus_bits * n_tokens
                 THEN 1 ELSE 0 END AS INT) AS above_corpus_avg,
       CAST(corpus_bits AS DOUBLE) / corpus_tokens AS corpus_mean_bits
FROM scored CROSS JOIN cm
"""


# X23: Naive Bayes language ID — the X18 integer-log2 surprisal algebra
# applied to classification; add-one smoothing over the train vocab,
# class-prior bits, argmin with lang tie-break, margin to runner-up.
TEXT_ORACLES["text_nb_langid"] = r"""
WITH train_tok AS (
  SELECT lang, unnest(regexp_split_to_array(text, '\s+')) AS token
  FROM documents WHERE doc_id % 2 = 0
),
counts AS (
  SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS c
  FROM train_tok GROUP BY 1, 2
),
vocab AS (SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS v FROM train_tok),
train_docs AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs_l
  FROM documents WHERE doc_id % 2 = 0 GROUP BY 1
),
n_train AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_train
  FROM documents WHERE doc_id % 2 = 0
),
langs AS (
  SELECT d.lang AS cand_lang,
         CAST(length(bin(n_train)) - length(bin(n_docs_l)) AS BIGINT)
           AS prior_bits,
         CAST(length(bin(t.t_l + v)) AS BIGINT) AS denom_bits
  FROM train_docs d
  JOIN (SELECT lang, SUM(c) AS t_l FROM counts GROUP BY 1) t USING (lang)
  CROSS JOIN vocab CROSS JOIN n_train
),
test_tok AS (
  SELECT doc_id, lang AS actual_lang, token,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (
    SELECT doc_id, lang, unnest(regexp_split_to_array(text, '\s+')) AS token
    FROM documents WHERE doc_id % 2 = 1
  ) GROUP BY 1, 2, 3
),
scored AS (
  SELECT tt.doc_id, tt.actual_lang, l.cand_lang,
         CAST(MIN(l.prior_bits)
              + SUM(tt.cnt * (l.denom_bits
                              - length(bin(COALESCE(c.c, 0) + 1))))
           AS BIGINT) AS nb_bits
  FROM test_tok tt
  CROSS JOIN langs l
  LEFT JOIN counts c ON c.lang = l.cand_lang AND c.token = tt.token
  GROUP BY 1, 2, 3
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY nb_bits ASC, cand_lang ASC) AS rn,
         LEAD(nb_bits) OVER (PARTITION BY doc_id
                             ORDER BY nb_bits ASC, cand_lang ASC)
           AS runner_bits
  FROM scored
)
SELECT doc_id, cand_lang AS predicted_lang, actual_lang, nb_bits,
       CAST(runner_bits - nb_bits AS BIGINT) AS margin_bits,
       cand_lang = actual_lang AS correct
FROM ranked WHERE rn = 1
"""


# X19: distribution drift — full-outer unigram join per source, exact
# integer L1 (|c_old*N_new - c_new*N_old|), TV = L1 / (2*N_old*N_new).
TEXT_ORACLES["text_distribution_drift"] = f"""
WITH {CORPUS_CTE},
tok AS (
  SELECT source, doc_id,
         unnest(regexp_split_to_array(text, '\\s+')) AS token
  FROM corpus
),
old_c AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c_old
  FROM tok WHERE doc_id < 1000000 GROUP BY 1, 2
),
new_c AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c_new
  FROM tok WHERE doc_id >= 1000000 GROUP BY 1, 2
),
joined AS (
  SELECT COALESCE(o.source, n.source) AS source,
         COALESCE(o.token, n.token) AS token,
         COALESCE(c_old, 0) AS c_old,
         COALESCE(c_new, 0) AS c_new
  FROM old_c o FULL OUTER JOIN new_c n
    ON o.source = n.source AND o.token = n.token
),
totals AS (
  SELECT source, CAST(SUM(c_old) AS BIGINT) AS n_old,
         CAST(SUM(c_new) AS BIGINT) AS n_new
  FROM joined GROUP BY 1
)
SELECT j.source,
       CAST(MAX(n_old) AS BIGINT) AS n_old_tokens,
       CAST(MAX(n_new) AS BIGINT) AS n_new_tokens,
       CAST(SUM(CASE WHEN c_old > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_types_old,
       CAST(SUM(CASE WHEN c_new > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_types_new,
       CAST(SUM(CASE WHEN c_old = 0 AND c_new > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_gained_types,
       CAST(SUM(CASE WHEN c_new = 0 AND c_old > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_lost_types,
       CAST(SUM(ABS(c_old * n_new - c_new * n_old)) AS BIGINT) AS l1_scaled,
       CAST(SUM(ABS(c_old * n_new - c_new * n_old)) AS BIGINT)
         / (2.0 * MAX(n_old) * MAX(n_new)) AS tv_distance
FROM joined j JOIN totals t USING (source)
GROUP BY 1
"""

# X20: winnowing with polynomial (Rabin-Karp-style) gram hashes — the
# identical selection algebra as X6 over Σ ascii·B^j mod M gram hashes;
# mirrors operators/textops.py::winnow_fingerprint_rolling (B=257,
# M=2^31-1, k=8, w=4; exact BIGINT arithmetic in both engines).
_X20_POLY = " + ".join(
    f"CAST(ascii(substr(text, i + {j}, 1)) AS BIGINT)"
    f" * {pow(257, 8 - 1 - j, 2147483647)}"
    for j in range(8)
)
TEXT_ORACLES["text_winnow_rolling"] = f"""
WITH grams AS (
  SELECT doc_id,
         list_transform(range(1, len(text) - 8 + 2),
           i -> ({_X20_POLY}) % 2147483647) AS gh
  FROM documents
  WHERE len(text) >= 11
),
per_doc AS (
  SELECT doc_id,
         CAST(len(gh) AS BIGINT) AS n_grams,
         list_sort(list_distinct(list_transform(range(1, len(gh) - 4 + 2),
           j -> list_min(list_slice(gh, j, j + 3))))) AS fp
  FROM grams
),
sigs AS (
  SELECT doc_id, n_grams,
         CAST(len(fp) AS BIGINT) AS n_selected,
         md5(array_to_string(list_transform(fp, x -> CAST(x AS VARCHAR)), ',')) AS signature
  FROM per_doc
),
grouped AS (
  SELECT signature,
         COUNT(*) AS n_docs,
         MIN(doc_id) AS keep_doc_id,
         CAST(MIN(n_grams) AS BIGINT) AS n_grams,
         CAST(MIN(n_selected) AS BIGINT) AS n_selected,
         string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids
  FROM sigs
  GROUP BY 1
)
SELECT * FROM grouped
"""
