"""Pure-SQL surface: the curation operators as SQL table functions.

:mod:`.catalog` exposes tables and FIXED plans as views; this module adds
the missing piece — PARAMETERIZED operators callable from pure SQL, so the
engine is drivable without Python (Spark 4 SQL UDFs, ``CREATE TEMPORARY
FUNCTION … RETURNS TABLE``).  Each TVF body is the operator's generated-
expression formula spelled in Spark SQL text over the registered
``documents`` view; consistency with the DataFrame operator (whose DuckDB
oracle is hash-verified by the driver) is pinned test-by-test in
``tests/test_sqlfn.py`` — the TVF and the operator must return identical
rows on the same corpus, which makes the driver's oracle transitively the
TVF's oracle.

A SQL UDF body is resolved at CALL time, so the functions can be
registered before (or after) :func:`..catalog.register_tables` — they just
need the ``documents`` view to exist when queried.  Registration is
session-scoped metadata: nothing runs until a query calls the function.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# token-window chunking bodies reuse ONE last-chunk-index definition so
# n_chunks and the sequence bound cannot desynchronize (the same
# discipline as extensions.text.chunk_windows)
_CHUNK_LAST_IDX = (
    "if(size(__toks) <= chunk_tokens, 0,"
    " cast(ceil((size(__toks) - chunk_tokens) / stride) as int))"
)

SQL_TVFS: dict[str, str] = {
    # extensions.text.token_counts
    "tvf_text_token_counts": """
CREATE OR REPLACE TEMPORARY FUNCTION tvf_text_token_counts()
RETURNS TABLE (doc_id BIGINT, ws_tokens INT, re_tokens INT, n_chars INT)
RETURN SELECT doc_id,
       size(split(text, '\\\\s+')) AS ws_tokens,
       size(regexp_extract_all(
           text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9 ])', 0)) AS re_tokens,
       length(text) AS n_chars
FROM documents
""",
    # extensions.dedup.exact_clusters
    "tvf_dedup_exact_clusters": """
CREATE OR REPLACE TEMPORARY FUNCTION tvf_dedup_exact_clusters()
RETURNS TABLE (fingerprint STRING, n_docs BIGINT, keep_doc_id BIGINT)
RETURN SELECT md5(text) AS fingerprint,
       count(1) AS n_docs,
       min(doc_id) AS keep_doc_id
FROM documents
GROUP BY md5(text)
""",
    # extensions.sampling.deterministic_split (key = doc_id, salt 'split')
    "tvf_sample_split": """
CREATE OR REPLACE TEMPORARY FUNCTION tvf_sample_split(train_frac DOUBLE)
RETURNS TABLE (doc_id BIGINT, split STRING)
RETURN SELECT doc_id,
       CASE WHEN cast(conv(substring(
                md5(concat_ws('|', 'split', cast(doc_id AS STRING))),
                1, 4), 16, 10) AS INT)
              < cast(floor(train_frac * 65536) AS INT)
            THEN 'train' ELSE 'val' END AS split
FROM documents
""",
    # extensions.text.chunk_windows(chunk_tokens, stride)
    "tvf_text_chunk_windows": f"""
CREATE OR REPLACE TEMPORARY FUNCTION tvf_text_chunk_windows(
    chunk_tokens INT, stride INT)
RETURNS TABLE (doc_id BIGINT, n_tokens BIGINT, n_chunks BIGINT,
               chunk_id BIGINT, chunk STRING)
RETURN SELECT doc_id,
       cast(size(__toks) AS BIGINT) AS n_tokens,
       cast(({_CHUNK_LAST_IDX}) + 1 AS BIGINT) AS n_chunks,
       cast(c.chunk_id AS BIGINT) AS chunk_id,
       c.chunk AS chunk
FROM (SELECT doc_id,
             split(coalesce(text, ''), '\\\\s+') AS __toks
      FROM documents) t
LATERAL VIEW explode(transform(sequence(0, {_CHUNK_LAST_IDX}),
    i -> struct(i AS chunk_id,
                concat_ws(' ', slice(__toks, i * stride + 1,
                                     chunk_tokens)) AS chunk))) ex AS c
""",
    # extensions.sketches.histogram_quantiles over documents.n_chars,
    # facet = lang, quantiles fixed at the health-check five (a SQL UDF
    # cannot take an array parameter portably; the grid dials can)
    "tvf_sketch_hist_quantiles": """
CREATE OR REPLACE TEMPORARY FUNCTION tvf_sketch_hist_quantiles(
    lo INT, hi INT, bins INT)
RETURNS TABLE (lang STRING, q_pct INT, bin BIGINT, bin_lo DOUBLE,
               bin_hi DOUBLE, cum_count BIGINT, n_rows BIGINT)
RETURN SELECT lang, q_pct,
       p.bin AS bin,
       cast(lo AS DOUBLE)
         + p.bin * ((hi - lo) / cast(bins AS DOUBLE)) AS bin_lo,
       cast(lo AS DOUBLE)
         + (p.bin + 1) * ((hi - lo) / cast(bins AS DOUBLE)) AS bin_hi,
       p.cum_count AS cum_count,
       p.n_rows AS n_rows
FROM (
  SELECT lang, q_pct, min(struct(bin, cum_count, n_rows)) AS p
  FROM (
    SELECT lang, bin, cum_count, n_rows, q_pct
    FROM (
      SELECT lang, bin,
             sum(cnt) OVER (PARTITION BY lang ORDER BY bin)
               AS cum_count,
             sum(cnt) OVER (PARTITION BY lang) AS n_rows
      FROM (
        SELECT lang, bin, count(1) AS cnt
        FROM (
          SELECT lang,
                 (least(greatest(cast(n_chars AS BIGINT), lo), hi - 1)
                   - lo) * bins div (hi - lo) AS bin
          FROM documents
          WHERE n_chars IS NOT NULL
        )
        GROUP BY lang, bin
      )
    ) c
    LATERAL VIEW explode(array(25, 50, 75, 95, 99)) q AS q_pct
    WHERE cum_count >= (q_pct * n_rows + 99) div 100
  )
  GROUP BY lang, q_pct
)
""",
    # gopher word-count gate, parameterized (n_words_expr formula)
    "tvf_text_word_count_gate": """
CREATE OR REPLACE TEMPORARY FUNCTION tvf_text_word_count_gate(
    min_words INT, max_words INT)
RETURNS TABLE (doc_id BIGINT, n_words BIGINT)
RETURN SELECT doc_id,
       cast(size(split(lower(text), ' ')) AS BIGINT) AS n_words
FROM documents
WHERE size(split(lower(text), ' ')) BETWEEN min_words AND max_words
""",
}


def register_sql_tvfs(spark: SparkSession) -> list[str]:
    """Create every TVF in :data:`SQL_TVFS`; returns the function names.

    Call after (or before — bodies resolve at call time) the
    ``documents`` view exists, e.g. via :func:`.catalog.register_tables`.
    """
    for ddl in SQL_TVFS.values():
        spark.sql(ddl)
    return list(SQL_TVFS)
