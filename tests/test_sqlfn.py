"""Pure-SQL TVF surface: every registered SQL table function must return
exactly the rows of the DataFrame operator it mirrors, on the same
corpus.  The driver hash-verifies the operators against their DuckDB
oracles, so row-identity here makes that oracle transitively the TVF's.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from nr_rfc_dischargeobs_spark.extensions import dedup, sampling
from nr_rfc_dischargeobs_spark.extensions import text as textops
from nr_rfc_dischargeobs_spark.plans.sqlfn import register_sql_tvfs


@pytest.fixture()
def docs_view(spark):
    # lang/n_chars present because SQL UDF bodies are analyzed at CREATE
    # time against the current `documents` view — the registered surface
    # assumes the real documents schema (TESTDATA.md)
    texts = [
        (0, "the quick brown fox jumps over the lazy dog again"),
        (1, "a second document with  double spaces and More WORDS"),
        (2, "the quick brown fox jumps over the lazy dog again"),
        (3, None),
        (4, "short"),
        (5, "numbers 123 and punct!?; mix-ed to2kens"),
    ]
    docs = spark.createDataFrame(
        [
            (i, t, "en" if i % 3 else "de", len(t or ""))
            for i, t in texts
        ],
        ["doc_id", "text", "lang", "n_chars"],
    )
    docs.createOrReplaceTempView("documents")
    register_sql_tvfs(spark)
    return docs


def rows(df):
    return sorted(map(tuple, df.collect()), key=lambda r: tuple(map(str, r)))


def test_tvf_token_counts_matches_operator(spark, docs_view):
    got = spark.sql("SELECT * FROM tvf_text_token_counts()")
    want = textops.token_counts(docs_view)
    assert rows(got) == rows(want)


def test_tvf_exact_clusters_matches_operator(spark, docs_view):
    got = spark.sql("SELECT * FROM tvf_dedup_exact_clusters()")
    want = dedup.exact_clusters(docs_view)
    assert rows(got) == rows(want)
    # the duplicate pair actually clustered, keeper = min doc_id
    fp = [r for r in rows(got) if r[1] == 2]
    assert len(fp) == 1 and fp[0][2] == 0


def test_tvf_sample_split_matches_operator(spark, docs_view):
    got = spark.sql("SELECT * FROM tvf_sample_split(0.5)")
    want = sampling.deterministic_split(
        docs_view.select("doc_id"), "doc_id", train_frac=0.5
    )
    assert rows(got) == rows(want)
    # parameter actually moves the boundary: frac=1.0 → all train
    all_train = spark.sql("SELECT * FROM tvf_sample_split(1.0)")
    assert {r[1] for r in all_train.collect()} == {"train"}


def test_tvf_chunk_windows_matches_operator(spark, docs_view):
    got = spark.sql("SELECT * FROM tvf_text_chunk_windows(4, 2)")
    want = textops.chunk_windows(docs_view, chunk_tokens=4, stride=2)
    assert rows(got) == rows(want)
    # a NULL-text doc still yields exactly one (empty) chunk
    assert [r for r in rows(got) if r[0] == 3]


def test_tvf_word_count_gate_matches_gopher_formula(spark, docs_view):
    got = spark.sql("SELECT * FROM tvf_text_word_count_gate(2, 100)")
    want = (
        docs_view.select(
            "doc_id", textops.n_words_expr(F.col("text")).alias("n_words")
        )
        .filter(F.col("n_words").between(2, 100))
    )
    assert rows(got) == rows(want)
    # the formula is the stream's (empty tokens included): doc 1 has a
    # double space → one empty token counted
    n1 = dict(rows(got))[1]
    assert n1 == 10


def test_tvf_hist_quantiles_matches_operator(spark, docs_view):
    from nr_rfc_dischargeobs_spark.extensions import sketches

    got = spark.sql("SELECT * FROM tvf_sketch_hist_quantiles(0, 64, 16)")
    want = sketches.histogram_quantiles(
        docs_view, col="n_chars", lo=0, hi=64, bins=16,
        quantiles=(25, 50, 75, 95, 99), facets=("lang",),
    ).select(
        "lang", "q_pct", "bin", "bin_lo", "bin_hi", "cum_count", "n_rows"
    )
    assert rows(got) == rows(want)
