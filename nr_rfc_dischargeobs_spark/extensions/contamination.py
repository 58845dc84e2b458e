"""Benchmark contamination detection: which training documents contain
n-grams of a held-out evaluation set (the decontamination step every
serious pre-training pipeline runs before the corpus ships).

Standard n-gram-collision formulation: shingle BOTH sides into word
n-grams (``n`` around 8 — long enough that a collision is evidence of
copying, not of English), hash each shingle, and equi-join corpus shingles
to benchmark shingles.  A corpus doc's contamination score is how many of
its distinct n-grams appear anywhere in the benchmark.

Scale shape (100 TB corpus × small benchmark):
- the join key is ``md5(shingle)`` — 32 bytes travel, never document text;
- the benchmark side is tiny by construction (eval suites are MBs), so the
  join broadcasts: the corpus NEVER shuffles, contamination is one
  map-side pass over the corpus shingles;
- output is per-doc aggregate counts (map-side combine on doc_id), so the
  one real shuffle moves |contaminated docs| rows, not |shingles|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_rows


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text: str = "text",
    doc_id: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_grams, n_contaminated, n_bench_docs, contamination)
    per corpus doc that collides with the benchmark at all.

    ``contamination`` = contaminated distinct n-grams / doc's distinct
    n-grams, exact integer counts divided once.
    """
    corpus_sh = shingle_rows(corpus, text=text, doc_id=doc_id, n=n).select(
        F.col(doc_id), F.md5(F.col("shingle")).alias("gram")
    )
    bench_sh = (
        shingle_rows(benchmark, text=text, doc_id=doc_id, n=n)
        .select(
            F.md5(F.col("shingle")).alias("gram"),
            F.col(doc_id).alias("bench_doc_id"),
        )
        .distinct()
    )
    # ONE corpus pass: broadcast LEFT join tags each corpus shingle with
    # its benchmark hits (no match → one row with bench_doc_id NULL), and a
    # single aggregation derives totals and hit counts together — the
    # two-aggregation + rejoin formulation scans the corpus shingles twice
    # and shuffles |corpus docs| extra rows for the totals side.
    tagged = corpus_sh.join(F.broadcast(bench_sh), "gram", "left")
    return (
        tagged.groupBy(doc_id)
        .agg(
            F.countDistinct("gram").alias("n_grams"),
            F.countDistinct(
                F.when(F.col("bench_doc_id").isNotNull(), F.col("gram"))
            ).alias("n_contaminated"),
            F.countDistinct("bench_doc_id").alias("n_bench_docs"),
        )
        .filter(F.col("n_contaminated") > 0)
        .select(
            F.col(doc_id),
            "n_grams",
            "n_contaminated",
            "n_bench_docs",
            (
                F.col("n_contaminated").cast("double") / F.col("n_grams")
            ).alias("contamination"),
        )
    )
