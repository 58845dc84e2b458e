"""Clean-box A/B for the curate quality gate (VERDICT r13 task 1).

Three spellings of the SAME gate, measured interleaved in one session
(noop sink, guide §1.4), alternating A/B/C per round so box drift hits
all variants equally:

  A fused   — r13 spelling: gate expressions computed on the docs scan;
              the pushed filter may re-evaluate the regex split per
              predicate (the no-CSE concern).
  B join    — r12 spelling: quality_scores(docs) ⋈ docs (2 scans + BHJ,
              split evaluated once per scan row).
  C barrier — fused scan, but the token array is computed once behind a
              nondeterministic marker so neither CollapseProject nor
              filter pushdown can duplicate the split.

Usage: python tools/ab_curate.py [sf_dir] [rounds]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from nr_rfc_dischargeobs_spark.extensions import curate, dedup as dd  # noqa: E402
from nr_rfc_dischargeobs_spark.extensions import text as tx  # noqa: E402
from nr_rfc_dischargeobs_spark.plans import load  # noqa: E402
from nr_rfc_dischargeobs_spark.session import get_spark  # noqa: E402


def _tail(docs: DataFrame, gated: DataFrame) -> DataFrame:
    """The shared pipeline downstream of the gate (exact dedup → LSH →
    verify → anti-join), copied from curate_corpus so only the gate
    differs between variants."""
    fp = tx.fingerprint(gated)
    exact_kept = (
        fp.groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    survivors = gated.join(exact_kept, "doc_id")
    dropped = curate.near_dup_drop_ids(survivors)
    kept = survivors.join(dropped, "doc_id", "left_anti")
    return kept.select("doc_id", "n_words", "uniq_ratio")


def variant_fused(docs: DataFrame) -> DataFrame:
    return curate.curate_corpus(docs)


def variant_join(docs: DataFrame) -> DataFrame:
    quality = tx.quality_scores(docs)
    gated_ids = quality.filter(
        (F.col("n_words") >= 10)
        & (F.col("n_words") <= 5000)
        & (F.col("uniq_ratio") >= 0.2)
    ).select("doc_id", "n_words", "uniq_ratio")
    gated = docs.join(gated_ids, "doc_id")
    return _tail(docs, gated)


def variant_barrier(docs: DataFrame) -> DataFrame:
    # shuffle() is nondeterministic; size()/array_distinct-size are
    # permutation-invariant, so values are identical while the optimizer
    # can neither collapse the projection nor push the filter through it
    toks = F.shuffle(tx._tokens(F.col("text")))
    staged = docs.select("*", toks.alias("__toks"))
    gated = (
        staged.select(
            "*",
            F.size("__toks").cast("long").alias("n_words"),
            (
                F.size(F.array_distinct("__toks")).cast("double")
                / F.size("__toks")
            ).alias("uniq_ratio"),
        )
        .filter(
            (F.col("n_words") >= 10)
            & (F.col("n_words") <= 5000)
            & (F.col("uniq_ratio") >= 0.2)
        )
        .drop("__toks")
    )
    return _tail(docs, gated)


VARIANTS = {
    "A_fused": variant_fused,
    "B_join": variant_join,
    "C_barrier": variant_barrier,
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(
        "ab-curate", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, sf_dir, "documents")

    # result-set parity gate before timing anything
    rows = {
        k: sorted(map(tuple, fn(docs).collect())) for k, fn in VARIANTS.items()
    }
    base = rows["A_fused"]
    for k, r in rows.items():
        assert r == base, f"{k} diverges: {len(r)} vs {len(base)} rows"
    print(f"parity: all variants emit {len(base)} identical rows")

    # warm-up (codegen/JIT per plan shape)
    for fn in VARIANTS.values():
        fn(docs).write.format("noop").mode("overwrite").save()

    times: dict[str, list[float]] = {k: [] for k in VARIANTS}
    for _ in range(rounds):
        for k, fn in VARIANTS.items():
            df = fn(docs)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            times[k].append(round(time.time() - t0, 3))
    for k, ts in times.items():
        print(
            f"{k:10s} min={min(ts):6.3f} med={sorted(ts)[len(ts) // 2]:6.3f}"
            f"  all={ts}"
        )


if __name__ == "__main__":
    main()
