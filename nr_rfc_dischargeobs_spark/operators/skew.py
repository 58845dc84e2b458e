"""Skew-handling join utilities.

AQE's skew-join splitting (on by default, ``session.py``) handles most hot
keys at runtime by splitting oversized shuffle partitions.  Two cases still
need the manual form below:

- joins AQE can't split (the skewed side feeds another operator that pins
  its partitioning, or the join is inside a cached/streaming subtree);
- known-pathological keys (a viral boilerplate document in the LSH band
  join; a station that reports every second) where pre-spreading beats
  runtime detection.

``salted_join`` spreads each hot key over ``salts`` sub-keys: the big side
derives its salt deterministically from a spread column (no ``rand()`` —
plans stay reproducible and re-executable), the small side replicates each
row ``salts`` times.  Cost: small side × salts; benefit: the hot key's rows
land on ``salts`` tasks instead of one.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..extensions.diagnostics import skew_profile


def choose_salts(
    big: DataFrame,
    on: list[str],
    max_salts: int = 64,
    threshold: float = 4.0,
    min_rows_per_key: int = 1_000_000,
) -> int:
    """Measure the join key's skew and pick the salt count from it.

    One bounded profiling job (``diagnostics.skew_profile`` top-1 — a
    combine-friendly exact count keyed by the join key, ONE row
    collected; the same metadata-scale plan-build carve-out as the PQ
    codebook collects).  Two independent triggers:

    - **Skew**: ``skew_ratio`` (hot-key count over mean-key count) is
      the multiple by which the hot key's shuffle bucket outweighs an
      average one — spreading it over ``ceil(skew_ratio)`` sub-keys
      levels the buckets back to ~mean.  Ratios at or under
      ``threshold`` don't salt: mild skew is AQE's job, and salting
      costs small-side replication.
    - **Concurrency** (review fix): a LOW-CARDINALITY key can be
      perfectly uniform (ratio ≈ 1) and still put the whole table on
      ``n_keys`` tasks — 10M rows over 4 equally-heavy keys is 4 giant
      buckets, not skew.  When the key count is below the session's
      shuffle parallelism AND the average key carries at least
      ``min_rows_per_key`` rows (a bucket worth splitting), salts are
      sized to restore parallelism: ``ceil(partitions / n_keys)``.

    The larger trigger wins, capped at ``max_salts`` — past the
    cluster's parallelism more salts only multiply the small side
    without adding concurrency.
    """
    keyed = big.select(F.struct(*[F.col(c) for c in on]).alias("__key"))
    prof = skew_profile(keyed, "__key", top=1).collect()
    if not prof:
        return 1
    row = prof[0]
    ratio = row["skew_ratio"]
    s_skew = (
        math.ceil(ratio)
        if ratio is not None and ratio > threshold
        else 1
    )
    s_conc = 1
    if row["n_keys"] and row["mean_cnt"] >= min_rows_per_key:
        parallelism = int(
            big.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
        if row["n_keys"] < parallelism:
            s_conc = math.ceil(parallelism / row["n_keys"])
    s = max(s_skew, s_conc)
    return 1 if s <= 1 else max(2, min(max_salts, s))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    spread_col: str,
    salts: int | str = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``salts`` sub-keys.

    ``spread_col``: a big-side column whose values vary *within* a join key
    (a row id, timestamp, line number) — its hash assigns each row a stable
    salt.  The small side explodes to every salt, so every (key, salt) pair
    finds its match.  Result equals ``big.join(small, on, how)`` row-for-row
    — for join types where ONLY big-side rows can surface unmatched.
    Right/full outer joins are rejected: an unmatched small-side key would
    surface once per salt replica (``salts`` copies instead of one),
    silently inflating downstream counts.

    ``salts="auto"`` measures instead of guessing: :func:`choose_salts`
    profiles the big side's key once and sizes S to the hot key's
    multiple of the mean key count (1 → the plain un-salted join; mild
    skew is AQE's job).  The profile is one plan-build job — pass a
    literal where the key's shape is already known.
    """
    if how.replace("_", "").lower() in ("rightouter", "right", "fullouter", "full", "outer"):
        raise ValueError(
            "salted_join cannot preserve right/full-outer semantics: an"
            " unmatched small-side row would appear once per salt replica;"
            " swap the sides or use the plain join for these"
        )
    if salts == "auto":
        salts = choose_salts(big, on)
    elif not isinstance(salts, int) or salts < 1:
        raise ValueError(
            f"salts must be a positive int or 'auto', got {salts!r}"
        )
    if salts == 1:
        # measured-uniform key: the salt machinery would only add a
        # constant column and replicate nothing — the plain join IS the
        # salted join at S=1
        return big.join(small, on, how)
    b = big.withColumn(
        "__salt", F.pmod(F.hash(F.col(spread_col)), F.lit(salts))
    )
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    return b.join(s, [*on, "__salt"], how).drop("__salt")
