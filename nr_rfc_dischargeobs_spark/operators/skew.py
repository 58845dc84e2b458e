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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    spread_col: str,
    salts: int = 16,
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
    """
    if how.replace("_", "").lower() in ("rightouter", "right", "fullouter", "full", "outer"):
        raise ValueError(
            "salted_join cannot preserve right/full-outer semantics: an"
            " unmatched small-side row would appear once per salt replica;"
            " swap the sides or use the plain join for these"
        )
    b = big.withColumn(
        "__salt", F.pmod(F.hash(F.col(spread_col)), F.lit(salts))
    )
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    return b.join(s, [*on, "__salt"], how).drop("__salt")
