"""Bounded-state cardinality sketches: deterministic HyperLogLog.

"How many distinct tokens / URLs / fingerprints per language?" is a
routine corpus-health question, and the exact answer (``COUNT(DISTINCT
key)``) shuffles every distinct key — at 100 TB that is the most
expensive aggregate in the building.  HyperLogLog (Flajolet et al. 2007)
answers it with FIXED state: m = 2^p registers per group, each holding
one small integer, mergeable by ``max`` — which is exactly the shape
Spark's partial aggregation wants: every map task reduces its partition
to ≤ m rows per group before the shuffle, so the exchange moves
O(groups × m) rows no matter how many billions of keys streamed by.

Spark ships ``approx_count_distinct`` (also HLL), but its register hash
is engine-private — no other system can reproduce or MERGE its sketches.
This implementation derives registers from ``md5``, the repo-wide
portability discipline (`sampling.hash_bucket`): any md5-capable engine
— the DuckDB oracle here, or a downstream system consuming persisted
register tables — computes the SAME registers, the same estimate, and
can union sketches across engines.  The register→estimate arithmetic is
kept order-proof the same way `text.token_entropy` is: the harmonic sum
Σ 2^(-M_j) is scaled by 2^49 into an EXACT BIGINT sum (every term a
power of two ≤ 2^49, at most m ≤ 2^16 terms — no float rounding, no
partition-order sensitivity); floats appear only in the final one-row
estimate expression.

Accuracy is the standard ~1.04/√m relative error (±6.5% at the p=8
default); the small-range linear-counting correction applies below
2.5m.  The 48-bit tail makes the large-range correction irrelevant at
any realistic cardinality (collision regime starts near 2^48).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# md5-hex nibble values, shared with the DuckDB twins
HEX = "0123456789abcdef"

# Flajolet et al.'s bias-corrected alpha_m
_ALPHA_SMALL = {16: 0.673, 32: 0.697, 64: 0.709}

# the rho ceiling: 48 tail bits, all-zero tail => 49
_MAX_RHO = 49
_POW49 = 1 << 49


def _alpha(m: int) -> float:
    return _ALPHA_SMALL.get(m, 0.7213 / (1.0 + 1.079 / m))


def _check_p(p: int) -> None:
    # hex-char-aligned register prefixes keep the hash arithmetic ONE
    # conv() in Spark and plain nibble arithmetic in any SQL twin
    if p not in (4, 8, 12, 16):
        raise ValueError("p must be one of 4, 8, 12, 16 (hex-aligned)")


def hll_register_rho(key: Column, p: int = 8, salt: str = "hll") -> tuple[Column, Column]:
    """(register, rho) of one key: register = the first p bits of
    md5(salt|key); rho = 1 + leading-zero count of the next 48 bits
    (via binary-string length — ``conv(v, 10, 2)`` has no leading
    zeros, so bitlen(v) = floor(log2 v) + 1 exactly; all-zero tail
    saturates at 49)."""
    _check_p(p)
    c = p // 4
    h = F.md5(F.concat_ws("|", F.lit(salt), key.cast("string")))
    reg = F.conv(F.substring(h, 1, c), 16, 10).cast("int")
    tail = F.conv(F.substring(h, c + 1, 12), 16, 10).cast("long")
    rho = (
        F.when(tail == 0, F.lit(_MAX_RHO))
        .otherwise(F.lit(_MAX_RHO) - F.length(F.conv(tail, 10, 2)))
        .cast("int")
    )
    return reg, rho


def hll_registers(
    df: DataFrame,
    key: str,
    facets: tuple[str, ...] = (),
    p: int = 8,
    salt: str = "hll",
) -> DataFrame:
    """The persistable sketch: (facets..., register, max_rho) — at most
    2^p rows per facet group, mergeable with any other run's registers
    by ``max`` (the HLL union).  This is the artifact a fleet stores
    per shard/day and folds later; :func:`hll_cardinality` is the
    one-shot build-and-estimate over it."""
    reg, rho = hll_register_rho(F.col(key), p=p, salt=salt)
    return (
        df.select(*facets, reg.alias("register"), rho.alias("rho"))
        .groupBy(*facets, "register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate_cols(m: int) -> tuple[Column, Column]:
    """(int_sum → estimate) expressions over grouped register rows:
    expects columns ``__isum`` (exact scaled harmonic sum) and
    ``__present`` (registers observed).  Shared by the one-shot path
    and any fold over stored register tables."""
    zeros = F.lit(m) - F.col("__present")
    raw = (
        F.lit(_alpha(m) * m * m * float(_POW49)) / F.col("__isum").cast("double")
    )
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0), linear
    ).otherwise(raw)
    return zeros, est


def hll_cardinality(
    df: DataFrame,
    key: str,
    facets: tuple[str, ...] = (),
    p: int = 8,
    salt: str = "hll",
    exact_audit: bool = False,
) -> DataFrame:
    """Distinct-``key`` estimate per facet group in bounded state.

    Scale shape: ONE aggregation tree — (facets, register) max(rho)
    with map-side combine bounding every partition's contribution at
    m rows per group, then a facet-level fold whose harmonic sum is the
    exact integer Σ 2^(49-M_j) (absent registers contribute 2^49 each)
    — order-proof by construction, so the estimate is bit-stable under
    any partitioning.  ``exact_audit=True`` adds the true
    COUNT(DISTINCT key) and relative error per group — the audit is
    the expensive exact shuffle, for tests and sf-scale validation
    only; production runs leave it off.

    Output: (facets..., hll_m, hll_registers_used, hll_estimate
    [, exact_distinct, rel_error]).
    """
    _check_p(p)
    m = 1 << p
    regs = hll_registers(df, key, facets=facets, p=p, salt=salt)
    folded = regs.groupBy(*facets).agg(
        F.expr(f"sum(shiftleft(1L, {_MAX_RHO} - max_rho))").alias("__psum"),
        F.count(F.lit(1)).alias("__present"),
    )
    folded = folded.withColumn(
        "__isum",
        F.col("__psum") + (F.lit(m) - F.col("__present")) * F.lit(_POW49),
    )
    _, est = hll_estimate_cols(m)
    out = folded.select(
        *facets,
        F.lit(m).alias("hll_m"),
        F.col("__present").cast("long").alias("hll_registers_used"),
        est.alias("hll_estimate"),
    )
    if not exact_audit:
        return out
    exact = df.groupBy(*facets).agg(
        F.countDistinct(key).alias("exact_distinct")
    )
    join_on = list(facets)
    return out.join(exact, join_on).select(
        *facets,
        "hll_m",
        "hll_registers_used",
        "hll_estimate",
        "exact_distinct",
        (
            (F.col("hll_estimate") - F.col("exact_distinct"))
            / F.col("exact_distinct")
        ).alias("rel_error"),
    )


def _hexval_sql(h: str, start: int, nchars: int) -> str:
    """DuckDB nibble arithmetic: base-16 value of ``nchars`` hex chars
    of expression ``h`` starting at 1-based ``start`` (same value as
    Spark's conv(substring(...)); test-scale only)."""
    return (
        "("
        + " + ".join(
            f"(strpos('{HEX}', substr({h}, {start + i}, 1)) - 1)"
            f" * {16 ** (nchars - 1 - i)}"
            for i in range(nchars)
        )
        + ")"
    )


def hll_cardinality_sql(
    source_sql: str,
    key_sql: str,
    facet_sql: str,
    facet_name: str = "facet",
    p: int = 8,
    salt: str = "hll",
) -> str:
    """The DuckDB twin of :func:`hll_cardinality` (exact_audit form,
    single facet) — identical md5 registers, identical integer harmonic
    sum, the same estimate expression text."""
    _check_p(p)
    m = 1 << p
    c = p // 4
    h = f"md5('{salt}' || '|' || CAST({key_sql} AS VARCHAR))"
    reg = _hexval_sql("h", 1, c)
    tail = _hexval_sql("h", c + 1, 12)
    alpha_num = _alpha(m) * m * m * float(_POW49)
    return f"""
WITH src AS (
  {source_sql}
), hashed AS (
  SELECT facet, {h} AS h, {key_sql} AS k
  FROM (SELECT {facet_sql} AS facet, * FROM src)
), rr AS (
  SELECT facet, k, {reg} AS register,
         CASE WHEN {tail} = 0 THEN {_MAX_RHO}
              ELSE {_MAX_RHO} - length(bin(CAST({tail} AS BIGINT)))
         END AS rho
  FROM hashed
), regs AS (
  SELECT facet, register, MAX(rho) AS max_rho
  FROM rr GROUP BY 1, 2
), folded AS (
  SELECT facet,
         SUM(1::BIGINT << ({_MAX_RHO} - max_rho))
           + ({m} - COUNT(*)) * (1::BIGINT << {_MAX_RHO}) AS isum,
         COUNT(*) AS present
  FROM regs GROUP BY 1
), ex AS (
  SELECT facet, CAST(COUNT(DISTINCT k) AS BIGINT) AS exact_distinct
  FROM rr GROUP BY 1
)
SELECT f.facet AS {facet_name},
       {m} AS hll_m,
       CAST(f.present AS BIGINT) AS hll_registers_used,
       CASE WHEN {alpha_num!r} / CAST(f.isum AS DOUBLE) <= {2.5 * m}
                 AND ({m} - f.present) > 0
            THEN CAST({m} AS DOUBLE)
                 * ln(CAST({m} AS DOUBLE) / CAST({m} - f.present AS DOUBLE))
            ELSE {alpha_num!r} / CAST(f.isum AS DOUBLE)
       END AS hll_estimate,
       ex.exact_distinct,
       (CASE WHEN {alpha_num!r} / CAST(f.isum AS DOUBLE) <= {2.5 * m}
                  AND ({m} - f.present) > 0
             THEN CAST({m} AS DOUBLE)
                  * ln(CAST({m} AS DOUBLE) / CAST({m} - f.present AS DOUBLE))
             ELSE {alpha_num!r} / CAST(f.isum AS DOUBLE)
        END - ex.exact_distinct) / ex.exact_distinct AS rel_error
FROM folded f JOIN ex USING (facet)
"""
