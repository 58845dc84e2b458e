"""Driver-contract smoke tests: entry() runs, queries()/oracle_sql() agree."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    # round-9 flagship: the trained IVFADC search (query_id × top-3)
    assert set(df.columns) >= {"query_id", "neighbor_id", "rank", "cosine_adc"}
    assert all(1 <= r["rank"] <= 3 for r in rows)


def test_queries_and_oracles_consistent():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert q, "queries() must not be empty"
    # every oracle refers to an implemented query
    assert set(o) <= set(q)


def test_all_queries_run_at_smoke_sf(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(5).collect()


def test_sql_catalog_views(spark):
    """Tables and named plans are drivable through spark.sql, and a
    predicate applied OUTSIDE a query view is pushed into its plan."""
    from nr_rfc_dischargeobs_spark.plans import catalog

    sf = "/root/testdata/sf0.001"
    tables = catalog.register_tables(spark, sf)
    assert "lineitem" in tables and "documents" in tables
    assert spark.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0].n > 0

    catalog.register_queries(spark, sf, ["a1_hourly_rollup_last_override"])
    filtered = spark.sql(
        "SELECT * FROM a1_hourly_rollup_last_override WHERE user_id = 1"
    )
    assert filtered.count() >= 0  # executes through the view
    plan = filtered._jdf.queryExecution().optimizedPlan().toString()
    assert "user_id" in plan  # predicate reached the view's plan


def test_registry_consistency():
    """Every oracle key maps to a registered query, and every registered
    query has a value-hash oracle — including the decode kernel (round-4:
    the byte-feature kernel replaced the rows-only sha256 stub)."""
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(o) - set(q) == set()
    assert set(q) - set(o) == set()
    assert all(callable(fn) for fn in q.values())
    assert all(isinstance(sql, str) and "SELECT" in sql.upper() for sql in o.values())


def test_results_identical_across_shuffle_partitionings(spark):
    """The exact-arithmetic discipline's core promise: identical results
    (bit-for-bit, not approximately) under different partition counts —
    what makes a 100 TB run reproducible under AQE re-plans and retries."""
    import __spark_entry__ as e

    queries = e.queries()
    sf = "/root/testdata/sf0.001"
    for name in (
        "tpch_q1_pricing_summary",
        "a1_hourly_rollup_last_override",
        "ts_zscore_anomaly",
        "ext_dedup_minhash_signatures",
        # round-3 operators whose shapes could tempt partition-dependence:
        # a windowed cumsum, a broadcast-join aggregate, an exact CUSUM,
        # and a two-level tf/df ranking
        "ext_pack_sequences",
        "ext_contamination_ngram",
        "ts_cusum_drift",
        "ext_text_top_terms",
        # round-4 operators: a cluster-keyed self-join over a materialized
        # assignment, a two-stage rank that must equal the naive one, a
        # per-shard dense index, an integer-grid float entropy, and the
        # PQ encode + compressed-corpus search pair
        "ext_sim_semantic_dedup",
        "ext_sample_source_caps",
        "ext_sample_shard_plan",
        "ext_text_entropy",
        "ext_sim_pq_adc_topk",
        # round-9 operators: the TRAINED pipeline — codebook training
        # (driver-side collect of re-quantized means) and the residual
        # IVFADC search must be partition-invariant end to end
        "ext_sim_pq_train_codebook",
        "ext_sim_ivfadc_topk",
        "ext_dedup_minhash_wide",
    ):
        results = []
        for parts in ("3", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            try:
                rows = sorted(map(tuple, queries[name](spark, sf).collect()))
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", "8")
            results.append(rows)
        assert results[0] == results[1], name


def test_results_identical_with_aqe_disabled(spark):
    """The complementary re-plan axis to the shuffle-partition sweep:
    adaptive execution (coalesced partitions, runtime join re-selection,
    skew splits) must never change VALUES — only plans.  Representative
    shapes: a broadcast-or-shuffle join aggregate, a cluster self-join
    over a materialized assignment, a two-stage rank, and the PQ
    encode + compressed search pair."""
    import __spark_entry__ as e

    queries = e.queries()
    sf = "/root/testdata/sf0.001"
    for name in (
        "ext_text_top_terms",
        "ext_sim_semantic_dedup",
        "ext_sample_source_caps",
        "ext_sim_pq_adc_topk",
    ):
        results = []
        for aqe in ("true", "false"):
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            try:
                rows = sorted(map(tuple, queries[name](spark, sf).collect()))
            finally:
                spark.conf.set("spark.sql.adaptive.enabled", "true")
            results.append(rows)
        assert results[0] == results[1], name
