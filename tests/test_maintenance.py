"""Store maintenance (small-file compaction) and cross-engine hash
portability — the operational guarantees behind the 100 TB posture."""

from __future__ import annotations

import datetime as dt
from pathlib import Path

import duckdb
from pyspark.sql import functions as F

from nr_rfc_dischargeobs_spark.sources import ObservationStore
from nr_rfc_dischargeobs_spark.sources.store import with_year_month


def _obs(spark, rows):
    return spark.createDataFrame(
        rows,
        ["station_id", "obs_time", "datatype", "value", "qc_level", "source"],
    )


def _files_per_partition(root: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for d in Path(root).glob("year_month=*/datatype=*"):
        out[str(d.relative_to(root))] = len(list(d.glob("*.parquet")))
    return out


def test_compact_coalesces_files_and_preserves_rows(spark, tmp_path):
    store = ObservationStore(spark, str(tmp_path / "obs"))
    mk = lambda m, v: [  # noqa: E731
        ("S1", dt.datetime(2024, m, d, 12), "Q", v + d, "raw", "wsc")
        for d in (1, 2)
    ]
    store.write(_obs(spark, mk(6, 0.0)))
    # three append cycles — one extra file per cycle per partition
    for i in range(1, 4):
        (
            with_year_month(_obs(spark, mk(6, i * 10.0)))
            .write.partitionBy("year_month", "datatype")
            .mode("append")
            .parquet(store.root)
        )
    before = _files_per_partition(store.root)
    assert before["year_month=202406/datatype=Q"] >= 4
    rows_before = sorted(
        (r["station_id"], r["obs_time"], r["value"])
        for r in store.read().collect()
    )

    store.compact(months=["202406"])

    after = _files_per_partition(store.root)
    assert after["year_month=202406/datatype=Q"] == 1
    rows_after = sorted(
        (r["station_id"], r["obs_time"], r["value"])
        for r in store.read().collect()
    )
    assert rows_after == rows_before


def test_compact_touches_only_selected_months(spark, tmp_path):
    store = ObservationStore(spark, str(tmp_path / "obs2"))
    rows = [
        ("S1", dt.datetime(2024, m, 1, 12), "Q", 1.0, "raw", "wsc")
        for m in (6, 7)
    ]
    store.write(_obs(spark, rows))
    july = Path(store.root) / "year_month=202407" / "datatype=Q"
    mtimes_before = {p.name for p in july.glob("*.parquet")}
    store.compact(months=["202406"])
    assert {p.name for p in july.glob("*.parquet")} == mtimes_before
    assert store.read().count() == 2


def test_hash_bucket_matches_duckdb_per_key(spark):
    """The sampler's md5 bucket must be byte-identical per key across
    engines — splits/strata computed by Spark and audited by any other
    md5-capable engine must agree row by row."""
    from nr_rfc_dischargeobs_spark.extensions import sampling

    keys = [
        "0", "1", "42", "doc-123", "", "Ünïcode-π", "a" * 300,
        "08MF005|2024-06-01", "-17", "3.14",
    ]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = {
        r["k"]: r["b"]
        for r in df.select(
            "k", sampling.hash_bucket(F.col("k"), salt="s").alias("b")
        ).collect()
    }
    con = duckdb.connect()
    for k in keys:
        lit = "'" + k.replace("'", "''") + "'"
        [(want,)] = con.execute(
            "SELECT " + sampling.hash_bucket_sql(lit, salt="s")
        ).fetchall()
        assert got[k] == want, k
        assert 0 <= want < sampling.BUCKETS


def test_upsert_merge_plan_has_single_exchange(spark, tmp_path):
    """The fused merge+write distribution: exactly one Exchange, with the
    winner-pick window riding the same (month, datatype, salt)
    partitioning — a regression here doubles the shuffled bytes of every
    ingest cycle."""
    import re

    store = ObservationStore(spark, str(tmp_path / "obs3"))
    store.write(
        _obs(spark, [("S1", dt.datetime(2024, 6, 1, 12), "Q", 1.0, "raw", "wsc")])
    )
    incoming = with_year_month(
        _obs(spark, [("S1", dt.datetime(2024, 6, 2, 12), "Q", 2.0, "raw", "wsc")])
    )
    plan = (
        store.merged_frame(incoming)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    nodes = [m.group(1) for m in re.finditer(r"^\(\d+\) (\w+)", plan, re.M)]
    assert sum(n == "Exchange" for n in nodes) == 1
    assert sum(n == "Window" for n in nodes) == 1


def test_upsert_rewrites_only_incoming_months(spark, tmp_path):
    store = ObservationStore(spark, str(tmp_path / "obs4"))
    rows = [
        ("S1", dt.datetime(2024, m, 1, 12), "Q", float(m), "raw", "wsc")
        for m in (5, 6, 7)
    ]
    store.write(_obs(spark, rows))
    may = Path(store.root) / "year_month=202405" / "datatype=Q"
    july = Path(store.root) / "year_month=202407" / "datatype=Q"
    before = {p.name: p.stat().st_mtime for d in (may, july) for p in d.glob("*.parquet")}
    store.upsert(
        _obs(spark, [("S2", dt.datetime(2024, 6, 2, 12), "Q", 9.0, "raw", "wsc")])
    )
    after = {p.name: p.stat().st_mtime for d in (may, july) for p in d.glob("*.parquet")}
    assert after == before  # untouched months never move
    assert store.read().count() == 4


import pytest


def test_upsert_preserves_null_timestamp_partition(spark, tmp_path):
    """Review regression: a NULL obs_time lands in the hive default
    partition, and NULL never matches isin() — the merge must still
    read that partition or the dynamic overwrite silently deletes the
    stored null-timestamp rows."""
    import datetime as dt

    from nr_rfc_dischargeobs_spark.sources import ObservationStore

    cols = ["station_id", "obs_time", "datatype", "value", "qc_level", "source"]
    schema = ("station_id string, obs_time timestamp, datatype string,"
              " value double, qc_level string, source string")
    store = ObservationStore(spark, str(tmp_path / "s"))
    store.write(
        spark.createDataFrame(
            [("S1", None, "Q", 1.0, "raw", "a"),
             ("S2", dt.datetime(2024, 6, 1, 10), "Q", 2.0, "raw", "a")],
            schema,
        )
    )
    # incoming touches the null partition with a DIFFERENT key
    store.upsert(
        spark.createDataFrame(
            [("S9", None, "Q", 9.0, "raw", "b")], schema
        )
    )
    got = {(r["station_id"], r["value"]) for r in store.read().collect()}
    assert got == {("S1", 1.0), ("S2", 2.0), ("S9", 9.0)}


def test_exists_reraises_non_missing_errors(spark, tmp_path):
    """Review regression: exists() must map ONLY missing-path/empty to
    False — a garbage root (here: a text file where parquet should be)
    raises instead of being misread as 'fresh store', because the
    fresh-store path dynamically overwrites incoming months."""
    from nr_rfc_dischargeobs_spark.sources import ObservationStore

    root = tmp_path / "garbage"
    root.mkdir()
    (root / "part-00000.parquet").write_text("this is not parquet")
    store = ObservationStore(spark, str(root))
    with pytest.raises(Exception):
        store.exists()
    missing = ObservationStore(spark, str(tmp_path / "never_written"))
    assert missing.exists() is False


def test_is_missing_path_token_fallback_without_accessors():
    """ADVICE fix pin: an exception that escaped PySpark's error
    framework (no getCondition/getErrorClass — e.g. a raw Py4JJavaError)
    still classifies as missing-path when its MESSAGE carries the
    structured condition token, so first-run behavior survives exception
    wrappers; prose without the token stays un-matched, and a structured
    exception reporting a DIFFERENT condition never falls through to the
    text scan."""
    from nr_rfc_dischargeobs_spark.errors import is_missing_path

    class RawError(Exception):
        pass

    assert is_missing_path(
        RawError("[PATH_NOT_FOUND] Path does not exist: /x/y")
    )
    assert is_missing_path(
        RawError("[UNABLE_TO_INFER_SCHEMA] Unable to infer schema")
    )
    # the Py4J spelling: preamble line + Java-class-prefixed message
    assert is_missing_path(
        RawError(
            "An error occurred while calling o42.parquet.\n"
            ": org.apache.spark.sql.AnalysisException: [PATH_NOT_FOUND]"
            " Path does not exist: /x/y"
        )
    )
    assert not is_missing_path(RawError("path does not exist"))  # prose only
    assert not is_missing_path(RawError("ACCESS_DENIED on bucket"))
    # a token QUOTED deep in a cause chain must not classify: the
    # primary failure is something else and the fresh-store path
    # overwrites — review-fix pin (head-anchored match, first 3 lines)
    assert not is_missing_path(
        RawError(
            "Job aborted due to stage failure: task 3 failed 4 times\n"
            "most recent failure: ThrottlingException: slow down\n"
            "caused by: retry of speculative read\n"
            "Caused by: AnalysisException: [PATH_NOT_FOUND] /tmp/x"
        )
    )
    assert not is_missing_path(
        RawError("reading store failed after [PATH_NOT_FOUND]-like retry")
    )

    class Structured(Exception):
        def getCondition(self):
            return "ACCESS_DENIED"

    # structured condition wins: the token in the message must NOT make
    # a credentials failure look like a fresh store
    assert not is_missing_path(
        Structured("ACCESS_DENIED while listing [PATH_NOT_FOUND]-like dir")
    )

    class StructuredMissing(Exception):
        def getCondition(self):
            return "PATH_NOT_FOUND"

    assert is_missing_path(StructuredMissing("anything"))


# ---------------------------------------------------------------------------
# round 11: ANN index maintenance (rebalance under drift)
# ---------------------------------------------------------------------------


def test_rebalance_ivfadc_noop_trigger_and_repair(spark, tmp_path):
    """The maintenance sweep: below-threshold skew is a no-op (artifact
    byte-untouched); above it, the coarse quantizer retrains on the
    current corpus, the table+sidecar swap atomically, skew drops, and
    the post-swap artifact still satisfies the full-probe-==-brute-
    force-over-decode IVFADC invariant."""
    import os

    import numpy as np
    from pyspark.sql import functions as F

    from nr_rfc_dischargeobs_spark.extensions import ann_store, similarity as S

    rng = np.random.default_rng(9)
    centers = [np.zeros(8), np.ones(8), -np.ones(8),
               np.array([2.0] * 4 + [-2.0] * 4)]
    rows = []
    for g in range(4):
        rows += [
            (g * 50 + i,
             [float(x) for x in centers[g] + 0.05 * rng.normal(size=8)])
            for i in range(50)
        ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    prep = S.prepare(emb)
    # stale coarse: 4 lists, all near clusters 0/1 — clusters 2/3 pile in
    stale = [
        (0, [int(v) for v in (100000 * centers[0]).astype(int)]),
        (1, [int(v) for v in (100000 * centers[1]).astype(int)]),
        (2, [int(v) for v in (100000 * (centers[0] + 0.01)).astype(int)]),
        (3, [int(v) for v in (100000 * (centers[1] + 0.01)).astype(int)]),
    ]
    res = S.residualize(S.ivf_assign_local(prep, stale), stale)
    cb = S.pq_train_codebooks(res, k=4, m=2, dim=8, iters=1)
    idx = S.ivf_pq_index(prep, None, cb, m=2, dim=8, residual=True,
                         coarse_rows=stale, assign="local")
    path = str(tmp_path / "drifted")
    ann_store.save_ivfadc(idx, path, stale, cb, m=2, dim=8)

    before = sorted(
        os.path.join(r, f) for r, _, fs in os.walk(path) for f in fs
    )
    rep0 = ann_store.rebalance_ivfadc(
        spark, path, prep, threshold=100.0
    )
    assert rep0["rebalanced"] is False and rep0["skew_before"] > 1.5
    after = sorted(
        os.path.join(r, f) for r, _, fs in os.walk(path) for f in fs
    )
    assert after == before  # no-op leaves the artifact untouched

    rep = ann_store.rebalance_ivfadc(
        spark, path, prep, threshold=1.5
    )
    assert rep["rebalanced"] is True
    assert rep["skew_after"] < rep["skew_before"]
    assert rep["kept"] == 200  # every code survives the rewrite

    loaded = ann_store.load_ivfadc(path)
    q = prep.filter(F.col("vec_id") < 6)
    got = loaded.search(q, k=3, nprobe=rep["n_lists_after"])
    dec = S.ivfadc_decode(
        loaded.frame(spark), loaded.coarse_rows, loaded.centroid_rows,
        m=2, dim=8,
    )
    want = S.brute_force_topk(q, dec, k=3).withColumnRenamed(
        "cosine", "cosine_adc"
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
