"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then compares
row count, schema (column names, sorted), and an order-insensitive value hash.
Use while iterating so CORRECTNESS_r{N}.json holds no surprises:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if v != v:  # NaN
            return "∅"
        # round-trip through a fixed precision so -0.0/0.0 and 1e-12 noise
        # don't distinguish otherwise-equal results
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(normalize_cell(x) for x in v) + "]"
    return str(v)


def frame_fingerprint(cols: list[str], rows: list[tuple]) -> tuple[int, list[str], str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(normalize_cell(row[i]) for i in order) for row in rows
    )
    digest = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), sorted(cols), digest


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from nr_rfc_dischargeobs_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    from nr_rfc_dischargeobs_spark.plans.extensions import (
        release_plan_caches,
    )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures, missing_oracle = [], []
    n_checked = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        n_checked += 1
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        s_fp = frame_fingerprint(sdf.columns, srows)
        spark_s = time.time() - t0
        # plan-owned caches (PQ codes, SemDeDup assignment, IVF-PQ
        # index) must not accrete across a full-registry sweep
        release_plan_caches()
        if name not in oracles:
            missing_oracle.append(name)
            print(f"  ~ {name}: rows={s_fp[0]} (no oracle — rows-only) "
                  f"[{spark_s:.1f}s]")
            continue
        t0 = time.time()
        rel = con.execute(oracles[name])
        cols = [d[0] for d in rel.description]
        drows = rel.fetchall()
        d_fp = frame_fingerprint(cols, drows)
        duck_s = time.time() - t0
        ok = s_fp == d_fp
        status = "ok" if ok else "FAIL"
        print(f"  {'✓' if ok else '✗'} {name}: {status} rows={s_fp[0]}/{d_fp[0]} "
              f"hash={s_fp[2]}/{d_fp[2]} [spark {spark_s:.1f}s duck {duck_s:.2f}s]")
        if not ok:
            failures.append(name)
            if s_fp[1] != d_fp[1]:
                print(f"      schema spark={s_fp[1]} duck={d_fp[1]}")
            else:
                shead = sorted(
                    "|".join(normalize_cell(c) for c in r) for r in srows
                )[:3]
                dhead = sorted(
                    "|".join(normalize_cell(c) for c in r) for r in drows
                )[:3]
                print(f"      spark head: {shead}")
                print(f"      duck  head: {dhead}")
    skipped = len(queries) - n_checked
    print(f"{n_checked - len(failures) - len(missing_oracle)} ok, "
          f"{len(failures)} failed, {len(missing_oracle)} rows-only"
          + (f" ({skipped} not selected)" if skipped else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
