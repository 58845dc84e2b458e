"""Property-based tests (hypothesis) for contracts the operators document:

- ``round_to_grid`` claims exact parity with pandas ``dt.round('5min')``
  (``operators/conform.py`` cites ``discharge_obs_pd.py:143``) — checked
  against pandas itself on generated timestamps, ties included;
- ``pii_scrub`` claims complete redaction — no pattern class survives in
  ``clean_text``, and counts cover everything planted;
- ``pack_assignments`` claims exact concat-and-chunk arithmetic — checked
  against an independent pure-Python packer on generated corpora.

Each example batches many generated cases into ONE small DataFrame so the
per-example Spark round-trip is paid once, not per case.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nr_rfc_dischargeobs_spark.extensions import packing, text
from nr_rfc_dischargeobs_spark.operators import conform

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

@given(micros=st.lists(
    st.integers(min_value=1_700_000_000_000_000, max_value=1_760_000_000_000_000),
    min_size=1, max_size=40,
))
@settings(**SETTINGS)
def test_round_to_grid_matches_pandas_round(spark, micros):
    from pyspark.sql import functions as F

    # force exact tie points into every example (the interesting branch)
    micros = micros + [
        micros[0] - micros[0] % 300_000_000 + 150_000_000,
        micros[0] - micros[0] % 600_000_000 + 450_000_000,
    ]
    stamps = [dt.datetime.utcfromtimestamp(us / 1e6) for us in micros]
    df = spark.createDataFrame([(t,) for t in stamps], "ts timestamp")
    got = [
        r.rounded
        for r in df.select(
            conform.round_to_grid(F.col("ts")).alias("rounded")
        ).collect()
    ]
    want = list(pd.Series(stamps).dt.round("5min"))
    assert [pd.Timestamp(g) for g in got] == want


@given(
    fillers=st.lists(
        st.text(alphabet="xyzw", min_size=1, max_size=6),
        min_size=1,
        max_size=8,
    ),
    user=st.text(alphabet="abc123", min_size=1, max_size=8),
    octets=st.tuples(*[st.integers(0, 255)] * 4),
)
@settings(**SETTINGS)
def test_pii_scrub_redaction_is_complete(spark, fillers, user, octets):
    ip = ".".join(str(o) for o in octets)
    doc = " ".join(fillers) + f" {user}@example.com then {ip} end"
    out = text.pii_scrub(
        spark.createDataFrame([(1, doc)], "doc_id long, text string")
    ).collect()[0]
    assert out.n_email >= 1 and out.n_ip >= 1
    assert f"{user}@example.com" not in out.clean_text
    assert f" {ip} " not in out.clean_text
    # scrubbing the scrubbed text finds nothing new — fixpoint
    again = text.pii_scrub(
        spark.createDataFrame(
            [(1, out.clean_text)], "doc_id long, text string"
        )
    ).collect()[0]
    assert (again.n_email, again.n_phone, again.n_ip) == (0, 0, 0)
    assert again.clean_text == out.clean_text


@given(
    token_counts=st.lists(st.integers(1, 50), min_size=1, max_size=60),
    budget=st.integers(8, 128),
)
@settings(**SETTINGS)
def test_pack_assignments_match_pure_python_packer(
    spark, token_counts, budget
):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(token_counts)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.shard, r.start_offset, r.seq_first, r.seq_last, r.n_seqs)
        for r in packing.pack_assignments(
            docs, budget=budget, shards=4
        ).collect()
    }
    # independent reference: group by the SAME portable hash shard (read
    # from the result), order by doc_id, run the concat-and-chunk layout
    shard_of = {d: got[d][0] for d in got}
    offsets: dict[int, int] = {}
    for d in sorted(got):
        start = offsets.get(shard_of[d], 0)
        n = token_counts[d]
        expect = (
            shard_of[d],
            start,
            start // budget,
            (start + n - 1) // budget,
            (start + n - 1) // budget - start // budget + 1,
        )
        assert got[d] == expect, d
        offsets[shard_of[d]] = start + n
