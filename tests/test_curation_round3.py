"""Round-3 curation operators: sequence packing, contamination, Gopher
rules, repetition — semantic tests on constructed corpora (the oracle
harness separately hash-checks them against DuckDB on the driver tables)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nr_rfc_dischargeobs_spark.extensions import contamination, packing, text


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------------------- packing


def test_pack_offsets_are_contiguous_per_shard(spark):
    docs = _docs(
        spark, [(i, " ".join(["w"] * (10 + i))) for i in range(40)]
    )
    out = packing.pack_assignments(docs, budget=64, shards=4).collect()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) > 1  # hash actually spreads
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.doc_id)
        expect = 0
        for r in rows:
            assert r.start_offset == expect  # concat layout: no gaps
            expect += r.n_tokens


def test_pack_block_spans_match_budget_arithmetic(spark):
    docs = _docs(spark, [(i, " ".join(["w"] * 30)) for i in range(20)])
    for r in packing.pack_assignments(docs, budget=64, shards=2).collect():
        assert r.seq_first == r.start_offset // 64
        assert r.seq_last == (r.start_offset + r.n_tokens - 1) // 64
        assert r.n_seqs == r.seq_last - r.seq_first + 1
        assert 1 <= r.n_seqs <= 2  # 30-token docs straddle at most once


def test_pack_assignments_stable_under_append(spark):
    """A doc's (shard, offset) never moves when later docs arrive — the
    property that lets an incremental corpus re-pack only its tail."""
    base = _docs(spark, [(i, " ".join(["w"] * (5 + i % 7))) for i in range(30)])
    grown = _docs(
        spark,
        [(i, " ".join(["w"] * (5 + i % 7))) for i in range(30)]
        + [(100 + i, "x y z") for i in range(10)],
    )
    before = {
        r.doc_id: (r.shard, r.start_offset)
        for r in packing.pack_assignments(base, budget=32, shards=4).collect()
    }
    after = {
        r.doc_id: (r.shard, r.start_offset)
        for r in packing.pack_assignments(grown, budget=32, shards=4).collect()
        if r.doc_id < 100
    }
    # appended ids sort after every existing id, so existing offsets hold
    assert before == after


# ------------------------------------------------------- contamination


def test_contamination_flags_planted_benchmark_passage(spark):
    passage = "the quick brown fox jumps over the lazy dog tonight"
    corpus = _docs(
        spark,
        [
            (10, "completely unrelated text about spark partitions here"),
            (11, f"prefix words then {passage} and a suffix tail"),
        ],
    )
    bench = _docs(spark, [(1, passage)])
    out = contamination.ngram_contamination(corpus, bench, n=5).collect()
    assert [r.doc_id for r in out] == [11]
    r = out[0]
    assert r.n_contaminated > 0 and r.n_bench_docs == 1
    assert 0 < r.contamination <= 1


def test_contamination_requires_n_consecutive_words(spark):
    # shares every WORD with the benchmark but never 3 in a row
    corpus = _docs(spark, [(10, "fox brown quick dog lazy over jumps")])
    bench = _docs(spark, [(1, "the quick brown fox jumps over the lazy dog")])
    assert (
        contamination.ngram_contamination(corpus, bench, n=3).count() == 0
    )


def test_contamination_spans_locate_every_occurrence(spark):
    """The audit trail: token offsets point at the leaked passage, every
    occurrence reports (a twice-pasted eval question → two spans), and
    each span implicates the right benchmark doc."""
    leak = "alpha beta gamma delta"
    corpus = _docs(
        spark,
        [
            # leak at token offsets 2 and 8 (0-based)
            (10, f"w0 w1 {leak} w6 w7 {leak}"),
            (11, "nothing shared here at all"),
        ],
    )
    bench = _docs(spark, [(1, leak), (2, f"unrelated things {leak}")])
    out = contamination.contamination_spans(corpus, bench, n=4).collect()
    spans = sorted((r.doc_id, r.bench_doc_id, r.pos_first, r.pos_last) for r in out)
    # both occurrences × both implicated bench docs
    assert spans == [
        (10, 1, 2, 5), (10, 1, 8, 11),
        (10, 2, 2, 5), (10, 2, 8, 11),
    ]
    assert all(len(r.gram) == 32 for r in out)  # md5 hex audit key


def test_contamination_spans_partial_tail_is_capped(spark):
    """A short doc's partial tail shingle still matches (same convention
    as shingle_rows) and its pos_last is capped at the last real token."""
    corpus = _docs(spark, [(10, "alpha beta")])  # 2 tokens, n=4 partial
    bench = _docs(spark, [(1, "alpha beta")])
    out = contamination.contamination_spans(corpus, bench, n=4).collect()
    assert [(r.pos_first, r.pos_last) for r in out] == [(0, 1)]


# --------------------------------------------------------- gopher rules


def test_gopher_rules_pass_and_fail_branches(spark):
    good = (
        "the quick brown fox is happy and ready to work over many fine "
        "days of steady calm weather with good food and warm light"
    )
    docs = _docs(
        spark,
        [
            (1, good),
            (2, "x y z"),  # too few words, no stopwords
            (3, "### ### ### " + good),  # symbol-heavy prefix
        ],
    )
    rows = {r.doc_id: r for r in text.gopher_rules(docs).collect()}
    assert rows[1].gopher_pass
    assert not rows[2].ok_word_count and not rows[2].ok_stopwords
    assert not rows[2].gopher_pass
    assert not rows[3].ok_symbol_ratio and not rows[3].gopher_pass


def test_gopher_flags_are_conjunction(spark):
    docs = _docs(spark, [(1, "some words appear here now then")])
    r = text.gopher_rules(docs).collect()[0]
    flags = [
        r.ok_word_count, r.ok_mean_word_len, r.ok_symbol_ratio,
        r.ok_ellipsis_lines, r.ok_alpha_words, r.ok_stopwords,
    ]
    assert r.gopher_pass == all(flags)


# ---------------------------------------------------------- repetition


def test_repetition_scores_boilerplate_high_prose_low(spark):
    spam = " ".join(["buy now"] * 30)
    prose = (
        "each word here differs from every other token in this sentence "
        "so bigram mass spreads thin across many distinct pairs"
    )
    docs = _docs(spark, [(1, spam), (2, prose)])
    rows = {r.doc_id: r for r in text.repetition_stats(docs, n=2).collect()}
    assert rows[1].top_gram_frac > 0.4  # "now buy"/"buy now" dominate
    assert rows[2].top_gram_frac < 0.1
    assert rows[1].top_gram_n > 20


def test_repetition_counts_duplicate_lines(spark):
    doc = "same line\nsame line\nsame line\nunique line"
    rows = text.repetition_stats(
        _docs(spark, [(1, doc)]), n=2
    ).collect()
    r = rows[0]
    assert r.n_lines == 4
    assert r.dup_line_frac == pytest.approx(0.5)  # 2 of 4 rows redundant


# ------------------------------------------------- plan-shape contracts


def test_contamination_broadcasts_benchmark_side(spark, sf_dir):
    """The corpus must never shuffle for the join: benchmark shingles are
    broadcast (the 100 TB contract in extensions/contamination.py)."""
    from nr_rfc_dischargeobs_spark.plans import extensions as ext_plans

    df = ext_plans.contamination_ngram(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_pack_sequences_single_exchange(spark, sf_dir):
    """Packing is one shuffle (on shard) end-to-end."""
    from nr_rfc_dischargeobs_spark.plans import extensions as ext_plans

    df = ext_plans.pack_sequences(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # shard hash + AQE read, no more


# ------------------------------------------------------------- pii scrub


def test_pii_scrub_detects_and_redacts(spark):
    docs = _docs(
        spark,
        [
            (1, "mail alice@example.org or 604-555-0199 from 192.168.1.77"),
            (2, "no sensitive content in this one"),
        ],
    )
    rows = {r.doc_id: r for r in text.pii_scrub(docs).collect()}
    r = rows[1]
    assert (r.n_email, r.n_phone, r.n_ip) == (1, 1, 1)
    assert "[EMAIL]" in r.clean_text and "[PHONE]" in r.clean_text
    assert "[IP]" in r.clean_text
    assert "alice@example.org" not in r.clean_text
    assert "192.168.1.77" not in r.clean_text
    clean2 = rows[2]
    assert (clean2.n_email, clean2.n_phone, clean2.n_ip) == (0, 0, 0)
    assert clean2.clean_text == "no sensitive content in this one"


def test_pii_scrub_counts_before_redaction_order(spark):
    # counts reflect the ORIGINAL text per class, independent of the
    # redaction order: the email rule (applied first) consumes its whole
    # match before the IP pass runs, and the \b guards keep the email's
    # IP-shaped host prefix (digit→letter, no boundary) out of n_ip
    docs = _docs(spark, [(1, "x user@10.0.0.1ab.com y 10.0.0.1 z")])
    r = text.pii_scrub(docs).collect()[0]
    assert r.n_email == 1
    assert r.n_ip == 1  # only the bare, boundary-delimited IP
    assert r.clean_text == "x [EMAIL] y [IP] z"


# ----------------------------------------------- arrow re-rank kernel


def test_arrow_brute_force_bit_matches_native(spark, sf_dir):
    """The Arrow matmul kernel returns EXACTLY the native plan's rows —
    same integer dots, same IEEE division, same tie-break — so either
    kernel can serve as the other's oracle."""
    from nr_rfc_dischargeobs_spark.extensions import similarity as sim
    from nr_rfc_dischargeobs_spark.plans import load

    emb = sim.prepare(load(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 20)
    nat = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in sim.brute_force_topk(queries, emb, k=7).collect()
    }
    arr = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in sim.brute_force_topk_arrow(queries, emb, k=7).collect()
    }
    assert nat == arr
    assert len(nat) == 20 * 7


def test_arrow_kernel_zero_norm_parity(spark):
    """Degenerate inputs where the kernels used to diverge: a zero-norm
    vector gives Spark-NULL vs numpy-inf/NaN cosine.  Both kernels now
    exclude zero-norm rows on both sides, so they stay bit-identical —
    the 'either kernel is the other's oracle' claim on its worst case."""
    from nr_rfc_dischargeobs_spark.extensions import similarity as sim

    emb = sim.prepare(
        spark.createDataFrame(
            [
                (0, [1.0, 0.0]),       # query
                (1, [0.0, 0.0]),       # zero-norm query: excluded
                (10, [0.9, 0.1]),
                (11, [0.0, 0.0]),      # zero-norm corpus row: excluded
                (12, [0.5, -0.5]),
            ],
            "vec_id long, embedding array<double>",
        )
    )
    queries, corpus = emb.filter(F.col("vec_id") < 10), emb.filter(
        F.col("vec_id") >= 10
    )
    nat = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in sim.brute_force_topk(queries, corpus, k=5).collect()
    }
    arr = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in sim.brute_force_topk_arrow(queries, corpus, k=5).collect()
    }
    assert nat == arr
    # only the non-degenerate query survives; its neighbors exclude 11
    assert {q for q, _ in nat} == {0}
    assert {n for n, _ in nat.values()} == {10, 12}


def test_arrow_brute_force_empty_query_batch(spark, sf_dir):
    from nr_rfc_dischargeobs_spark.extensions import similarity as sim
    from nr_rfc_dischargeobs_spark.plans import load

    emb = sim.prepare(load(spark, sf_dir, "embeddings"))
    out = sim.brute_force_topk_arrow(
        emb.filter(F.col("vec_id") < 0), emb, k=3
    )
    assert out.count() == 0


def test_pack_assignments_null_and_empty_text(spark):
    """NULL text packs as zero tokens; empty string packs as one (the
    whitespace-split convention) — neither poisons later offsets."""
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, ""), (4, "d e")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           packing.pack_assignments(docs, budget=8, shards=1).collect()}
    assert out[2].n_tokens == 0
    assert out[3].n_tokens == 1
    assert out[2].start_offset is not None
    # offsets stay contiguous through the null doc
    assert out[4].start_offset == (
        out[1].n_tokens + out[2].n_tokens + out[3].n_tokens
    )


def test_gopher_rules_null_text_fails_closed(spark):
    """A NULL document never passes the gate (flags are NULL → the
    conjunction is not TRUE) — fail-closed, the right polarity for a
    quality filter."""
    docs = spark.createDataFrame(
        [(1, None)], "doc_id long, text string"
    )
    r = text.gopher_rules(docs).collect()[0]
    assert not r.gopher_pass  # NULL or False — never True


def test_pack_zero_token_shard_head_agrees_with_duckdb(spark, tmp_path):
    """The case the floor-vs-truncate engines disagree on: a NULL-text doc
    whose id sorts FIRST in its shard (cum_end-1 = -1). Both engines must
    emit the pinned (seq_first, seq_first, 0) span."""
    import duckdb

    rows = [(i, None if i == 0 else "w " * 5) for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # shards=1 forces the null doc (id 0) to the head of the only shard
    got = {
        r.doc_id: (r.start_offset, r.seq_first, r.seq_last, r.n_seqs)
        for r in packing.pack_assignments(
            docs, budget=8, shards=1
        ).collect()
    }
    assert got[0] == (0, 0, 0, 0)  # empty doc: zero-width span, not -1

    pq = tmp_path / "d.parquet"
    docs.toPandas().to_parquet(pq)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}')"
    )
    sql = packing.pack_assignments_sql(budget=8, shards=1)
    want = {
        r[0]: (r[3], r[4], r[5], r[6])
        for r in con.execute(sql).fetchall()
    }
    assert got == want


def test_pack_span_exact_beyond_2_53(spark):
    """Offsets past 2⁵³ (where DOUBLE loses integer resolution) still
    divide exactly: the span expressions use integer `div`, not
    floor(long / int).  The chosen operands are ones double division gets
    WRONG — the floor(double) variant is asserted wrong in the same breath
    so the test is red under a regression to `/`."""
    budget = 512
    # cum_end just past a block boundary above 2**53: exact seq index is
    # (cum_end - 1) // 512, which double arithmetic rounds off
    cum_end = (1 << 55) + 3
    n_tokens = 5
    df = spark.createDataFrame(
        [(cum_end, n_tokens)], "cum_end long, n_tokens long"
    )
    seq_first, seq_last, n_seqs = packing.span_columns(budget)
    row = df.select(
        seq_first.alias("f"), seq_last.alias("l"), n_seqs.alias("n")
    ).collect()[0]
    assert row.f == (cum_end - n_tokens) // budget
    assert row.l == (cum_end - 1) // budget
    assert row.n == row.l - row.f + 1
    # and the double-division variant really is wrong here (the reason
    # for `div`): floor((2**55 - 2) / 512.0) != (2**55 - 2) // 512
    wrong = df.select(
        F.floor((F.col("cum_end") - F.col("n_tokens")) / budget).alias("w")
    ).collect()[0].w
    assert wrong != row.f


# ------------------------------------------------- chunking / top terms


def test_chunk_windows_overlap_and_partial_tail(spark):
    doc = " ".join(f"t{i}" for i in range(10))  # 10 tokens
    out = sorted(
        text.chunk_windows(
            _docs(spark, [(1, doc)]), chunk_tokens=4, stride=2
        ).collect(),
        key=lambda r: r.chunk_id,
    )
    # ceil((10-4)/2)+1 = 4 chunks, stride-2 overlap, last one full
    assert [r.chunk_id for r in out] == [0, 1, 2, 3]
    assert out[0].chunk == "t0 t1 t2 t3"
    assert out[1].chunk == "t2 t3 t4 t5"
    assert out[3].chunk == "t6 t7 t8 t9"
    assert all(r.n_chunks == 4 and r.n_tokens == 10 for r in out)


def test_chunk_windows_short_doc_single_partial_chunk(spark):
    out = text.chunk_windows(
        _docs(spark, [(1, "a b")]), chunk_tokens=8, stride=4
    ).collect()
    assert len(out) == 1
    assert out[0].chunk == "a b" and out[0].n_chunks == 1


def test_chunk_windows_null_text_yields_one_empty_chunk(spark, tmp_path):
    """The never-zero-chunks contract on its edge: NULL text coalesces to
    '' and yields exactly ONE empty chunk (downstream joins keep the doc)
    instead of being silently dropped by the explode — and the DuckDB twin
    agrees row-for-row."""
    import duckdb

    from nr_rfc_dischargeobs_spark.plans import extensions as ext_plans

    docs = spark.createDataFrame(
        [(1, None), (2, "a b c")], "doc_id long, text string"
    )
    out = sorted(
        text.chunk_windows(docs, chunk_tokens=2, stride=1).collect(),
        key=lambda r: (r.doc_id, r.chunk_id),
    )
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 1  # NULL doc kept, one chunk
    assert by_doc[1][0].chunk == ""
    # '' splits to [''] — one token, the whitespace-split convention
    assert by_doc[1][0].n_tokens == 1 and by_doc[1][0].n_chunks == 1
    assert len(by_doc[2]) == 2  # sanity: 3 tokens, c=2 s=1 → 2 chunks

    pq = tmp_path / "d.parquet"
    docs.toPandas().to_parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}')")
    sql = ext_plans.TEXT_CHUNK_WINDOWS_SQL.replace("64", "2").replace("32", "1")
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    got = sorted(
        (r.doc_id, r.n_tokens, r.n_chunks, r.chunk_id, r.chunk) for r in out
    )
    assert got == want


def test_top_terms_ranks_distinctive_word_first(spark):
    docs = _docs(
        spark,
        [
            (1, "common common rareword rareword common"),
            (2, "common common common common"),
            (3, "common common other common"),
        ],
    )
    out = text.top_terms(docs, k=1).collect()
    by_doc = {r.doc_id: r for r in out}
    # doc 1: 'rareword' tf=2 df=1 -> score 2*3/1 = 6.0 strictly beats
    # 'common' tf=3 df=3 -> score 3.0; an inverted or df-blind scoring
    # would rank 'common' first and fail here
    assert by_doc[1].word == "rareword"
    assert by_doc[1].score == 6.0
    assert by_doc[2].word == "common"


def test_top_terms_score_is_exact_ratio(spark):
    docs = _docs(spark, [(1, "x x y"), (2, "y y y")])
    rows = {(r.doc_id, r.word): r for r in text.top_terms(docs, k=5).collect()}
    r = rows[(1, "x")]
    assert (r.tf, r.df) == (2, 1)
    assert r.score == 2.0 * 2.0 / 1.0  # tf * N / df, exact doubles
    r = rows[(2, "y")]
    assert (r.tf, r.df) == (3, 2)
    assert r.score == 3.0 * 2.0 / 2.0


def _bm25_replica(tf, df, dl, n, t):
    """Scalar replica of the exact bm25_topk arithmetic (HALF_UP rounds,
    grid idf, cleared-rational saturation weight)."""
    import math

    if tf == 0:
        return 0
    half_up = lambda x: math.floor(x + 0.5)  # noqa: E731
    idf = half_up(math.log2(2 * n + 2) * (1 << 20)) - half_up(
        math.log2(2 * df + 1) * (1 << 20)
    )
    w = (22.0 * t * tf) / (10.0 * t * tf + 3.0 * t + 9.0 * dl * n)
    return half_up(idf * w)


def test_bm25_scores_match_replica_and_rank_sanely(spark):
    """BM25 end to end on a hand-sized corpus: every emitted score_g
    equals the scalar replica; the both-terms doc ranks first; the
    rarer term outscores the commoner at equal tf/dl; a shorter doc
    outscores a longer one at equal tf (b-normalization); non-matching
    docs are absent."""
    docs = _docs(
        spark,
        [
            (1, "merge common common common"),
            (2, "rare common common common"),
            (3, "merge rare common common"),
            (4, "common common common common"),
            (5, "merge common"),
        ],
    )
    n, t = 5, 18
    tfs = {1: {"merge": 1}, 2: {"rare": 1}, 3: {"merge": 1, "rare": 1}, 5: {"merge": 1}}
    dls = {1: 4, 2: 4, 3: 4, 5: 2}
    dfs = {"merge": 3, "rare": 2}
    rows = {
        r.doc_id: r
        for r in text.bm25_topk(docs, ["merge", "rare"], k=10).collect()
    }
    assert set(rows) == {1, 2, 3, 5}  # doc 4 never matches
    for d, r in rows.items():
        want = sum(
            _bm25_replica(tf, dfs[term], dls[d], n, t)
            for term, tf in tfs[d].items()
        )
        assert r.score_g == want, (d, r.score_g, want)
        assert r.score == r.score_g / (1 << 20)
    assert max(rows.values(), key=lambda r: r.score_g).doc_id == 3
    assert rows[2].score_g > rows[1].score_g  # rarer term, same tf/dl
    assert rows[5].score_g > rows[1].score_g  # shorter doc, same tf


def test_bm25_k_limit_and_tie_break(spark):
    """k truncates after the (score desc, doc_id asc) sort — equal-score
    docs keep the smaller ids."""
    docs = _docs(spark, [(i, "hit filler") for i in range(6)])
    got = [r.doc_id for r in text.bm25_topk(docs, ["hit"], k=3).collect()]
    assert sorted(got) == [0, 1, 2]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty"):
        text.bm25_topk(docs, [])
