"""Streaming document curation: the training-data ingest tier as a
continuous pipeline.

At fleet scale new corpus shards land continuously (crawl drops, partner
feeds); the curation gates are scan-local generated expressions, so they
lift onto Structured Streaming unchanged — one gate implementation, two
drivers, exactly like the observation tier (``streaming/ingest.py``):

- quality/Gopher gate + PII scrub: stateless projections/filters, applied
  per micro-batch with zero state (the ``passthrough`` plumbing keeps the
  lineage LINEAR — a gate implemented as a self-join would be a
  stream-stream join accumulating unbounded state);
- exact dedup: ``dropDuplicatesWithinWatermark`` on the normalized content
  fingerprint — state bounded by the late-arrival horizon, not corpus
  history, so the stream runs forever.  (Near-dup LSH stays a periodic
  BATCH compaction over the landed output: candidate generation is a
  corpus-wide self-join, not an incremental-state shape.)

``Trigger.AvailableNow`` gives the cron-batch operational model: drain,
checkpoint, exit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..errors import is_missing_path
from ..extensions import text as tx

DOC_STREAM_SCHEMA = (
    "doc_id long, text string, lang string, source string, "
    "ingest_time timestamp"
)


def stream_documents_jsonl(
    spark: SparkSession,
    landing_dir: str,
    schema: StructType | str = DOC_STREAM_SCHEMA,
) -> DataFrame:
    """File-source stream over a JSONL landing directory (the standard
    interchange shape for document corpora).  The file source's
    checkpointed file tracking gives exactly-once shard ingestion."""
    return spark.readStream.schema(schema).json(landing_dir)


def curate_document_stream(
    docs: DataFrame,
    min_words: int = 5,
    max_words: int = 100_000,
    watermark: str = "24 hours",
    ts: str = "ingest_time",
    meta: tuple[str, ...] = ("lang", "source", "ingest_time"),
    classifier_min_score: float | None = None,
    lm_counts: tuple | None = None,
    lm_min_score: float | None = None,
    dsir_counts: tuple | None = None,
    dsir_min_logw: float | None = None,
) -> DataFrame:
    """Gate → (optional classifier gate) → (optional LM-perplexity gate)
    → scrub → fingerprint-dedup, all streaming-safe, one linear lineage
    (works identically on a batch frame — same gates, two drivers).

    ``classifier_min_score`` switches on the hashed-linear-model quality
    gate (:func:`~..extensions.text.hash_classifier`) between the rule
    battery and the scrub: docs scoring below the threshold drop.  Like
    every other gate here it is a scan-local generated expression —
    stateless, so it lifts onto the stream unchanged.

    ``lm_counts`` + ``lm_min_score`` switch on the bigram-LM perplexity
    gate (:func:`~..extensions.text.bigram_lm_scores_trained`): counts
    are PRE-TRAINED model parameters (plain (bucket, count) rows from
    :func:`~..extensions.text.bigram_lm_counts` on a reference corpus),
    folded into literal lookup arrays — scoring is row-local, hence
    stream-safe; docs whose ``avg_logp2`` falls below the threshold
    drop.

    ``dsir_counts`` + ``dsir_min_logw`` switch on the DSIR
    domain-relevance gate
    (:func:`~..extensions.sampling.dsir_log_ratio_trained`): counts are
    the PRE-TRAINED (target_bigram_counts, raw_bigram_counts) model
    pair, folded into one literal ratio-term array — row-local, hence
    stream-safe; docs whose importance ``logw`` falls below the
    threshold (not target-domain-like enough) drop, and 0-feature docs
    fail CLOSED like the LM gate.  The full production gate stack:
    rules → trained classifier → LM perplexity → DSIR relevance →
    scrub → dedup.

    Returns the curated stream: (doc_id, *meta, n_words, text=redacted,
    fingerprint).  A re-landed shard (same content, later arrival inside
    the watermark) deduplicates on the content fingerprint even when its
    doc_id differs — the crawl-replay case.
    """
    gated = tx.gopher_rules(
        docs,
        min_words=min_words,
        max_words=max_words,
        passthrough=("text", *meta),
    ).filter(F.col("gopher_pass"))
    if classifier_min_score is not None:
        gated = (
            tx.hash_classifier(
                gated, passthrough=("text", "n_words", *meta)
            )
            .filter(F.col("score") >= classifier_min_score)
            .drop("n_tokens", "weight_sum", "score", "positive")
        )
    if lm_min_score is not None:
        if lm_counts is None:
            raise ValueError("lm_min_score requires lm_counts")
        # fail CLOSED: a 0-bigram doc scores the sentinel 0.0, which is
        # ABOVE any realistic (negative) threshold — unscorable docs must
        # drop, not sail through on the sentinel
        gated = (
            tx.bigram_lm_scores_trained(
                gated,
                *lm_counts,
                passthrough=("text", "n_words", *meta),
            )
            .filter(
                (F.col("n_bigrams") > 0)
                & (F.col("avg_logp2") >= lm_min_score)
            )
            .drop("n_bigrams", "slogp", "avg_logp2")
        )
    if dsir_min_logw is not None:
        if dsir_counts is None:
            raise ValueError("dsir_min_logw requires dsir_counts")
        from ..extensions.sampling import dsir_log_ratio_trained

        # fail CLOSED: 0-feature docs carry the 0 sentinel, which may
        # sit above a negative threshold — unscorable docs must drop
        gated = (
            dsir_log_ratio_trained(
                gated,
                *dsir_counts,
                passthrough=("text", "n_words", *meta),
            )
            .filter(
                (F.col("n_feats") > 0) & (F.col("logw") >= dsir_min_logw)
            )
            .drop("n_feats", "logw_scaled", "logw")
        )
    scrubbed = tx.pii_scrub(
        gated, passthrough=("n_words", *meta)
    ).withColumnRenamed("clean_text", "text")
    fingerprinted = tx.fingerprint(
        scrubbed, passthrough=("n_words", "text", *meta)
    )
    if not fingerprinted.isStreaming:
        # batch backfill over a landed corpus: same gates, and the
        # stream's first-arrival-wins dedup becomes keep-min-doc_id
        # (dropDuplicatesWithinWatermark is streaming-only)
        w = Window.partitionBy("fingerprint").orderBy(F.col("doc_id").asc())
        return (
            fingerprinted.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    return fingerprinted.withWatermark(
        ts, watermark
    ).dropDuplicatesWithinWatermark(["fingerprint"])


def land_document_stream(
    curated: DataFrame,
    landed_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Land the curated stream with CROSS-RUN dedup: each micro-batch
    anti-joins its content fingerprints against the already-landed
    corpus before appending — the C4-at-scale posture where the landed
    store itself is the authoritative seen-fingerprint set.

    Why this exists: ``dropDuplicatesWithinWatermark`` bounds its state
    by the late-arrival horizon, so a REDEPLOYED pipeline (fresh
    checkpoint, or content re-crawled after the horizon) would re-admit
    fingerprints the corpus already holds.  The batch-start anti-join
    closes that: dedup state is the corpus, which outlives every
    checkpoint.

    Bounded-state accounting: no driver state and no streaming state
    grows here — the anti-join reads ONLY the ``fingerprint`` column of
    the landed parquet (column-pruned scan, 16 bytes/doc), and the
    in-stream watermark dedup keeps doing the high-frequency work so
    the landed set stays near-unique.  At fleet scale the same join
    targets a compacted fingerprint-only side table maintained by the
    scheduled sweep instead of the full store — same plan shape, one
    column either way.

    The anti-join also makes the append IDEMPOTENT under foreachBatch's
    at-least-once replay: rows a crashed batch already landed filter
    themselves out on retry, so replays converge instead of
    double-landing.

    Returns the started ``StreamingQuery`` (``availableNow`` gives the
    drain-then-exit cron model; pass ``available_now=False`` for a
    continuous run).
    """
    def _land(batch_df: DataFrame, _batch_id: int) -> None:
        out = batch_df
        sess = batch_df.sparkSession
        # existence is probed by ATTEMPTING the read, not by driver-
        # local os.path — an os.path.isdir('s3://…') is always False,
        # which would silently skip the anti-join (the function's whole
        # guarantee) on any non-local store.  A missing/empty dir is
        # the only expected failure; anything else must still raise.
        try:
            seen = sess.read.parquet(landed_dir).select("fingerprint")
            out = out.join(seen, "fingerprint", "left_anti")
        except Exception as ex:  # noqa: BLE001 — filtered below
            if not is_missing_path(ex):
                raise
        out.write.mode("append").parquet(landed_dir)

    writer = curated.writeStream.foreachBatch(_land).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_corpus(
    spark: SparkSession,
    landed_dir: str,
    transform,
    partition_by: tuple[str, ...] = (),
    finalize=None,
) -> tuple[int, int]:
    """The periodic BATCH compaction engine this module's header
    promises: corpus-wide curation (near-dup candidate generation,
    cross-document line/span dedup) is a corpus-wide join or self-join —
    not an incremental-state shape — so the stream lands exact-deduped
    documents and THIS job sweeps the landed directory on a schedule
    (the standard lambda split: streaming handles per-arrival work,
    compaction handles corpus-wide work).

    ``transform`` is any ``DataFrame → DataFrame`` corpus rewrite —
    :func:`compact_near_dups` drops near-duplicate docs,
    :func:`compact_boilerplate` rewrites text through the line/span
    dedup operators — run inside ONE shared implementation of the
    staged-swap machinery, so every sweep variant inherits the same
    snapshot guard and crash recovery.

    Operational contract — stated, not hand-waved:

    - **Run quiesced.** The sweep rewrites the directory; run it between
      ``AvailableNow`` drains (the module's drain-then-exit cron model),
      on a plain parquet corpus directory this job manages — NOT inside
      a live ``writeStream`` sink's output (rewriting would orphan the
      sink's ``_spark_metadata`` exactly-once log).
    - **Concurrent landings are detected, never deleted.** The file set
      is snapshotted before the read and re-listed before the swap; if
      anything landed meanwhile the sweep ABORTS (stage removed, corpus
      untouched, ``RuntimeError``) and the next cycle retries.
    - **Crash-recoverable, not atomic.** POSIX cannot swap two
      directories atomically; there is a window where ``landed_dir`` is
      the freshly staged copy's rename target.  Every crash point is
      recoverable from the ``.precompact`` backup, and recovery runs
      automatically at the next invocation (backup present + dir missing
      → restore; backup present + dir present → finished swap, drop
      backup).

    Returns (staged_rows, input_rows − staged_rows) — for doc-dropping
    transforms that is (kept, dropped); for text rewrites the second
    element is 0 unless the transform also drops rows.

    ``finalize`` (optional, ``staged_path → None``) runs after the
    staged table write and before the swap guards — the hook for
    directories that carry NON-table companions (the ANN index's model
    sidecar): whatever it writes into the stage travels through the
    swap (and every crash-recovery path, which moves directories
    wholesale) atomically with the table.
    """
    import os
    import shutil

    base = landed_dir.rstrip("/")
    staged = base + ".compacting"
    backup = base + ".precompact"

    # recover from a previous crashed sweep before touching anything.
    # The crash states are fully distinguishable: the stage directory is
    # renamed ONTO base as the swap's second move, so backup-present +
    # stage-present proves the swap never completed (and base, if it
    # exists, holds only post-crash landings); backup-present +
    # stage-absent proves the swap completed and only the backup cleanup
    # was missed.
    if os.path.exists(backup):
        if not os.path.exists(base):
            # crashed between the two moves, nothing recreated base
            shutil.move(backup, base)
            shutil.rmtree(staged, ignore_errors=True)
        elif os.path.exists(staged):
            # crashed between the two moves AND a drain recreated base
            # with new landings: the backup is the only full corpus —
            # merge the new landings into it, restore, drop the stale
            # stage.  (Parquet part-file names are UUIDs; collisions
            # would indicate the same file and are skipped.)
            for f in os.listdir(base):
                if not os.path.exists(os.path.join(backup, f)):
                    shutil.move(os.path.join(base, f), backup)
            shutil.rmtree(base)
            shutil.move(backup, base)
            shutil.rmtree(staged)
        else:
            # swap completed (stage was renamed onto base); only the
            # backup cleanup was missed
            shutil.rmtree(backup)
    elif os.path.exists(staged):
        shutil.rmtree(staged)  # stale stage from an aborted run

    def listing() -> list[tuple[str, int, int]]:
        # (relpath, size, mtime_ns): size alone misses a file rewritten
        # in place with unchanged length between snapshot and swap; the
        # nanosecond mtime closes that hole (rename preserves mtime, so
        # the post-move backup listing stays comparable).  The quiesced
        # contract remains the primary defense — this is the tripwire.
        out = []
        for root, _, files in os.walk(base):
            for f in files:
                p = os.path.join(root, f)
                st = os.stat(p)
                out.append(
                    (os.path.relpath(p, base), st.st_size, st.st_mtime_ns)
                )
        return sorted(out)

    snapshot = listing()
    # the job owns its cache lifecycle: persist the scanned docs (every
    # compaction transform re-reads them several times), unpersist
    # before returning — an unmanaged persist inside the helper would
    # pin a CacheManager entry for the whole session
    docs = spark.read.parquet(base).persist()
    try:
        total = docs.count()
        # partition_by: stores with a partition-directory layout (e.g.
        # the streaming CMS table's batch_id=N/ contract) keep it
        # through the sweep, so later partition-path writes compose
        writer = transform(docs).write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(staged)
        if finalize is not None:
            finalize(staged)
        # count the STAGED rows (the files that will become the corpus)
        # — deriving kept from a distinct-id drop count miscounts when
        # the landed dir carries duplicate doc_ids (same id, new text)
        kept_n = spark.read.parquet(staged).count()
    finally:
        docs.unpersist()

    if listing() != snapshot:
        shutil.rmtree(staged, ignore_errors=True)
        raise RuntimeError(
            f"compact_corpus: {base} changed during the sweep; "
            "aborted without touching the corpus — re-run quiesced"
        )
    shutil.move(base, backup)
    # last-line defense for the race between the re-list above and the
    # rename: if anything landed in that window it traveled into the
    # backup — detect it there and restore rather than delete it
    moved = sorted(
        (
            os.path.relpath(os.path.join(r, f), backup),
            os.stat(os.path.join(r, f)).st_size,
            os.stat(os.path.join(r, f)).st_mtime_ns,
        )
        for r, _, fs in os.walk(backup)
        for f in fs
    )
    if moved != snapshot:
        shutil.move(backup, base)
        shutil.rmtree(staged, ignore_errors=True)
        raise RuntimeError(
            f"compact_corpus: {base} changed at the swap boundary; "
            "restored untouched — re-run quiesced"
        )
    shutil.move(staged, base)
    shutil.rmtree(backup)
    return kept_n, total - kept_n


def compact_near_dups(
    spark: SparkSession,
    landed_dir: str,
    jaccard_threshold: float = 0.8,
    shingle_n: int = 3,
    bands: int = 4,
    rows_per_band: int = 2,
) -> tuple[int, int]:
    """Near-duplicate DOC compaction over the landed corpus: the drop
    rule is the batch pipeline's exactly
    (:func:`~..extensions.curate.near_dup_drop_ids` — higher doc_id of
    every Jaccard-verified pair), so a corpus curated by the stream +
    this sweep converges to what the batch pipeline would have produced.
    Runs inside :func:`compact_corpus`'s guarded staged swap.

    Returns (kept_rows, dropped_rows).
    """
    from ..extensions.curate import near_dup_drop_ids

    def transform(docs: DataFrame) -> DataFrame:
        drops = near_dup_drop_ids(
            docs,
            bands=bands,
            rows_per_band=rows_per_band,
            shingle_n=shingle_n,
            jaccard_threshold=jaccard_threshold,
        )
        return docs.join(drops, "doc_id", "left_anti")

    return compact_corpus(spark, landed_dir, transform)


def compact_boilerplate(
    spark: SparkSession,
    landed_dir: str,
    min_df: int = 3,
    span_n: int | None = None,
    text: str = "text",
    doc_id: str = "doc_id",
) -> tuple[int, int]:
    """Sub-document compaction over the landed corpus: rewrite every
    document through :func:`~..extensions.text.line_dedup` (cross-doc
    boilerplate lines, df ≥ ``min_df``) and — when ``span_n`` is set —
    :func:`~..extensions.text.span_dedup` (ExactSubstr verbatim spans at
    ``span_n``-gram granularity) on top.  Both are corpus-wide shapes
    (the df count and the first-occurrence pick need the whole corpus),
    which is exactly why they live in the scheduled sweep rather than
    the stream — the same lambda split as the near-dup sweep, through
    the same :func:`compact_corpus` guard machinery.

    The rewrite PRESERVES the landed schema: only ``text`` is replaced;
    when the stream's ``n_words`` / ``fingerprint`` columns are present
    they are RECOMPUTED from the cleaned text (a stale fingerprint would
    break the stream's future cross-batch dedup against this corpus).

    Returns (rows, 0) — rewrites keep every row.

    PRECONDITION: doc_ids must be unique.  The near-dup sweep tolerates
    the landed dir carrying duplicate doc_ids (same id, re-landed text)
    because its drop rule is id-keyed; a sub-document REWRITE cannot —
    line/span dedup group by doc_id, so two versions of one id would
    merge into a single interleaved clean_text fanned back onto both
    rows.  The transform fails loudly instead of corrupting: run the
    near-dup sweep (or any id-level dedup) first.
    """
    def transform(docs: DataFrame) -> DataFrame:
        n_rows, n_ids = docs.select(
            F.count(F.lit(1)), F.countDistinct(F.col(doc_id))
        ).first()
        if n_rows != n_ids:
            raise ValueError(
                f"compact_boilerplate: landed corpus carries {n_rows - n_ids}"
                " duplicate doc_id row(s); a sub-document rewrite would"
                " merge versions — dedup ids first (compact_near_dups or"
                " an exact id-level sweep), then re-run"
            )
        cleaned = tx.line_dedup(
            docs, min_df=min_df, text=text, doc_id=doc_id
        ).select(doc_id, "clean_text")
        out = (
            docs.join(cleaned, doc_id)
            .withColumn(text, F.col("clean_text"))
            .drop("clean_text")
        )
        if span_n is not None:
            spanned = tx.span_dedup(
                out, n=span_n, text=text, doc_id=doc_id
            ).select(doc_id, F.col("clean_text").alias("__sp"))
            out = (
                out.join(spanned, doc_id)
                .withColumn(text, F.col("__sp"))
                .drop("__sp")
            )
        if "n_words" in out.columns:
            # the stream's n_words comes from gopher_rules; recompute
            # with the SAME shared formula so stream-produced and
            # compaction-recomputed values agree on identical text
            out = out.withColumn("n_words", tx.n_words_expr(F.col(text)))
        if "fingerprint" in out.columns:
            out = out.drop("fingerprint")
            keep = [c for c in out.columns]
            out = tx.fingerprint(
                out, text=text, doc_id=doc_id,
                passthrough=tuple(c for c in keep if c != doc_id),
            )
        return out

    return compact_corpus(spark, landed_dir, transform)
