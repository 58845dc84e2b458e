"""Streaming sketch maintenance: corpus-lifetime statistics kept
incrementally, micro-batch by micro-batch, in bounded state.

The batch sketches (`extensions.sketches`) answer "how many distinct
keys / how often does this key occur" over a corpus that already sits
in parquet.  A live ingest pipeline wants the same answers WITHOUT
rescanning history — and HLL's algebra is exactly the right shape for a
streaming sink:

- each micro-batch folds to at most m = 2^p register rows per facet
  group BEFORE anything is written (the same map-side-combined
  aggregation as the batch operator);
- the sink APPENDS those rows — no read-modify-write, no swap
  machinery, no state store — because register folding is a ``max``:
  reading the store folds duplicates away, so append order, batch
  boundaries, and even foreachBatch's at-least-once REPLAYS are all
  absorbed by the algebra (max is idempotent).  A replayed batch
  appends identical rows that change nothing.  Contrast the landing
  sink (`documents.land_document_stream`), which needs an anti-join to
  make replays idempotent — here idempotence is free;
- store growth is ≤ m rows per facet per batch (kilobytes), and the
  scheduled :func:`compact_hll_registers` sweep folds the directory
  back to ≤ m rows per facet through the same crash-recoverable
  staged-swap engine the corpus sweeps use (`documents.compact_corpus`).

Estimates read with :func:`~..extensions.sketches.hll_estimate_from_registers`
are BIT-IDENTICAL to running the batch sketch over everything the
stream ever saw — pinned in tests — because both paths share one
register recipe and one integer harmonic-sum fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extensions import sketches


def hll_register_stream(
    stream: DataFrame,
    registers_dir: str,
    checkpoint_dir: str,
    key: str,
    facets: tuple[str, ...] = (),
    p: int = 8,
    salt: str = "hll",
    available_now: bool = True,
):
    """Maintain a persistent HLL register store over a streaming frame:
    every micro-batch folds to ≤ 2^p rows per facet group and appends to
    ``registers_dir``.  Returns the started ``StreamingQuery``
    (``availableNow`` for the drain-then-exit cron model)."""

    def _fold(batch_df: DataFrame, _batch_id: int) -> None:
        sketches.hll_registers(
            batch_df, key, facets=facets, p=p, salt=salt
        ).write.mode("append").parquet(registers_dir)

    writer = stream.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_hll_estimate(
    spark: SparkSession,
    registers_dir: str,
    facets: tuple[str, ...] = (),
    p: int = 8,
) -> DataFrame:
    """Current distinct-count estimate per facet from the register
    store — folds however many per-batch rows have accumulated (the
    max-merge union), same arithmetic as the batch sketch."""
    return sketches.hll_estimate_from_registers(
        spark.read.parquet(registers_dir), p=p, facets=facets
    )


def cms_table_stream(
    stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    key: str,
    d: int = 4,
    w: int = 1024,
    salt: str = "cms",
    available_now: bool = True,
):
    """Maintain a persistent Count-Min table over a streaming frame:
    every micro-batch folds to ≤ d×w counter rows and lands in the
    store.  The CMS union is a SUM — and unlike HLL's max, sum is NOT
    idempotent, so a replayed batch appended naively would double-count.
    The sink therefore writes each batch's fold to its own
    ``batch_id=N/`` partition path, overwriting exactly that path: a
    replayed batch rewrites its own partition with the same rows,
    restoring idempotence STRUCTURALLY where the algebra doesn't
    provide it (the dynamic-partition-overwrite idea, scoped to one
    partition with no session-conf surface).

    Contract boundary — stated because sum, unlike max, cannot absorb
    history: structural idempotence covers foreachBatch's at-least-once
    retries and restarts UNDER THE SAME CHECKPOINT (same batch_id →
    same partition).  The checkpoint is part of the store's identity;
    a redeploy that discards it re-numbers batches from 0 and would
    double-count against compacted history — pair a fresh checkpoint
    with a fresh table_dir.  Contrast :func:`hll_register_stream`
    (max-algebra absorbs everything) and
    :func:`.documents.land_document_stream` (the anti-join absorbs
    everything); the three sinks are the three idempotence strategies.

    Estimates fold the whole store by sum (:func:`read_cms_table`); a
    quiesced :func:`compact_cms_table` sweep collapses the per-batch
    partitions into ``batch_id=-1`` (live batch ids only grow, so the
    sentinel never collides under the same checkpoint).

    Returns the started ``StreamingQuery``."""

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        (
            sketches.cms_table(batch_df, key, d=d, w=w, salt=salt)
            .write.mode("overwrite")
            .parquet(f"{table_dir.rstrip('/')}/batch_id={batch_id}")
        )

    writer = stream.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_cms_table(spark: SparkSession, table_dir: str) -> DataFrame:
    """The current folded CMS table from the store — sums the per-batch
    partitions into one (depth, bucket, cnt) table, ready for
    :func:`~..extensions.sketches.cms_estimate`."""
    return (
        spark.read.parquet(table_dir)
        .groupBy("depth", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def _last_committed_batch(spark: SparkSession, checkpoint_dir: str) -> int:
    """Highest batch id with a completed commit in a Structured
    Streaming checkpoint (``<ckpt>/commits/<batchId>`` files — the
    engine's own completion markers), or -1 if none committed yet.

    Resolved through the session's Hadoop FileSystem, NOT driver-local
    ``os.listdir``: a checkpoint on an object store (``s3a://…``) or a
    scheme-prefixed local path (``file:/…``) is invisible to os.path —
    the local spelling returned -1 there, silently treating EVERY landed
    partition as an uncommitted orphan and disabling the fold the caller
    explicitly opted into.  An unsupported scheme (missing connector)
    raises from ``getFileSystem`` — loud, never a silent no-op.

    A missing ``commits/`` under an EXISTING checkpoint is the normal
    fresh-checkpoint state (stream started, nothing committed) → -1.
    A checkpoint_dir that doesn't exist at all is a caller error (a
    typo'd path would otherwise also fold nothing, fail-safe but
    silent) → raises."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(checkpoint_dir)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(root):
        raise ValueError(
            f"checkpoint_dir {checkpoint_dir!r} does not exist on its"
            " filesystem — checkpoint-aware compaction would silently"
            " fold nothing; pass the stream's real checkpointLocation"
            " or None to fold everything after a clean drain"
        )
    commits = jvm.org.apache.hadoop.fs.Path(
        checkpoint_dir.rstrip("/") + "/commits"
    )
    if not fs.exists(commits):
        return -1
    ids = [
        int(name)
        for st in fs.listStatus(commits)
        if (name := st.getPath().getName()).isdigit()
    ]
    return max(ids, default=-1)


def compact_cms_table(
    spark: SparkSession,
    table_dir: str,
    checkpoint_dir: str | None = None,
) -> tuple[int, int]:
    """Collapse the per-batch partitions to one folded table (landed
    under ``batch_id=-1`` so the partition-directory layout — and the
    stream's overwrite-own-partition contract — survives compaction).
    Quiesced, snapshot-guarded, crash-recoverable via the shared sweep
    engine.

    ``checkpoint_dir`` closes the crash-then-compact-then-restart hole:
    a batch whose partition landed but whose checkpoint commit did NOT
    (foreachBatch crashed between the write and the commit) will be
    REPLAYED to the same ``batch_id=N`` path on restart — harmless
    while the orphan partition still exists (overwrite-own-partition),
    but if compaction folded it into ``batch_id=-1`` first, the replay
    re-appends the same counts and the store double-counts.  Passing
    the stream's checkpoint makes the sweep fold ONLY partitions at or
    below the last committed batch id (plus the -1 sentinel) and carry
    uncommitted-orphan partitions through untouched, so the replay
    still lands on its own path.  Without a checkpoint the sweep folds
    everything — only safe after a clean ``availableNow`` drain
    (query terminated without error), which is the documented cron
    contract.

    Precondition when ``checkpoint_dir`` is passed: the STREAM MUST HAVE
    STARTED at least once — Spark creates the checkpoint directory at
    stream start, and a missing directory raises (deliberately: a typo'd
    path would otherwise silently fold nothing).  A compaction cron wired
    BEFORE the stream's first trigger should either start after the
    stream or catch the ``ValueError`` and skip the cycle; there is
    nothing to compact before the first batch anyway."""
    from .documents import compact_corpus

    last = (
        _last_committed_batch(spark, checkpoint_dir)
        if checkpoint_dir is not None
        else None
    )

    def _fold(rows: DataFrame) -> DataFrame:
        foldable, orphans = rows, None
        if last is not None:
            foldable = rows.filter(F.col("batch_id") <= last)
            orphans = rows.filter(F.col("batch_id") > last)
        folded = (
            foldable.groupBy("depth", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
            .withColumn("batch_id", F.lit(-1))
        )
        if orphans is not None:
            folded = folded.unionByName(
                orphans.select("depth", "bucket", "cnt", "batch_id")
            )
        return folded

    return compact_corpus(
        spark, table_dir, _fold, partition_by=("batch_id",)
    )


def compact_hll_registers(
    spark: SparkSession,
    registers_dir: str,
    facets: tuple[str, ...] = (),
) -> tuple[int, int]:
    """Fold the append-only register store back to ≤ 2^p rows per facet
    group — run quiesced on the compaction schedule, through the shared
    snapshot-guarded crash-recoverable sweep engine.  Returns
    (kept_rows, folded_away_rows); estimates are unchanged by
    construction (the sweep applies the same max-merge reads already
    apply)."""
    from .documents import compact_corpus

    def _fold(regs: DataFrame) -> DataFrame:
        return regs.groupBy(*facets, "register").agg(
            F.max("max_rho").alias("max_rho")
        )

    return compact_corpus(spark, registers_dir, _fold)
