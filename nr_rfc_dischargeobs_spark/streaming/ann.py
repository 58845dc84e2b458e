"""Streaming ANN index maintenance: encode arriving embeddings into a
persistent IVFADC store, micro-batch by micro-batch.

The whole encode pipeline — coarse assignment (literal-folded argmin),
residual subtraction, PQ coding, stored reconstruction norm — is
scan-local narrow expressions (``ivf_pq_index(assign="local",
residual=True)``), so it streams without any stateful operator: each
micro-batch is one map-only pass.  The codebooks ride as plain Python
data (model parameters, exactly the batch posture).

Sink idempotence is STRUCTURAL, the :func:`..streaming.cms_table_stream`
strategy: appending code rows is not replay-idempotent (a retried batch
would duplicate its vectors), so every batch writes its own
``batch_id=N/`` partition path with ``partitionBy(list_id)`` below it —
a replay under the same checkpoint overwrites that path with identical
rows.  The same contract boundary applies: the checkpoint is part of
the store's identity; a redeploy that discards it re-numbers batches
and must pair with a fresh index_dir.  Searches read the whole tree
(:func:`read_ivfadc_index`) and still prune on ``list_id`` — partition
pruning applies to any partition column, at any depth.

Reference scope note: the reference system (bcgov/nr-rfc-dischargeobs)
has no ANN tier; this extends the §2.10 extension surface's IVFADC
stack (extensions/similarity.py) to the streaming tier the same way
streaming/sketches.py extends the sketch stack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..extensions import similarity


def ivfadc_index_stream(
    stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    coarse_rows: list[tuple[int, list[int]]],
    centroid_rows: list[tuple[int, list[int]]],
    m: int = 4,
    dim: int = 64,
    available_now: bool = True,
):
    """Maintain a persistent IVFADC index over a streaming frame of
    ``(vec_id, embedding)`` rows.  Each micro-batch encodes scan-locally
    (zero exchanges — the ``assign="local"`` build) and lands under
    ``batch_id=N/list_id=K/``; replays overwrite their own batch path
    (structural idempotence, see module docstring).

    Duplicate ``vec_id``s ACROSS batches are the caller's ingest
    contract, exactly like the observation store's: the stream encodes
    what arrives.  For an at-most-once vec_id admission, anti-join the
    landing frame against :func:`read_ivfadc_index` upstream (the
    ``land_document_stream`` strategy) — not built in here because the
    scan grows with the store and most embedding pipelines already
    assign unique ids.

    Returns the started ``StreamingQuery``."""

    def _encode(batch_df: DataFrame, batch_id: int) -> None:
        prep = similarity.prepare(batch_df)
        (
            similarity.ivf_pq_index(
                prep, None, centroid_rows, m=m, dim=dim,
                assign="local", residual=True, coarse_rows=coarse_rows,
            )
            .write.partitionBy("list_id")
            .mode("overwrite")
            .parquet(f"{index_dir.rstrip('/')}/batch_id={batch_id}")
        )

    writer = stream.writeStream.foreachBatch(_encode).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_ivfadc_index(spark: SparkSession, index_dir: str) -> DataFrame:
    """The current streamed index, ready for
    :func:`~..extensions.similarity.ivfadc_topk` (which selects only the
    columns it needs — the ``batch_id`` partition column rides along
    harmlessly).  ``list_id`` predicates prune partitions at any depth
    of the ``batch_id=N/list_id=K/`` layout."""
    return spark.read.parquet(index_dir)
