"""Structured Streaming tier (SURVEY.md §2.9): the reference's cron-polled
incremental batch semantics, re-founded on file streams + watermarks."""

from .ann import ivfadc_index_stream, read_ivfadc_index, tombstone_stream
from .documents import (
    compact_boilerplate,
    compact_corpus,
    compact_near_dups,
    curate_document_stream,
    land_document_stream,
    stream_documents_jsonl,
)
from .ingest import (
    hourly_stream_rollup,
    session_stream_rollup,
    stream_conformed_csv,
    stream_dedup,
    stream_upsert_into_store,
)
from .sketches import (
    cms_table_stream,
    compact_cms_table,
    compact_hll_registers,
    hll_register_stream,
    read_cms_table,
    read_hll_estimate,
)
from .stateful import rising_falling_stream

__all__ = [
    "cms_table_stream",
    "compact_boilerplate",
    "compact_cms_table",
    "compact_corpus",
    "compact_hll_registers",
    "read_cms_table",
    "compact_near_dups",
    "curate_document_stream",
    "hll_register_stream",
    "hourly_stream_rollup",
    "ivfadc_index_stream",
    "tombstone_stream",
    "read_hll_estimate",
    "read_ivfadc_index",
    "land_document_stream",
    "rising_falling_stream",
    "session_stream_rollup",
    "stream_conformed_csv",
    "stream_dedup",
    "stream_documents_jsonl",
    "stream_upsert_into_store",
]
