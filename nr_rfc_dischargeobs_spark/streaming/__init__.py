"""Structured Streaming tier (SURVEY.md §2.9): the reference's cron-polled
incremental batch semantics, re-founded on file streams + watermarks."""

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
from .stateful import rising_falling_stream

__all__ = [
    "compact_boilerplate",
    "compact_corpus",
    "compact_near_dups",
    "curate_document_stream",
    "hourly_stream_rollup",
    "land_document_stream",
    "rising_falling_stream",
    "session_stream_rollup",
    "stream_conformed_csv",
    "stream_dedup",
    "stream_documents_jsonl",
    "stream_upsert_into_store",
]
