"""Shared error-classification helpers.

One place decides what "the store isn't there yet" looks like, because two
call sites (`sources.store.ObservationStore.exists`,
`streaming.documents.land_document_stream`) make a fail-safe decision on
it: misreading a transient error as "fresh store" would send an upsert
down the overwrite path, and misreading not-found as an error would make
every first run raise.
"""

from __future__ import annotations

# The two expected "nothing there yet" conditions a parquet read raises:
# a root that does not exist, and a root that exists but holds no footers
# to infer a schema from.  Matched by the exception's structured error
# condition, not message text — error MESSAGES are not a compatibility
# surface across Spark versions, the condition names are (they are the
# documented error-class registry keys).
_MISSING_PATH_CONDITIONS = frozenset(
    {"PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"}
)


def is_missing_path(ex: BaseException) -> bool:
    """True iff ``ex`` is Spark's "path absent / no data to infer" read
    failure.  Anything else — throttling, credentials, corruption — is
    NOT a fresh store and must be re-raised by the caller.

    PySpark 4 exposes the structured condition via
    ``PySparkException.getCondition()`` (``getErrorClass()`` before 4.0,
    kept as a deprecated alias).  Exceptions carrying NEITHER accessor —
    a raw Py4JJavaError that escaped PySpark's conversion layer, or an
    older wrapper — fall back to matching the same structured condition
    TOKENS in ``str(ex)``: Spark embeds the error-class key in the
    message (``[PATH_NOT_FOUND] Path does not exist…``), so the token
    match keeps first-run behavior across exception wrappers without
    re-introducing free-text message matching (the token is the
    registry key, not prose).  An exception with an accessor that
    reports a DIFFERENT condition never falls through to the text match
    — throttling, credentials, corruption stay loud.
    """
    getter = getattr(ex, "getCondition", None) or getattr(
        ex, "getErrorClass", None
    )
    if getter is None:
        text = str(ex)
        return any(c in text for c in _MISSING_PATH_CONDITIONS)
    try:
        condition = getter()
    except Exception:  # noqa: BLE001 — classification must never raise
        return False
    return condition in _MISSING_PATH_CONDITIONS
