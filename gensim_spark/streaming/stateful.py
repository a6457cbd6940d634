"""Custom stateful streaming operators (applyInPandasWithState).

The streaming analogue of the dedup stage a crawl-ingest pipeline runs before
indexing: keep only the FIRST occurrence of each content fingerprint across
the whole (unbounded) stream. State = one flag per fingerprint group,
partitioned by the fingerprint hash — Spark shards and checkpoints the state
store; the operator logic only sees one key's batch + its state handle.

Also a sessionization example over the events stream (gap-based windows) to
cover the stateful-aggregation surface.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT_SCHEMA = "doc_id long, text_hash string"
DEDUP_STATE_SCHEMA = "seen boolean"


def _first_seen(key, pdfs, state: GroupState):
    """Emit rows of this fingerprint group only while unseen; afterwards the
    state flag suppresses every later duplicate."""
    if state.exists:
        for _ in pdfs:
            pass
        return iter(())
    first = None
    for pdf in pdfs:
        if first is None and len(pdf):
            first = pdf.nsmallest(1, "doc_id")[["doc_id"]]
    state.update((True,))
    if first is None:
        return iter(())
    out = first.copy()
    out["text_hash"] = key[0]
    return iter([out[["doc_id", "text_hash"]]])


def streaming_first_seen(docs_stream: DataFrame,
                         text_col: str = "text") -> DataFrame:
    """docs readStream (doc_id, text, …) → stream of first-seen docs
    (doc_id, text_hash): an exact streaming dedup with per-key state."""
    hashed = docs_stream.select(
        "doc_id", F.md5(F.col(text_col).cast("string")).alias("text_hash")
    )
    return hashed.groupBy("text_hash").applyInPandasWithState(
        _first_seen,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _sessionize(key, pdfs, state: GroupState):
    """Gap-based sessions per user: merge events into the open session while
    gaps stay under the threshold; emit closed sessions."""
    gap_ms = 30 * 60 * 1000
    rows = []
    for pdf in pdfs:
        rows.extend(
            (int(ts.value // 10**6), float(v))
            for ts, v in zip(pdf["ts"], pdf["value"])
        )
    rows.sort()
    if not rows:
        return iter(())
    if state.exists:
        start, end, n, total = state.get
    else:
        start = end = None
        n, total = 0, 0.0
    out = []
    for ts, v in rows:
        if start is None:
            start = end = ts
            n, total = 1, v
        elif ts - end <= gap_ms:
            end = ts
            n += 1
            total += v
        else:
            out.append((key[0], start, end, n, total))
            start = end = ts
            n, total = 1, v
    state.update((start, end, n, total))
    if not out:
        return iter(())
    return iter([pd.DataFrame(
        out, columns=["user_id", "start_ms", "end_ms", "n_events", "total"]
    )])


SESSION_OUT_SCHEMA = ("user_id long, start_ms long, end_ms long,"
                      " n_events long, total double")
SESSION_STATE_SCHEMA = "start long, end long, n long, total double"


def streaming_sessions(events_stream: DataFrame) -> DataFrame:
    """events readStream (user_id, ts, value) → closed gap-sessions."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _sessionize,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
