"""Stateful streaming deduplication (applyInPandasWithState).

A continuously-ingesting training-data pipeline must drop documents it
has already accepted — across micro-batches and across restarts.  This
operator keys the stream by content fingerprint and keeps ONE small
state cell per distinct fingerprint (first-seen doc_id + occurrence
count); only the first occurrence is emitted downstream.  State lives
in the stream's checkpoint, so a restarted stream continues
deduplicating against everything it has ever accepted.

State size: one (fingerprint, doc_id, count) row per DISTINCT document
— the same cardinality an exact_dedup groupBy would shuffle, but
maintained incrementally instead of recomputed per batch.  Exact
forever-dedup keeps state unbounded by design; ``ttl_seconds`` bounds
retention instead: a fingerprint idle for longer than the TTL is
dropped from state (its next occurrence re-emits) — the right trade
when the dedup window is "recent history", e.g. a rolling crawl.  At
larger state than executors can hold, swap the fingerprint key space
for a partitioned RocksDB state store
(spark.sql.streaming.stateStore.*) — the operator itself is unchanged.
"""

from __future__ import annotations

from typing import Any, Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
import pyspark.sql.functions as F

from ukis_pysat_spark.operators.text import fingerprint

OUT_SCHEMA = "fp string, doc_id long, text string"
STATE_SCHEMA = "first_doc_id long, n_seen long"


def _make_first_seen_fn(ttl_ms: int | None) -> Callable:
    def _first_seen_fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Emit the first-ever row of this fingerprint; count the rest."""
        if ttl_ms is not None and state.hasTimedOut:
            # idle past the TTL: forget the fingerprint so its next
            # occurrence re-emits (bounded-retention dedup)
            state.remove()
            return iter([])
        (fp,) = key
        if state.exists:
            first_id, n_seen = state.get
            new = False
        else:
            first_id, n_seen = None, 0
            new = True
        out = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            if new:
                pdf = pdf.sort_values("doc_id")
                first = pdf.iloc[:1].copy()
                if "fp" not in first.columns:  # key column arrives in the pdf
                    first.insert(0, "fp", fp)
                out.append(first[["fp", "doc_id", "text"]])
                first_id = int(pdf["doc_id"].iloc[0])
                new = False
            n_seen += len(pdf)
        state.update((first_id, n_seen))
        if ttl_ms is not None:
            # processing-time timeout, re-armed on every occurrence:
            # retention is "idle for ttl", not "ttl after first seen"
            state.setTimeoutDuration(ttl_ms)
        return iter(out)

    return _first_seen_fn


def stream_first_seen(documents: DataFrame, ttl_seconds: float | None = None) -> DataFrame:
    """doc stream -> first occurrence per content fingerprint.

    Works on a streaming DataFrame with (doc_id, text); the returned
    stream emits each distinct normalized text exactly once — ever
    (default, durable state) or per ``ttl_seconds`` idle window
    (bounded-retention dedup: expired fingerprints re-emit).
    """
    keyed = documents.select(
        fingerprint(F.col("text")).alias("fp"), "doc_id", "text"
    ).groupBy("fp")
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_seconds is not None
        else GroupStateTimeout.NoTimeout
    )
    ttl_ms = int(ttl_seconds * 1000) if ttl_seconds is not None else None
    return keyed.applyInPandasWithState(
        _make_first_seen_fn(ttl_ms),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
