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
maintained incrementally instead of recomputed per batch.  At larger
state than executors can hold, swap the fingerprint key space for a
partitioned RocksDB state store (spark.sql.streaming.stateStore.*) —
the operator itself is unchanged.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
import pyspark.sql.functions as F

from ukis_pysat_spark.operators.text import fingerprint

OUT_SCHEMA = "fp string, doc_id long, text string"
STATE_SCHEMA = "first_doc_id long, n_seen long"


def _first_seen_fn(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit the first-ever row of this fingerprint; count the rest."""
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
    return iter(out)


def stream_first_seen(documents: DataFrame) -> DataFrame:
    """doc stream -> first occurrence per content fingerprint.

    Works on a streaming DataFrame with (doc_id, text); the returned
    stream emits each distinct normalized text exactly once, ever
    (exact streaming dedup with durable state).
    """
    keyed = documents.select(
        fingerprint(F.col("text")).alias("fp"), "doc_id", "text"
    ).groupBy("fp")
    return keyed.applyInPandasWithState(
        _first_seen_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
