"""Checkpoint/resume + per-partition lineage & metrics.

The north rule requires every stage to write per-partition lineage +
row-count metrics and for runs to resume from the last committed
checkpoint.  With an Iceberg catalog this is snapshot commits + an
anti-join on a metrics table; no Iceberg runtime jar ships in this
environment, so the same semantics are built on Parquet:

- a stage writes each *batch* of work to
  ``{base}/{stage}/batch={batch_id}/`` with Spark's committer — the
  directory is committed iff its ``_SUCCESS`` marker exists, so a
  killed run leaves at most an uncommitted (ignored) directory;
- after the data commit, the batch's metrics are written with
  mode('overwrite') to ``{base}/_metrics/{stage}/batch={batch_id}``
  recording (run_id, stage, batch, src_partition, row_count, min/max
  key) — the per-partition lineage; a REPLAYED batch replaces its own
  lineage rows, so restarts can never double-count;
- resume = anti-join the input's key column against the union of
  committed batches' keys (``processed_keys``), so work is never
  repeated and retries are idempotent (keys are data-derived, never
  partition-index-derived).

The API is storage-agnostic: swap `_list_committed`/`write` for Iceberg
snapshot reads/commits on a cluster with a catalog.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

METRICS_SCHEMA = (
    "run_id string, stage string, batch_id string, src_partition int, "
    "row_count long, key_min string, key_max string, committed_at double"
)


class CheckpointedRun:
    def __init__(self, spark: SparkSession, base: str, run_id: str | None = None):
        self.spark = spark
        self.base = base.rstrip("/")
        self.run_id = run_id or uuid.uuid4().hex[:12]

    # -- commit side --------------------------------------------------------

    def commit_batch(
        self, df: DataFrame, stage: str, key_col: str, batch_id: str
    ) -> None:
        """Atomically commit one batch of a stage + its lineage metrics.

        The data write carries the executor partition id so lineage is
        per *physical* partition of the producing stage.
        """
        out = df.withColumn("src_partition", F.spark_partition_id())
        path = f"{self.base}/{stage}/batch={batch_id}"
        out.write.mode("overwrite").parquet(path)  # _SUCCESS marks the commit
        metrics = (
            self.spark.read.parquet(path)
            .groupBy("src_partition")
            .agg(
                F.count("*").alias("row_count"),
                F.min(key_col).cast("string").alias("key_min"),
                F.max(key_col).cast("string").alias("key_max"),
            )
            .select(
                F.lit(self.run_id).alias("run_id"),
                F.lit(stage).alias("stage"),
                F.lit(batch_id).alias("batch_id"),
                "src_partition",
                "row_count",
                "key_min",
                "key_max",
                F.lit(time.time()).alias("committed_at"),
            )
        )
        # per-batch overwrite, not append: a REPLAYED batch (the restart
        # path this class exists for) replaces its own lineage rows
        # instead of appending duplicates that double-count row_count
        metrics.write.mode("overwrite").parquet(
            f"{self.base}/_metrics/{stage}/batch={batch_id}"
        )

    # -- resume side --------------------------------------------------------

    def _committed_batches(self, stage: str) -> list[str]:
        root = f"{self.base}/{stage}"
        if not os.path.isdir(root):
            return []
        out = []
        for d in sorted(os.listdir(root)):
            full = os.path.join(root, d)
            if d.startswith("batch=") and os.path.exists(os.path.join(full, "_SUCCESS")):
                out.append(full)
        return out

    def committed(self, stage: str) -> DataFrame | None:
        """All committed rows of a stage (uncommitted dirs ignored)."""
        paths = self._committed_batches(stage)
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def processed_keys(self, stage: str, key_col: str) -> DataFrame | None:
        df = self.committed(stage)
        return None if df is None else df.select(key_col).distinct()

    def resume_filter(self, inputs: DataFrame, stage: str, key_col: str) -> DataFrame:
        """Drop input rows whose key already lies in a committed batch."""
        done = self.processed_keys(stage, key_col)
        if done is None:
            return inputs
        return inputs.join(done, key_col, "left_anti")

    def metrics(self, stage: str | None = None) -> DataFrame | None:
        root = f"{self.base}/_metrics"
        paths = (
            [f"{root}/{stage}"]
            if stage
            else [os.path.join(root, d) for d in (os.listdir(root) if os.path.isdir(root) else [])]
        )
        paths = [p for p in paths if os.path.isdir(p)]
        if not paths:
            return None
        cols = [f.split()[0] for f in METRICS_SCHEMA.split(", ")]
        # drop the batch=... partition-discovery column; batch_id is a field
        return self.spark.read.parquet(*paths).select(*cols)


def run_stage_in_batches(
    ckpt: CheckpointedRun,
    inputs: DataFrame,
    stage: str,
    key_col: str,
    transform,
    n_batches: int = 4,
    fail_after: int | None = None,
) -> None:
    """Drive a stage as N resumable batches (deterministic bucketing by
    key hash, never by partition index). `fail_after` injects a crash
    after that many batch commits — used by the resume tests."""
    committed = {p.rsplit("batch=", 1)[-1] for p in ckpt._committed_batches(stage)}
    todo = ckpt.resume_filter(inputs, stage, key_col)
    bucket = F.pmod(F.xxhash64(key_col), F.lit(n_batches)).cast("int")
    work = todo.withColumn("_bucket", bucket)
    done = 0
    for b in range(n_batches):
        batch_id = f"b{b:04d}"
        # a committed batch id is FINAL (buckets are deterministic key
        # hashes): skip without recomputing — also required for safety,
        # since overwriting it would delete files the resume anti-join
        # plan still reads lazily
        if batch_id in committed:
            continue
        batch = work.filter(F.col("_bucket") == b).drop("_bucket")
        # write directly — no emptiness pre-count: the transform runs
        # ONCE per batch (an empty committed batch is harmless: it adds
        # no keys and no metrics groups)
        ckpt.commit_batch(transform(batch), stage, key_col, batch_id=batch_id)
        done += 1
        if fail_after is not None and done >= fail_after:
            raise RuntimeError(f"injected failure after {done} batches")
