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

On a cluster with an Iceberg catalog, pass ``catalog=`` to switch the
SAME semantics onto snapshot commits: each batch lands as one
``writeTo(...).overwritePartitions()`` into a table partitioned by
``batch_id`` (a replayed batch replaces its own partition — one atomic
Iceberg snapshot), metrics ride a second table partitioned by
``(stage, batch_id)``, and the committed set is simply the table
contents (snapshot isolation: readers never see an in-flight batch).
No Iceberg runtime jar ships in this environment, so the catalog path
is exercised only where one is configured (the test skips cleanly);
the Parquet ``_SUCCESS`` protocol stays the default.
"""

from __future__ import annotations

import hashlib
import os
import re
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F


def iceberg_catalog_available(spark: SparkSession, catalog: str) -> bool:
    """True iff `catalog` resolves (Iceberg runtime jar + catalog conf
    present) — callers/tests use this to pick the storage mode."""
    try:
        spark.sql(f"SHOW NAMESPACES IN {catalog}")
        return True
    except Exception:  # noqa: BLE001 — any resolution failure means "absent"
        return False

METRICS_SCHEMA = (
    "run_id string, stage string, batch_id string, src_partition int, "
    "row_count long, key_min string, key_max string, committed_at double"
)


class CheckpointedRun:
    def __init__(
        self,
        spark: SparkSession,
        base: str,
        run_id: str | None = None,
        catalog: str | None = None,
    ):
        self.spark = spark
        self.base = base.rstrip("/")
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self.catalog = catalog
        if catalog is not None:
            if not iceberg_catalog_available(spark, catalog):
                raise ValueError(
                    f"catalog {catalog!r} is not resolvable; omit catalog= "
                    "for the Parquet fallback"
                )
            # sanitized name + short hash of the RAW string: distinct
            # bases that sanitize identically (/data/run-1 vs
            # /data/run_1) must not share a namespace/table
            ns = re.sub(r"[^A-Za-z0-9_]+", "_", self.base).strip("_") or "ckpt"
            tag = hashlib.md5(self.base.encode()).hexdigest()[:8]
            self._ns = f"{catalog}.{ns}_{tag}"
            spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self._ns}")

    def _tbl(self, stage: str) -> str:
        safe = re.sub(r"[^A-Za-z0-9_]+", "_", stage)
        return f"{self._ns}.{safe}_{hashlib.md5(stage.encode()).hexdigest()[:8]}"

    # -- commit side --------------------------------------------------------

    def commit_batch(
        self, df: DataFrame, stage: str, key_col: str, batch_id: str
    ) -> None:
        """Atomically commit one batch of a stage + its lineage metrics.

        The data write carries the executor partition id so lineage is
        per *physical* partition of the producing stage.
        """
        out = df.withColumn("src_partition", F.spark_partition_id())
        if self.catalog is not None:
            self._commit_batch_iceberg(out, stage, key_col, batch_id)
            return
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

    def _commit_batch_iceberg(
        self, out: DataFrame, stage: str, key_col: str, batch_id: str
    ) -> None:
        """One atomic snapshot per batch: overwritePartitions on the
        batch_id partition, so a replayed batch replaces itself."""
        tbl = self._tbl(stage)
        data = out.withColumn("batch_id", F.lit(batch_id))
        if self.spark.catalog.tableExists(tbl):
            data.writeTo(tbl).overwritePartitions()
        else:
            data.writeTo(tbl).using("iceberg").partitionedBy("batch_id").create()
        committed = self.spark.read.table(tbl).where(F.col("batch_id") == batch_id)
        metrics = (
            committed.groupBy("src_partition")
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
        mtbl = f"{self._ns}.metrics"
        if self.spark.catalog.tableExists(mtbl):
            metrics.writeTo(mtbl).overwritePartitions()
        else:
            metrics.writeTo(mtbl).using("iceberg").partitionedBy(
                "stage", "batch_id"
            ).create()

    # -- resume side --------------------------------------------------------

    def _committed_batches(self, stage: str) -> list[str]:
        if self.catalog is not None:
            tbl = self._tbl(stage)
            if not self.spark.catalog.tableExists(tbl):
                return []
            return [
                f"batch={r.batch_id}"
                for r in self.spark.read.table(tbl)
                .select("batch_id").distinct().collect()
            ]
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
        """All committed rows of a stage (uncommitted dirs ignored; in
        catalog mode snapshot isolation makes every table row
        committed by construction)."""
        if self.catalog is not None:
            tbl = self._tbl(stage)
            if not self.spark.catalog.tableExists(tbl):
                return None
            return self.spark.read.table(tbl).drop("batch_id")
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
        cols = [f.split()[0] for f in METRICS_SCHEMA.split(", ")]
        if self.catalog is not None:
            mtbl = f"{self._ns}.metrics"
            if not self.spark.catalog.tableExists(mtbl):
                return None
            m = self.spark.read.table(mtbl)
            if stage:
                m = m.where(F.col("stage") == stage)
            return m.select(*cols)
        root = f"{self.base}/_metrics"
        paths = (
            [f"{root}/{stage}"]
            if stage
            else [os.path.join(root, d) for d in (os.listdir(root) if os.path.isdir(root) else [])]
        )
        paths = [p for p in paths if os.path.isdir(p)]
        if not paths:
            return None
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
