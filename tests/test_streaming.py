"""Structured Streaming ingest: incremental file stream -> tiling ->
checkpointed sink; restart resumes without duplicates."""

import pyspark.sql.functions as F

from ukis_pysat_spark import datagen
from ukis_pysat_spark.plans.checkpoint import CheckpointedRun
from ukis_pysat_spark.streaming import ingest


def test_stream_tiles_to_checkpointed_sink(spark, tmp_path):
    src = str(tmp_path / "images_stream")
    datagen.gen_images(spark, 24, profile="bench").write.mode("overwrite").parquet(src)

    stream = ingest.stream_images(spark, src, max_files_per_trigger=4)
    assert stream.isStreaming
    counts = ingest.stream_tile_counts(stream, 64, 64, 0)

    ckpt = CheckpointedRun(spark, str(tmp_path / "sink"), run_id="s1")
    q = ingest.run_stream_to_checkpointed_sink(
        counts, ckpt, "tile_counts", "image_id", str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    out = ckpt.committed("tile_counts")
    # streaming aggregation emits per-microbatch partial counts for the
    # images in that batch; every image appears exactly once overall
    assert out.select("image_id").distinct().count() == 24
    total = out.agg(F.sum("n_tiles")).collect()[0][0]
    assert total == 24 * 4  # 128x128 @ 64 -> 4 tiles per image

    # restart with the same checkpoint: no new data -> no new commits
    n_before = out.count()
    q2 = ingest.run_stream_to_checkpointed_sink(
        ingest.stream_tile_counts(ingest.stream_images(spark, src), 64, 64, 0),
        ckpt, "tile_counts", "image_id", str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)
    assert ckpt.committed("tile_counts").count() == n_before


def test_stream_events_windowed_plan(spark):
    # the windowed aggregation composes on a batch frame too (same plan)
    ev = spark.createDataFrame(
        [("2024-01-01 00:01:00", "click", 1.0), ("2024-01-01 00:02:00", "click", 2.0)],
        ["ts_s", "event_type", "value"],
    ).select(F.to_timestamp("ts_s").alias("ts"), "event_type", "value")
    out = (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
    )
    rows = out.collect()
    assert sum(r.n for r in rows) == 4  # each event falls in 2 sliding windows


def test_stream_first_seen_dedup_across_restarts(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): each distinct
    normalized text is emitted exactly once — across micro-batches AND
    across a stream restart (state survives in the checkpoint)."""
    from ukis_pysat_spark.streaming import dedup as sdedup

    src = str(tmp_path / "docs_stream")
    ckpt_dir = str(tmp_path / "dedup_ckpt")
    out_dir = str(tmp_path / "dedup_out")

    spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon"), (3, "Alpha  beta   gamma")],
        ["doc_id", "text"],
    ).write.mode("overwrite").parquet(src)

    def run_once():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            sdedup.stream_first_seen(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = spark.read.parquet(out_dir)
    rows = {r.doc_id for r in first.collect()}
    # doc 3 normalizes to doc 1's text -> exactly 2 distinct fingerprints
    assert first.select("fp").distinct().count() == 2
    assert 2 in rows and (1 in rows or 3 in rows)

    # restart with MORE data: an old dup and one genuinely new doc
    spark.createDataFrame(
        [(10, "delta epsilon"), (11, "zeta eta theta")], ["doc_id", "text"]
    ).write.mode("append").parquet(src)
    run_once()
    after = spark.read.parquet(out_dir)
    # the replayed duplicate (10) was suppressed by the durable state
    assert after.count() == 3
    assert {r.doc_id for r in after.collect()} - rows == {11}
