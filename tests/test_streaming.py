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
