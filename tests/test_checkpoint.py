"""Checkpoint/resume: a killed run resumes from the last committed batch
with no duplicates and the same final result as a one-shot run
(SURVEY.md §5.2 item 4; north-rule resumability requirement)."""

import pytest
import pyspark.sql.functions as F

from ukis_pysat_spark import datagen
from ukis_pysat_spark.operators import tiling
from ukis_pysat_spark.plans.checkpoint import CheckpointedRun, run_stage_in_batches


def _transform(batch):
    return tiling.tile_windows(batch, 64, 64, 0)


def test_resume_after_injected_failure(spark, tmp_path):
    imgs = datagen.gen_images(spark, 40, profile="bench")
    ckpt = CheckpointedRun(spark, str(tmp_path / "run"), run_id="t1")

    with pytest.raises(RuntimeError, match="injected failure"):
        run_stage_in_batches(ckpt, imgs, "tiles", "image_id", _transform,
                             n_batches=4, fail_after=2)

    partial = ckpt.committed("tiles")
    n_partial = partial.count()
    assert 0 < n_partial

    # resume: completes remaining batches only
    run_stage_in_batches(ckpt, imgs, "tiles", "image_id", _transform, n_batches=4)
    final = ckpt.committed("tiles")

    oneshot = _transform(imgs)
    assert final.count() == oneshot.count()
    # no duplicates
    assert final.select("image_id", "tile_id").distinct().count() == oneshot.count()
    # rerunning again is a no-op (idempotent)
    run_stage_in_batches(ckpt, imgs, "tiles", "image_id", _transform, n_batches=4)
    assert ckpt.committed("tiles").count() == oneshot.count()


def test_metrics_lineage(spark, tmp_path):
    imgs = datagen.gen_images(spark, 20, profile="bench")
    ckpt = CheckpointedRun(spark, str(tmp_path / "run2"), run_id="t2")
    run_stage_in_batches(ckpt, imgs, "tiles", "image_id", _transform, n_batches=2)
    m = ckpt.metrics("tiles")
    rows = m.collect()
    assert all(r.run_id == "t2" and r.stage == "tiles" for r in rows)
    # per-partition row counts sum to the stage total
    assert sum(r.row_count for r in rows) == ckpt.committed("tiles").count()
    # lineage keys are real image ids
    assert all(r.key_min.startswith("img") for r in rows)


def test_metrics_replay_idempotent(spark, tmp_path):
    """A replayed batch (streaming-restart path) must REPLACE its
    lineage rows, not append duplicates that double-count row_count."""
    imgs = datagen.gen_images(spark, 12, profile="bench")
    ckpt = CheckpointedRun(spark, str(tmp_path / "run4"), run_id="t4")
    out = _transform(imgs)
    ckpt.commit_batch(out, "tiles", "image_id", batch_id="b0000")
    once = ckpt.metrics("tiles").collect()
    total_once = sum(r.row_count for r in once)
    ckpt.commit_batch(out, "tiles", "image_id", batch_id="b0000")  # replay
    twice = ckpt.metrics("tiles").collect()
    assert sum(r.row_count for r in twice) == total_once
    assert len(twice) == len(once)


def test_uncommitted_batch_ignored(spark, tmp_path):
    imgs = datagen.gen_images(spark, 10, profile="bench")
    base = tmp_path / "run3"
    ckpt = CheckpointedRun(spark, str(base), run_id="t3")
    run_stage_in_batches(ckpt, imgs, "tiles", "image_id", _transform, n_batches=1)
    n = ckpt.committed("tiles").count()
    # simulate a torn write: a batch dir without _SUCCESS
    torn = base / "tiles" / "batch=b9999"
    torn.mkdir(parents=True)
    (torn / "part-00000.parquet").write_bytes(b"garbage")
    assert ckpt.committed("tiles").count() == n


def test_checkpoint_resume_iceberg_mode(spark, tmp_path):
    """The SAME resume/idempotence flow through the Iceberg writeTo
    path (snapshot commits, overwritePartitions replay).  Skips cleanly
    when no Iceberg catalog is configured (no runtime jar ships in this
    environment); on a catalog-backed cluster it runs for real."""
    from ukis_pysat_spark.plans import checkpoint as cp

    if not cp.iceberg_catalog_available(spark, "ice"):
        with pytest.raises(ValueError, match="not resolvable"):
            CheckpointedRun(spark, "ice_run", run_id="t5", catalog="ice")
        pytest.skip("no Iceberg catalog 'ice' configured")

    imgs = datagen.gen_images(spark, 24, profile="bench")
    ckpt = CheckpointedRun(spark, f"ice_run_{tmp_path.name}", run_id="t5",
                           catalog="ice")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_stage_in_batches(ckpt, imgs, "tiles", "image_id", _transform,
                             n_batches=4, fail_after=2)
    assert 0 < ckpt.committed("tiles").count()
    run_stage_in_batches(ckpt, imgs, "tiles", "image_id", _transform, n_batches=4)
    oneshot = _transform(imgs)
    assert ckpt.committed("tiles").count() == oneshot.count()
    # replay a batch: overwritePartitions must keep metrics single-counted
    m = ckpt.metrics("tiles")
    total = sum(r.row_count for r in m.collect())
    assert total == oneshot.count()
