"""Physical-plan shape assertions — the 100 TB contract.

These tests pin the properties that make the operators scale: column
pruning reaching the parquet scan, broadcast joins for small sides,
and zero Python evaluation in relational stages.  They read plans, not
rows, so they are cheap and catch silent plan regressions.
"""

import pyspark.sql.functions as F
import pytest

from ukis_pysat_spark import datagen
from ukis_pysat_spark.operators import dedup, spatial_join, tiling, transforms
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def images_parquet(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plans") / "images")
    datagen.gen_images(spark, 24, profile="bench").write.mode("overwrite").parquet(p)
    return p


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_tile_windows_prunes_bytes(spark, images_parquet):
    """Window-geometry queries must never read the payload column: the
    parquet ReadSchema must exclude `bytes` entirely."""
    images = spark.read.parquet(images_parquet)
    plan = _plan(tiling.tile_windows(images, 32, 32, 4))
    scan_lines = [ln for ln in plan.splitlines() if "FileScan" in ln or "ReadSchema" in ln]
    assert scan_lines, plan
    assert all("bytes" not in ln for ln in scan_lines), scan_lines
    # pure JVM: no Python eval anywhere
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas", "MapInArrow"):
        assert marker not in plan, marker


def test_spatial_join_filter_stage_is_jvm(spark, images_parquet):
    """The candidate-generation (cell cover + equi-join + dedup) stage
    must contain no Python nodes; the ONLY Python in the whole join is
    the final exact-refine — a mapInArrow stage since round 5 (raw
    RecordBatch accumulation, no pandas block assembly)."""
    images = spark.read.parquet(images_parquet)
    aois = datagen.gen_aois(spark, 10)
    plan = _plan(spatial_join.spatial_join(images, aois, res=12))
    # r7 shape: a Union of (JVM-decided pairs) and (hard pairs ->
    # exact refine).  The ONLY MapInArrow in the whole join plan is
    # that refine; relationally decided pairs never reach Python
    # (datagen's MapInPandas source nodes for the aoi side are
    # discounted — they are the test fixture's source, not the join).
    assert "Union" in plan
    assert plan.count("MapInArrow") == 1  # the hard-pair refine only
    assert "ArrowEvalPython" not in plan  # no pandas-UDF cell cover


def test_dn2toa_broadcasts_metadata(spark, images_parquet):
    images = spark.read.parquet(images_parquet)
    meta = datagen.gen_metadata(spark, 24, profile="bench")
    plan = _plan(transforms.dn2toa_stats(images, meta))
    # round 5: the fused stats stage is Arrow-native like its siblings
    assert plan.count("MapInArrow") == 1, plan
    assert "MapInPandas" not in plan.split("BroadcastHashJoin")[0], plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_minhash_candidate_shuffle_is_narrow(spark):
    """The bucket self-join must not carry the shingle arrays: no `sh`
    column may appear inside an Exchange below the pair-dedup."""
    docs = spark.createDataFrame(
        [(i, f"w{i} " * 20) for i in range(20)], ["doc_id", "text"]
    )
    plan = _plan(dedup.minhash_lsh_pairs(docs, n=3, n_hashes=32, bands=8))
    # find hashpartitioning exchanges on `bucket`: their column lists
    # must be (doc_id, bucket) only
    for ln in plan.splitlines():
        if "hashpartitioning" in ln and "bucket" in ln:
            assert "sh#" not in ln, ln


def test_exact_dedup_partial_aggregation(spark):
    docs = spark.createDataFrame([(i, f"t {i % 5}") for i in range(50)], ["doc_id", "text"])
    plan = _plan(dedup.exact_dedup(docs))
    # map-side partial agg before the exchange
    assert "partial_" in plan.lower() or "HashAggregate" in plan
    assert plan.index("HashAggregate") < plan.index("Exchange")


def test_image_emitting_stages_are_map_in_arrow(spark, images_parquet):
    """Round 3: the payload-emitting stages (apply_transforms, dn2toa,
    cast_images) must run as a single MapInArrow above the (possibly
    broadcast-joined) scan — no MapInPandas, no extra Python nodes."""
    from ukis_pysat_spark import sinks

    images = spark.read.parquet(images_parquet)
    # materialize metadata so the datagen MapInPandas source doesn't
    # show up in the stage plan under audit
    meta_path = images_parquet + "_meta_plan"
    datagen.gen_metadata(spark, 24, profile="bench").write.mode("overwrite").parquet(meta_path)
    meta = spark.read.parquet(meta_path)
    for df in (
        transforms.apply_transforms(images, [transforms.pixel_math(lambda a: a + 1)]),
        transforms.dn2toa(images, meta),
        sinks.cast_images(images, dtype="min"),
    ):
        plan = _plan(df)
        assert plan.count("MapInArrow") == 1, plan
        assert "MapInPandas" not in plan, plan
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan
    # dn2toa keeps the metadata side broadcast
    plan = _plan(transforms.dn2toa(images, meta))
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan, plan


def test_ivf_training_sample_is_take_ordered(spark):
    """The IVF coarse-quantizer training sample must stay a bounded
    TakeOrderedAndProject (per-partition top-K heap, no global sort
    exchange) — a full Sort over the embeddings table would turn the
    fixed-size model fit into a data-scale shuffle."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    sample = (
        emb.select("vec_id", "embedding")
        .orderBy(F.xxhash64("vec_id"), "vec_id")
        .limit(64)
    )
    plan = _plan(sample)
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_multimodal_stages_are_map_in_arrow(spark, images_parquet):
    """Round 4: the multimodal operators (decode_stats, resize_images,
    frame_sample) must each run as a single MapInArrow above the scan —
    no MapInPandas, no per-row Python eval nodes."""
    from ukis_pysat_spark.operators import multimodal

    images = spark.read.parquet(images_parquet)
    for df in (
        multimodal.decode_stats(images),
        multimodal.resize_images(images, 32, 32),
        multimodal.frame_sample(images, every_n=2),
    ):
        plan = _plan(df)
        assert plan.count("MapInArrow") == 1, plan
        assert "MapInPandas" not in plan, plan
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan


def test_sessionize_single_user_exchange(spark):
    """sessionize: ONE hash exchange on the user key serves both the
    lag/running-sum window and the session aggregate (HashPartitioning
    on user_id satisfies the grouping's ClusteredDistribution on
    (user_id, session_idx)) — no second shuffle."""
    from ukis_pysat_spark.operators import events as ev

    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    plan = _plan(ev.sessionize(e, gap_minutes=30))
    import re

    hashes = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert len(hashes) == 1, plan
    assert "user_id" in hashes[0] and "session_idx" not in hashes[0], hashes


def test_zonal_rasterize_plan_shape(spark, images_parquet, tmp_path_factory):
    """zonal_stats and rasterize run exactly ONE Arrow stage (the
    stats/burn stage — since r7 their pair source is the relational
    bbox candidate superset, so the spatial-join exact-refine Arrow
    stage is gone: the window mask is the exact test), zero
    MapInPandas / per-row Python, with the folded AOI side broadcast;
    the footprint-only scans never read the payload column."""
    from ukis_pysat_spark.operators import rasterize, zonal

    pa_ = str(tmp_path_factory.mktemp("plans") / "aois")
    datagen.gen_aois(spark, 10).write.mode("overwrite").parquet(pa_)
    images = spark.read.parquet(images_parquet)
    aois = spark.read.parquet(pa_)
    for df in (
        zonal.zonal_stats(images, aois, res=8),
        rasterize.rasterize(images, aois, res=8),
    ):
        plan = _plan(df)
        assert plan.count("MapInArrow") == 1, plan
        assert "MapInPandas" not in plan, plan
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
        fp_scans = [
            ln
            for ln in plan.splitlines()
            if "FileScan" in ln and "footprint_lon" in ln
        ]
        assert fp_scans and all("bytes" not in ln for ln in fp_scans), fp_scans


def test_mosaic_plan_shape(spark, images_parquet):
    """Round 5: the composite is ONE contribution MapInArrow above a
    pure-relational tile cover, ONE tile-key exchange, and the COO
    stack as FlatMapGroupsInArrow — no other shuffles, no pandas."""
    from ukis_pysat_spark.operators import mosaic

    images = spark.read.parquet(images_parquet)
    plan = _plan(
        mosaic.composite(images, [0.01, 0.0, -20.0, 0.0, -0.01, 60.0], 6000, 3000)
    )
    assert plan.count("MapInArrow") == 1, plan
    assert "FlatMapGroupsIn" in plan, plan
    assert "MapInPandas" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_polygonize_plan_single_arrow_stage(spark, images_parquet):
    """Round 5: polygonize is ONE MapInArrow above the scan — region
    extraction never shuffles the payload."""
    from ukis_pysat_spark.operators import polygonize

    images = spark.read.parquet(images_parquet)
    plan = _plan(polygonize.polygonize(images, band=0, quantize=256.0))
    assert plan.count("MapInArrow") == 1, plan
    assert "MapInPandas" not in plan, plan
    assert "Exchange" not in plan, plan


def test_terrain_chain_single_arrow_stage(spark, images_parquet):
    """Round 5: a chained terrain pipeline (slope -> focal in ONE
    apply_transforms) is a single MapInArrow with zero exchanges, and
    to_pixels over it adds exactly one more Arrow stage — per-pixel
    materialization never shuffles payloads."""
    from ukis_pysat_spark.operators import pixels, terrain

    images = spark.read.parquet(images_parquet)
    chained = transforms.apply_transforms(
        images, [terrain.slope(), terrain.focal("mean", 3)], out_fmt="raw"
    )
    plan = _plan(chained)
    assert plan.count("MapInArrow") == 1, plan
    assert "MapInPandas" not in plan and "Exchange" not in plan, plan

    plan2 = _plan(pixels.to_pixels(chained))
    assert plan2.count("MapInArrow") == 2, plan2
    assert "Exchange" not in plan2, plan2


def test_proximity_grid_plan_shape(spark, images_parquet):
    """Round 5: proximity_grid's tile payloads must NOT cross the
    strip shuffle — only the coordinate-strip rows exchange, and the
    halo join is a broadcast/left join onto the stationary tiles."""
    from ukis_pysat_spark.operators import proximity as prox

    images = spark.read.parquet(images_parquet)
    tiles = images.select("image_id", "bytes", "transform", "nodata")
    plan = _plan(
        prox.proximity_grid(
            tiles, [0.25, 0.0, -10.0, 0.0, -0.25, 60.0], tile=128, maxdist=8.0
        )
    )
    assert plan.count("MapInArrow") == 2, plan
    assert "MapInPandas" not in plan, plan
    # every exchange partitions on the strip keys, never on payload rows
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "dtx" in m.group(1) or "dty" in m.group(1), m.group(1)


def test_sampling_and_contour_stay_jvm_or_single_stage(spark, images_parquet):
    from ukis_pysat_spark.operators import contour as ct
    from ukis_pysat_spark.operators import sampling

    images = spark.read.parquet(images_parquet)
    plan = _plan(ct.contour(images, [100.5]))
    assert plan.count("MapInArrow") == 1 and "Exchange" not in plan, plan

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    splan = _plan(sampling.split_assign(docs, {"a": 0.5, "b": 0.5}, "doc_id"))
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas", "Exchange"):
        assert marker not in splan, marker


def test_session3_ops_plan_shapes(spark, images_parquet):
    """Round-5 session-3 operators keep their scale contracts: the
    terrain hydrology/texture chain and equalize run as ONE MapInArrow
    payload stage; trend_series is one series exchange + one
    FlatMapGroupsInArrow; histmatch is one payload equi-join + one
    Arrow stage; funnel and bm25 never leave the JVM."""
    import numpy as np

    from ukis_pysat_spark.operators import (
        events as events_ops,
        histmatch,
        indices,
        terrain,
        text,
        timeseries,
    )

    images = spark.read.parquet(images_parquet)

    # chained hydrology + texture + index + equalize: ONE Arrow stage
    chain = transforms.apply_transforms(
        images,
        [
            terrain.flow_accum(),
            terrain.stream_order(),
            terrain.lbp(),
            transforms.equalize(),
        ],
        out_fmt="raw",
    )
    plan = _plan(chain)
    assert plan.count("MapInArrow") == 1, plan
    assert "MapInPandas" not in plan

    # morphology open (a 2-fn chain) also fuses into the same stage
    plan = _plan(
        transforms.apply_transforms(
            images, terrain.morphology("open"), out_fmt="raw"
        )
    )
    assert plan.count("MapInArrow") == 1

    # trend: exactly one exchange (series key) + one grouped Arrow stage
    ts = images.select(
        F.col("image_id").alias("series_id"),
        F.lit(0.0).alias("epoch"),
        "bytes", "transform", "nodata",
    )
    plan = _plan(timeseries.trend_series(ts))
    assert "FlatMapGroupsInArrow" in plan
    assert plan.count("Exchange") == 1, plan

    # histmatch: one equi-join, one Arrow stage, no pandas
    plan = _plan(histmatch.match_histogram(images, images))
    assert plan.count("MapInArrow") == 1
    assert "MapInPandas" not in plan

    # funnel + bm25: pure JVM
    ev = spark.createDataFrame(
        [(1, "2025-01-01 00:00:00", 1, "view")],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    for q in (
        events_ops.funnel(ev, ["view", "click"]),
        text.bm25_topk(
            spark.createDataFrame([(0, "a b")], "doc_id long, text string"),
            "a",
        ),
    ):
        p = _plan(q)
        for marker in ("ArrowEvalPython", "BatchEvalPython",
                       "MapInPandas", "MapInArrow"):
            assert marker not in p, marker
