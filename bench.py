"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

The headline metric follows BASELINE.json: tiles+join-rows/sec over the
spatial engine queries (tiling, spatial join, kNN, dn2toa) on a
synthetic images/AOI corpus sized by the scale factor, plus the
relational/pipeline queries on the driver's parquet tables.  Synthetic
inputs are materialized to parquet in setup (unmeasured) so the timed
queries measure the engine reading a real images table, not datagen.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from ukis_pysat_spark import datagen  # noqa: E402
from ukis_pysat_spark.operators import knn, mosaic, multimodal, polygonize, rasterize, spatial_join, tiling, transforms, zonal  # noqa: E402
from ukis_pysat_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_of(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else 0.1


def materialize_synthetic(spark, sf: float, base: str) -> tuple[str, str, str, str, str]:
    n_images = max(int(200_000 * sf), 200)
    n_aois = max(int(5_000 * sf), 50)
    n_toa = max(int(10_000 * sf), 50)  # scene-like 512 KiB payloads
    paths = (
        f"{base}/images", f"{base}/aois", f"{base}/metadata",
        f"{base}/toa_images", f"{base}/toa_metadata", f"{base}/hashes",
    )
    if not os.path.exists(f"{paths[0]}/_SUCCESS"):
        datagen.gen_images(spark, n_images, profile="bench", skew_frac=0.2).write.mode(
            "overwrite"
        ).parquet(paths[0])
        datagen.gen_aois(spark, n_aois, skew_frac=0.2).write.mode("overwrite").parquet(paths[1])
        datagen.gen_metadata(spark, n_images, profile="bench").write.mode("overwrite").parquet(
            paths[2]
        )
    if not os.path.exists(f"{paths[5]}/_SUCCESS"):
        # perceptual-hash corpus for the hamming near-dup join: the
        # bench images' phash column is DEGENERATE (4 distinct values —
        # their low-amplitude noise never flips a block-mean bit), so
        # the near-dup bench uses closed-form 62-bit mixed hashes with
        # 2% planted variants at hamming 0..4 — realistic bucket
        # occupancy for a web-scale image catalog
        n_hashes = max(int(2_000_000 * sf), 2_000)
        mix = (
            "((({x} * 2654435761) % 2147483648) + "
            "(({x} * 2246822519) % 2147483648) * 2147483648)"
        )
        spark.range(n_hashes).selectExpr(
            "concat('ph', cast(id as string)) AS image_id",
            f"""CASE WHEN id % 50 = 49 THEN {mix.format(x="(id-7)")} ^ (
                  (shiftleft(cast(1 as bigint), cast(id%5 as int)) - 1)
                  * shiftleft(cast(1 as bigint), cast((id*5)%54 as int)))
                ELSE {mix.format(x="id")} END AS phash""",
        ).write.mode("overwrite").parquet(paths[5])
    if not os.path.exists(f"{paths[3]}/_SUCCESS"):
        datagen.gen_images(spark, n_toa, profile="toa_bench").write.mode("overwrite").parquet(
            paths[3]
        )
        datagen.gen_metadata(spark, n_toa, profile="toa_bench").write.mode("overwrite").parquet(
            paths[4]
        )
    return paths


def main() -> None:
    sf = _sf_of(SF_DIR)
    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 8))
    base = f"/tmp/upss_bench_sf{sf}"
    images_p, aois_p, meta_p, toa_img_p, toa_meta_p, hashes_p = materialize_synthetic(
        spark, sf, base
    )
    images = spark.read.parquet(images_p)
    aois = spark.read.parquet(aois_p)
    metadata = spark.read.parquet(meta_p)
    toa_images = spark.read.parquet(toa_img_p)
    toa_metadata = spark.read.parquet(toa_meta_p)

    timings: dict[str, float] = {}
    row_counts: dict[str, int] = {}

    def timed(name: str, fn):
        fn()  # warm-up: JIT/codegen/python-worker costs are one-time
        reps = []
        n = 0
        for _ in range(2):  # min-of-2: the sandbox has co-tenant noise spikes
            t0 = time.perf_counter()
            n = fn()
            reps.append(time.perf_counter() - t0)
        # the two reps disagreeing by >1.5x means a noise spike hit one
        # of them — buy a third sample before taking the min
        if max(reps) > 1.5 * min(reps) and min(reps) > 0.5:
            t0 = time.perf_counter()
            n = fn()
            reps.append(time.perf_counter() - t0)
        timings[name] = round(min(reps), 3)
        row_counts[name] = int(n)

    # --- spatial engine headline queries (tiles + join rows) --------------
    timed("tile_windows", lambda: tiling.tile_windows(images, 32, 32, 4).count())
    timed("tile_pixels", lambda: tiling.tile_pixels(images, 32, 32, 4).count())
    timed(
        "spatial_join",
        lambda: spatial_join.spatial_join(images, aois, res=12).count(),
    )
    # fused spatial-join -> window -> PIP mask -> per-band stats (zonal
    # statistics; payload crosses ONE equi-join, output is stats rows)
    timed(
        "zonal_stats",
        lambda: zonal.zonal_stats(images, aois, res=12).count(),
    )
    # vector->raster burn: AOI polygons rasterized into every covered
    # target grid (canvas born in the Arrow stage; max-combine overlap)
    timed(
        "rasterize",
        lambda: rasterize.rasterize(images, aois, res=12).count(),
    )
    # median composite of all scenes onto a 0.01-deg continental grid
    # (cropped COO contributions; the 20%-hotspot stack reduces in one
    # lexsort)
    timed(
        "mosaic_median",
        lambda: mosaic.composite(
            images, [0.01, 0.0, -20.0, 0.0, -0.01, 60.0], 6000, 3000,
            tile=256, method="median", out_dtype="float32",
        ).count(),
    )
    # raster -> vector regions: 4-connected CCL per image (in-stage
    # value binning), one row per region
    timed(
        "polygonize",
        lambda: polygonize.polygonize(images, band=0, quantize=256.0).count(),
    )
    # auto-chosen physical path (broadcast at this scale; the chooser's
    # counts are part of the measured cost)
    timed("knn", lambda: knn.knn(images, aois, k=5).count())
    # cell-ring pruned kNN with the certified exact fallback (the scale
    # path for huge scene tables; result provably equals broadcast)
    timed(
        "knn_indexed",
        lambda: knn.knn_indexed(images, aois, k=5, res=6, ring=2).count(),
    )
    # bi-temporal change stats: payload x payload equi-join + one
    # Arrow stage (self-diff: epochs identical, so the timing is pure
    # join/decode/reduce machinery)
    from ukis_pysat_spark.operators import change as _change

    timed(
        "change_stats",
        lambda: _change.change_stats(images, images, threshold=1.0).count(),
    )
    # overview pyramid: 1->3 payload-emitting fan-out per image
    from ukis_pysat_spark.operators import overviews as _ov

    timed(
        "overviews",
        lambda: _ov.build_overviews(images, factors=(2, 4, 8)).count(),
    )
    # per-band fixed-width histograms (decode + bincount, bins out)
    timed(
        "band_hist",
        lambda: multimodal.band_histogram(images, 32, 0.0, 4096.0).count(),
    )
    # GLCM texture features: quantize + one bincount per band, four
    # Haralick stats out (decode-once stats stage like band_hist)
    from ukis_pysat_spark.operators import texture as _texture

    timed(
        "glcm",
        lambda: _texture.glcm_features(images, levels=16).count(),
    )
    # zonal majority over the same image x AOI corpus as zonal_stats
    timed(
        "zonal_mode",
        lambda: zonal.zonal_mode(images, aois, res=12).count(),
    )
    # terrain: Horn hillshade (slope + aspect math fused into one
    # Lambertian kernel) as a payload-emitting single Arrow stage
    from ukis_pysat_spark.operators import terrain as _terrain

    timed(
        "hillshade",
        lambda: transforms.apply_transforms(
            images, [_terrain.hillshade()], out_fmt="raw"
        ).count(),
    )
    # viewshed: R3 exact line-of-sight from the scene center, maxdist-
    # bounded as on any large DEM (cost O(px * md)); payload-emitting
    # single Arrow stage like hillshade
    timed(
        "viewshed",
        lambda: transforms.apply_transforms(
            images, [_terrain.viewshed((64, 64), oh=2.0, maxdist=24)],
            out_fmt="raw",
        ).count(),
    )
    # point sampling: every 16th scene's center point (closed-form from
    # the footprint columns, metadata-only scan) PIP-joined and
    # gathered — the training-label-extraction hot path.  Centers in
    # the 20%-hotspot fall inside thousands of sibling scenes, so even
    # this 1/16 sample emits ~1M (point, image, band) rows; one point
    # per scene is a quadratic hotspot blowup (measured 16.5M rows,
    # ~91 s — linear in pairs, but not a per-round bench budget)
    from ukis_pysat_spark.operators import pointsample as _psamp

    bench_pts = images.where(
        F.substring("image_id", 4, 8).cast("long") % 16 == 0
    ).select(
        F.concat(F.lit("pt"), F.col("image_id")).alias("point_id"),
        ((F.array_min("footprint_lon") + F.array_max("footprint_lon")) / 2).alias("lon"),
        ((F.array_min("footprint_lat") + F.array_max("footprint_lat")) / 2).alias("lat"),
    )
    timed(
        "point_sample",
        lambda: _psamp.sample_points(images, bench_pts, res=12).count(),
    )
    timed(
        "dn2toa_stats",
        lambda: transforms.dn2toa_stats(images, metadata).count(),
    )
    # payload-EMITTING TOA pipeline (Arrow-native buffer emitter) over
    # scene-like 512 KiB images — measures the images-out hot path
    timed(
        "dn2toa_pixels",
        lambda: transforms.dn2toa(toa_images, toa_metadata).count(),
    )

    # GeoTIFF sink loop (round 6): encode every scene-like payload to a
    # strip GTiff (deflate + predictor) and parse it back — the full
    # write->read payload path through two Arrow stages
    from ukis_pysat_spark import sinks as _sinks

    timed(
        "gtiff_roundtrip",
        lambda: _sinks.from_geotiff(
            _sinks.to_geotiff(toa_images, compression="deflate")
        ).count(),
    )

    # --- relational / pipeline queries on the driver tables ---------------
    qs = entrymod.queries_unfolded()
    for name in [
        "q1_pricing",
        "revenue_by_nation",
        "events_by_type",
        "doc_profile",
        "exact_dedup",
        "ann_topk",
        "minhash_lsh_docs",
        "simhash_docs",
        "ngram_jaccard",
        "scene_meta_profile",
        "revenue_rollup",
        "ivf_ann_topk",
        "pip_points_in_boxes",
        "knn_points",
        "events_sessions",
        "doc_chunks",
        "bm25_topk",
    ]:
        timed(name, lambda n=name: qs[n](spark, SF_DIR).count())

    # blocked-GEMM near-dup (the relational twin is the sf0.01
    # correctness query; quadratic interpreted cosine is not a benchmark)
    from ukis_pysat_spark.operators import dedup as _dedup

    # perceptual-hash near-dup: pure-relational pigeonhole hamming join
    # over the materialized 62-bit hash corpus (no pixel decode)
    timed(
        "phash_neardup",
        lambda: _dedup.phash_neardup(
            spark.read.parquet(hashes_p), max_hamming=4
        ).count(),
    )

    timed(
        "embedding_neardup_blocked",
        lambda: _dedup.embedding_neardup_blocked(
            spark.read.parquet(f"{SF_DIR}/embeddings.parquet"), threshold=0.35
        ).count(),
    )

    # near-dup clustering at scale: CC over the blocked-GEMM pair set
    # (the driver's dedup_clusters correctness query instead clusters
    # the O(n^2) relational twin — exact at sf0.01, not a benchmark)
    from ukis_pysat_spark.operators import graph as _graph

    timed(
        "dedup_clusters_blocked",
        lambda: _graph.connected_components(
            _dedup.embedding_neardup_blocked(
                spark.read.parquet(f"{SF_DIR}/embeddings.parquet"), threshold=0.35
            )
        ).count(),
    )

    spatial_rows = sum(
        row_counts[k] for k in ("tile_windows", "tile_pixels", "spatial_join", "knn")
    )
    spatial_secs = sum(
        timings[k] for k in ("tile_windows", "tile_pixels", "spatial_join", "knn")
    )
    throughput = round(spatial_rows / spatial_secs, 1) if spatial_secs else 0.0

    print(
        json.dumps(
            {
                "metric": "tiles+join-rows/sec (spatial headline); per-query wall secs",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "rows": row_counts,
                "throughput_rows_per_sec": throughput,
                "cpus": CPUS,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
