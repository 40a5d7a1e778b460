"""Dump formatted physical plans of the headline operators to
BENCH/PLANS.md — the plan-shape evidence (pruning, broadcast, codegen
spans, where Python appears) reviewed after every operator change.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from ukis_pysat_spark import datagen  # noqa: E402
from ukis_pysat_spark.operators import dedup, knn, similarity, spatial_join, tiling, transforms  # noqa: E402
from ukis_pysat_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def fmt(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def main() -> None:
    spark = get_spark("explain-audit", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    base = "/tmp/upss_plan_audit"
    if not os.path.exists(f"{base}/images/_SUCCESS"):
        datagen.gen_images(spark, 64, profile="bench").write.mode("overwrite").parquet(f"{base}/images")
        datagen.gen_aois(spark, 16).write.mode("overwrite").parquet(f"{base}/aois")
        datagen.gen_metadata(spark, 64, profile="bench").write.mode("overwrite").parquet(f"{base}/meta")
    images = spark.read.parquet(f"{base}/images")
    aois = spark.read.parquet(f"{base}/aois")
    meta = spark.read.parquet(f"{base}/meta")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.limit(3).select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))

    plans = {
        "tile_windows (relational; bytes pruned, full codegen)":
            tiling.tile_windows(images, 32, 32, 4),
        "tile_pixels (single mapInArrow above a pruned scan)":
            tiling.tile_pixels(images, 32, 32, 4),
        "spatial_join (relational cover + bbox filter in the cell join; one Python node = exact refine)":
            spatial_join.spatial_join(images, aois, res=12),
        "knn_broadcast (BroadcastNestedLoopJoin + WindowGroupLimit partial top-k, pure JVM)":
            knn.knn_broadcast(images, aois, k=5),
        "dn2toa_stats (BroadcastHashJoin on metadata; one fused Arrow stage)":
            transforms.dn2toa_stats(images, meta),
        "simhash64 (explode+xxhash64+64-column bit vote, zero Python)":
            dedup.simhash64_col(docs),
        "minhash_lsh_pairs (narrow (id,bucket) exchanges; shingles re-attach post-dedup)":
            dedup.minhash_lsh_pairs(docs, n=3, n_hashes=32, bands=8),
        "ivf_ann (ids-only inverted-list join; broadcast queries)":
            similarity.ivf_ann(emb, q, k=5, n_lists=8, n_probe=2),
        "dn2toa payload-emitting (round 3: single MapInArrow above the broadcast join)":
            transforms.dn2toa(images, meta),
        "knn_indexed with certified exact fallback (round 3: ring top-k + certificate join; fallback branch under AQE empty-propagation)":
            knn.knn_indexed(images, aois, k=5, res=6, ring=2),
        "ngram_jaccard prefix path (per-row hash-order prefixes; no extra shuffle before the candidate join)":
            dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.8, prefix_filter=True),
    }
    from ukis_pysat_spark.operators import multimodal

    plans.update({
        "multimodal resize_images (round 4: single MapInArrow through the generic PayloadBuf)":
            multimodal.resize_images(images, 32, 32, method="area"),
        "multimodal frame_sample (round 4: 1->N flat emission, single MapInArrow)":
            multimodal.frame_sample(images, every_n=2),
    })
    from ukis_pysat_spark.operators import mosaic, polygonize, rasterize, zonal

    plans.update({
        "zonal_stats (r7: ONE Arrow stage — bbox candidate pairs + fused window/mask/stats; broadcast ring fold)":
            zonal.zonal_stats(images, aois, res=12),
        "rasterize (round 5: canvas born in the Arrow stage; payload-free footprint scans)":
            rasterize.rasterize(images, aois, res=12),
        "mosaic composite (round 5: relational tile cover, one contribution MapInArrow, one tile-key exchange, COO FlatMapGroupsInArrow stack)":
            mosaic.composite(images, [0.01, 0.0, -20.0, 0.0, -0.01, 60.0], 6000, 3000),
        "polygonize (round 5: single MapInArrow, zero exchanges; O(regions) rows out)":
            polygonize.polygonize(images, band=0, quantize=256.0),
        "band_histogram (round 5: single MapInArrow, bins out)":
            multimodal.band_histogram(images, 32, 0.0, 4096.0),
    })
    out = ["# Physical plans of the headline operators",
           "",
           "Regenerate with `python tools/explain_audit.py`.  `*` marks",
           "whole-stage-codegen spans; Python appears only where pixels or",
           "sketch math genuinely require it.", ""]
    for title, df in plans.items():
        out.append(f"## {title}\n\n```\n{fmt(df)}```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "BENCH", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote BENCH/PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
