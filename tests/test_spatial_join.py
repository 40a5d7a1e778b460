"""Spatial join: indexed filter-and-refine must match the brute-force
O(n*m) oracle EXACTLY (BASELINE.json:14 'matching the reference's join
output rows')."""

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from ukis_pysat_spark import datagen
from ukis_pysat_spark.operators import geometry, knn, spatial_join


def _pairs(df):
    return set((r.image_id, r.aoi_id) for r in df.collect())


def test_pip_oracle_agreement():
    # pure-numpy PIP sanity against a hand-built polygon
    ring_x = np.array([0.0, 2.0, 2.0, 0.0])
    ring_y = np.array([0.0, 0.0, 2.0, 2.0])
    px = np.array([1.0, 3.0, -0.1, 1.999])
    py = np.array([1.0, 1.0, 0.5, 0.001])
    assert geometry.points_in_polygon(px, py, ring_x, ring_y).tolist() == [
        True, False, False, True]


def test_polygon_intersects_cases():
    sq = (np.array([0, 2, 2, 0.0]), np.array([0, 0, 2, 2.0]))
    far = (np.array([5, 6, 6, 5.0]), np.array([5, 5, 6, 6.0]))
    inside = (np.array([0.5, 1.5, 1.5, 0.5]), np.array([0.5, 0.5, 1.5, 1.5]))
    crossing = (np.array([1, 3, 3, 1.0]), np.array([1, 1, 3, 3.0]))
    # containment without vertex-in: big diamond around the square
    diamond = (np.array([-3, 1, 5, 1.0]), np.array([1, -3, 1, 5.0]))
    assert not geometry.polygon_intersects(*sq, *far)
    assert geometry.polygon_intersects(*sq, *inside)
    assert geometry.polygon_intersects(*sq, *crossing)
    assert geometry.polygon_intersects(*sq, *diamond)
    assert geometry.polygon_intersects(*diamond, *sq)


def test_cover_contains_point_cells():
    ring_lon = np.array([10.0, 10.5, 10.5, 10.0, 10.0])
    ring_lat = np.array([50.0, 50.0, 50.4, 50.4, 50.0])
    cover = set(geometry.cover_polygon(ring_lon, ring_lat, 12).tolist())
    pts = geometry.cell_of_points(
        np.array([10.1, 10.49, 10.25]), np.array([50.05, 50.39, 50.2]), 12
    )
    assert set(pts.tolist()) <= cover


def test_spatial_join_matches_bruteforce(spark):
    imgs = datagen.gen_images(spark, 120, profile="bench", skew_frac=0.3)
    aois = datagen.gen_aois(spark, 60, skew_frac=0.3)
    got = _pairs(spatial_join.spatial_join(imgs, aois, res=12))
    exp = _pairs(spatial_join.spatial_join_bruteforce(imgs, aois))
    assert got == exp
    assert len(exp) > 0  # fixture produces real overlaps


def test_spatial_join_salted_same_result(spark):
    imgs = datagen.gen_images(spark, 120, profile="bench", skew_frac=0.5)
    aois = datagen.gen_aois(spark, 40, skew_frac=0.5)
    plain = _pairs(spatial_join.spatial_join(imgs, aois, res=12))
    salted = _pairs(spatial_join.spatial_join(imgs, aois, res=12, salt=8))
    assert plain == salted


def test_spatial_join_pathological_skew(spark):
    """SURVEY §7.4 case: 80% of AOIs AND scenes collapse onto one
    hotspot cell; salted join must still match brute force exactly."""
    imgs = datagen.gen_images(spark, 100, profile="bench", skew_frac=0.8)
    aois = datagen.gen_aois(spark, 50, skew_frac=0.8)
    exp = _pairs(spatial_join.spatial_join_bruteforce(imgs, aois))
    got = _pairs(spatial_join.spatial_join(imgs, aois, res=12, salt=16))
    assert got == exp
    assert len(exp) > 100  # the hotspot really is dense


def test_points_in_aois_matches_numpy(spark):
    rng = np.random.Generator(np.random.Philox(key=5))
    n = 400
    pts = pd.DataFrame(
        {
            "point_id": [f"p{i}" for i in range(n)],
            "lon": 8.0 + 8.0 * rng.random(n),
            "lat": 48.0 + 6.0 * rng.random(n),
        }
    )
    aois_pdf = datagen.aois_pdf(np.arange(30), seed=77)
    pts_df = spark.createDataFrame(pts)
    aois_df = spark.createDataFrame(aois_pdf)
    got = set((r.point_id, r.aoi_id) for r in
              spatial_join.points_in_aois(pts_df, aois_df).collect())
    exp = set()
    for a in aois_pdf.itertuples(index=False):
        inside = geometry.points_in_polygon(
            pts["lon"].values, pts["lat"].values,
            np.asarray(a.ring_lon), np.asarray(a.ring_lat))
        for pid in pts["point_id"].values[inside]:
            exp.add((pid, a.aoi_id))
    assert got == exp


def test_knn_broadcast_matches_oracle(spark):
    imgs = datagen.gen_images(spark, 80, profile="bench")
    aois = datagen.gen_aois(spark, 12)
    got = knn.knn_broadcast(imgs, aois, k=5).toPandas()
    scenes = knn.scene_centroids(imgs).toPandas()
    exp = knn.knn_bruteforce_oracle(scenes, aois.toPandas(), k=5)
    g = got.sort_values(["aoi_id", "rank"]).reset_index(drop=True)
    e = exp.sort_values(["aoi_id", "rank"]).reset_index(drop=True)
    assert (g["image_id"] == e["image_id"]).all()
    assert np.allclose(g["dist_km"], e["dist_km"])


def test_knn_indexed_matches_broadcast_when_ring_covers(spark):
    imgs = datagen.gen_images(spark, 200, profile="bench")
    aois = datagen.gen_aois(spark, 8)
    exact = knn.knn_broadcast(imgs, aois, k=3).toPandas()
    idx = knn.knn_indexed(imgs, aois, k=3, res=3, ring=2).toPandas()
    g = idx.sort_values(["aoi_id", "rank"]).reset_index(drop=True)
    e = exact.sort_values(["aoi_id", "rank"]).reset_index(drop=True)
    assert (g["image_id"] == e["image_id"]).all()


def _scene_at(image_id: str, lon: float, lat: float):
    # transform places the 100x100 scene's centroid exactly at (lon, lat)
    a = 1e-4
    return (image_id, 100, 100, [a, 0.0, lon - 50 * a, 0.0, -a, lat + 50 * a])


def _scenes_df(spark, pts):
    return spark.createDataFrame(
        [_scene_at(*p) for p in pts],
        "image_id string, w int, h int, transform array<double>",
    )


def _aoi_df(spark, aoi_id, lon, lat):
    return spark.createDataFrame(
        [(aoi_id, lon, lat)], "aoi_id string, centroid_lon double, centroid_lat double"
    )


def test_knn_indexed_exact_fallback_under_return(spark):
    """VERDICT r2 #4a: all scenes outside the ring -> the raw ring path
    returns ZERO rows; exact_fallback must equal knn_broadcast."""
    scenes = _scenes_df(spark, [(f"s{i}", float(i), 40.0) for i in range(10)])
    aoi = _aoi_df(spark, "a0", 0.0, 0.0)  # 40 deg of latitude away
    raw = knn.knn_indexed(scenes, aoi, k=3, res=6, ring=1, exact_fallback=False)
    assert raw.count() < 3  # provable under-return
    fixed = knn.knn_indexed(scenes, aoi, k=3, res=6, ring=1).toPandas()
    exact = knn.knn_broadcast(scenes, aoi, k=3).toPandas()
    f = fixed.sort_values("rank").reset_index(drop=True)
    e = exact.sort_values("rank").reset_index(drop=True)
    assert list(f["image_id"]) == list(e["image_id"])
    assert np.allclose(f["dist_km"], e["dist_km"])


def test_knn_indexed_exact_fallback_kth_outside_ring(spark):
    """VERDICT r2 #4b: the nastier case — the ring holds >= k scenes but
    a CLOSER scene sits just outside it.  The certificate (k-th distance
    vs the ring's guaranteed-covered radius) must reject the ring answer
    and the fallback must return the true kNN."""
    # centroid cell at res 6: lon cell 5.625 deg, lat cell 2.8125 deg
    inside_far = [(f"in{i}", 10.9, 5.0 + 0.1 * i) for i in range(3)]  # ~1250 km, inside ring
    outside_near = [("out0", -6.0, 0.1)]  # ~680 km but 2 lon cells away
    scenes = _scenes_df(spark, inside_far + outside_near)
    aoi = _aoi_df(spark, "a0", 0.1, 0.1)
    raw = knn.knn_indexed(scenes, aoi, k=3, res=6, ring=1, exact_fallback=False).toPandas()
    assert "out0" not in set(raw["image_id"]), "fixture: out0 must be outside the ring"
    exact = knn.knn_broadcast(scenes, aoi, k=3).toPandas()
    assert exact.sort_values("rank")["image_id"].iloc[0] == "out0"
    fixed = knn.knn_indexed(scenes, aoi, k=3, res=6, ring=1).toPandas()
    f = fixed.sort_values("rank").reset_index(drop=True)
    e = exact.sort_values("rank").reset_index(drop=True)
    assert list(f["image_id"]) == list(e["image_id"])
    assert np.allclose(f["dist_km"], e["dist_km"])


def test_knn_indexed_certified_skips_fallback(spark):
    """When the ring is sufficient the certified path must keep the ring
    answer (equal to broadcast) — covering the guard-radius math."""
    imgs = datagen.gen_images(spark, 200, profile="bench")
    aois = datagen.gen_aois(spark, 8)
    exact = knn.knn_broadcast(imgs, aois, k=3).toPandas()
    idx = knn.knn_indexed(imgs, aois, k=3, res=3, ring=2).toPandas()
    g = idx.sort_values(["aoi_id", "rank"]).reset_index(drop=True)
    e = exact.sort_values(["aoi_id", "rank"]).reset_index(drop=True)
    assert (g["image_id"] == e["image_id"]).all()
    assert np.allclose(g["dist_km"], e["dist_km"])


def test_axis_aligned_box_classifier(spark):
    """Box-box candidate pairs skip Python refinement; the classifier
    must accept exactly closed axis-aligned rectangles (either winding)
    and reject quads, bowties, open rings and degenerate boxes."""
    rows = [
        ("rect_ccw", [0.0, 2.0, 2.0, 0.0, 0.0], [0.0, 0.0, 1.0, 1.0, 0.0], True),
        ("rect_cw", [0.0, 0.0, 2.0, 2.0, 0.0], [0.0, 1.0, 1.0, 0.0, 0.0], True),
        # same value sets but self-crossing (bowtie): edges not rectilinear
        ("bowtie", [0.0, 2.0, 0.0, 2.0, 0.0], [0.0, 1.0, 1.0, 0.0, 0.0], False),
        ("diamond", [1.0, 2.0, 1.0, 0.0, 1.0], [0.0, 1.0, 2.0, 1.0, 0.0], False),
        ("open", [0.0, 2.0, 2.0, 0.0, 0.5], [0.0, 0.0, 1.0, 1.0, 0.0], False),
        ("degenerate", [0.0, 0.0, 0.0, 0.0, 0.0], [0.0, 0.0, 1.0, 1.0, 0.0], False),
        ("hexagon", [0.0, 1.0, 2.0, 2.0, 1.0, 0.0], [0.0, 0.0, 1.0, 2.0, 2.0, 0.0], False),
    ]
    df = spark.createDataFrame(
        [(r[0], r[1], r[2]) for r in rows],
        "name string, ring_lon array<double>, ring_lat array<double>",
    ).select(
        "name", spatial_join.axis_aligned_box(F.col("ring_lon"), F.col("ring_lat")).alias("b")
    )
    got = {r.name: r.b for r in df.collect()}
    assert got == {r[0]: r[3] for r in rows}, got


def test_spatial_join_all_box_matches_bruteforce(spark):
    """All-box corpus (the satellite-scene common case): the join runs
    the relational fast path end-to-end and must still match the
    brute-force PIP oracle exactly."""
    imgs = datagen.gen_images(spark, 120, profile="bench", skew_frac=0.3)
    # datagen AOIs alternate boxes and quads; keep only the boxes
    aois = datagen.gen_aois(spark, 40, skew_frac=0.3).filter(
        spatial_join.axis_aligned_box(F.col("ring_lon"), F.col("ring_lat"))
    )
    assert aois.count() > 10
    got = {(r.image_id, r.aoi_id) for r in spatial_join.spatial_join(imgs, aois, res=12).collect()}
    exp = {
        (r.image_id, r.aoi_id)
        for r in spatial_join.spatial_join_bruteforce(imgs, aois).collect()
    }
    assert got == exp
