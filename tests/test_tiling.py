"""Golden tiling tests — values from the reference's own test suite
(/root/reference/tests/test_raster.py:362-375), which depend only on
(w, h, transform, tile params), so they transfer exactly to synthetic
pixels."""

import numpy as np
import pyspark.sql.functions as F

from ukis_pysat_spark import codec, datagen
from ukis_pysat_spark.operators import tiling

GOLDEN_BOUNDS = (11.903960582768779, 51.45624717410995, 11.904589403469808, 51.45687599481152)


def _dummy_images(spark, n=1):
    return datagen.gen_images(spark, n, profile="golden")


def test_tile_count_golden(spark):
    # 679x764 @ (5,5,1) -> 20,808 windows (test_raster.py:368)
    win = tiling.tile_windows(_dummy_images(spark), 5, 5, 1)
    assert win.count() == 20808


def test_window_2578_golden(spark):
    win = tiling.tile_windows(_dummy_images(spark), 5, 5, 1)
    row = win.filter(F.col("tile_id") == 2578).collect()[0]
    assert (row.col_off, row.row_off, row.tw, row.th) == (79, 649, 7, 7)
    got = (row.left, row.bottom, row.right, row.top)
    assert np.allclose(got, GOLDEN_BOUNDS, rtol=0, atol=1e-12)


def test_first_and_last_window_clipping(spark):
    win = tiling.tile_windows(_dummy_images(spark), 5, 5, 1).orderBy("tile_id")
    rows = win.collect()
    first, last = rows[0], rows[-1]
    # first window: offsets clamp at 0 -> (0,0,6,6)
    assert (first.col_off, first.row_off, first.tw, first.th) == (0, 0, 6, 6)
    assert last.tile_id == 20807
    # last offsets (675,760) -> clamp -1 overlap, clip to (679,764)
    assert (last.col_off, last.row_off, last.tw, last.th) == (674, 759, 5, 5)


def test_no_overlap_windows_partition_image(spark):
    # zero overlap -> windows tile the image exactly once
    win = tiling.tile_windows(_dummy_images(spark), 256, 256, 0)
    area = win.agg(F.sum(F.col("tw").cast("long") * F.col("th"))).collect()[0][0]
    assert area == 679 * 764


def test_tile_pixels_matches_windows_and_reference_slices(spark):
    imgs = _dummy_images(spark)
    px = tiling.tile_pixels(imgs, 5, 5, 1).filter(F.col("tile_id") == 2578).collect()[0]
    assert (px.col_off, px.row_off, px.tw, px.th) == (79, 649, 7, 7)
    assert np.allclose((px.left, px.bottom, px.right, px.top), GOLDEN_BOUNDS, atol=1e-12)
    # pixel content equals an oracle slice of the deterministic source
    src = datagen.pixels_for(0, 1, 764, 679, "int16", seed=42)
    tile = codec.decode(px.px)
    assert np.array_equal(tile, src[:, 649:656, 79:86])
    assert px.caption.startswith("scene 0 over ")


def test_tile_pixels_total_area(spark):
    imgs = datagen.gen_images(spark, 6, profile="mixed")
    tp = tiling.tile_pixels(imgs, 7, 6, 0)
    win = tiling.tile_windows(imgs, 7, 6, 0)
    # identical enumeration between the relational and pixel paths
    a = tp.select("image_id", "tile_id", "col_off", "row_off", "tw", "th")
    b = win.select("image_id", "tile_id", "col_off", "row_off", "tw", "th")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_single_band_subset(spark):
    imgs = datagen.gen_images(spark, 2, profile="mixed")
    tp = tiling.tile_pixels(imgs, 8, 8, 0, band=0)
    row = tp.filter((F.col("image_id") == "img00000001") & (F.col("tile_id") == 0)).collect()[0]
    arr = codec.decode(row.px)
    assert arr.shape[0] == 1  # single band extracted, promoted to 3-D


def test_tile_pixels_rawz_variable_sizes(spark):
    """ADVICE r2: rawz tile payloads differ in size per tile — the
    buffer must carry per-tile lengths instead of requiring equal
    sizes.  Gate: rawz output decodes pixel-identical to raw output."""
    imgs = datagen.gen_images(spark, 3, profile="mixed", seed=7)
    raw = {
        (r.image_id, r.tile_id): r
        for r in tiling.tile_pixels(imgs, 48, 48, 4, out_fmt="raw").collect()
    }
    rz = tiling.tile_pixels(imgs, 48, 48, 4, out_fmt="rawz").collect()
    assert len(rz) == len(raw)
    sizes = {len(r.px) for r in rz}
    assert len(sizes) > 1, "fixture must actually produce variable rawz sizes"
    for r in rz:
        ref = raw[(r.image_id, r.tile_id)]
        assert np.array_equal(codec.decode(r.px), codec.decode(ref.px))
        assert (r.col_off, r.row_off, r.tw, r.th) == (
            ref.col_off, ref.row_off, ref.tw, ref.th,
        )
        assert r.caption == ref.caption
