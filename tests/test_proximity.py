"""Proximity (exact EDT) vs brute-force nearest-target search."""

import numpy as np
import pytest

from ukis_pysat_spark import codec
from ukis_pysat_spark.operators import proximity, transforms
from tests.test_terrain import _img_df


def _brute(plane, targets, maxdist=None, fill=-1.0, scale=1.0):
    h, w = plane.shape
    tr, tc = np.nonzero(targets)
    out = np.full((h, w), fill)
    lim = np.hypot(h, w) * scale if maxdist is None else maxdist
    for r in range(h):
        for c in range(w):
            if tr.size == 0:
                continue
            d = np.sqrt((tr - r) ** 2.0 + (tc - c) ** 2.0).min() * scale
            out[r, c] = d if d <= lim else fill
    return out


def _run(spark, plane, nodata=0.0, **kw):
    df = _img_df(spark, plane, nodata=nodata)
    out = transforms.apply_transforms(
        df, [proximity.proximity(**kw)], out_fmt="raw"
    )
    row = out.first()
    return codec.decode(bytes(row["bytes"]))[0], row


def test_proximity_differential_random(spark):
    rng = np.random.Generator(np.random.Philox(key=np.uint64(31)))
    for trial in range(3):
        plane = np.zeros((11, 14))
        plane[rng.random((11, 14)) < 0.08] = 7.0
        got, row = _run(spark, plane)
        want = _brute(plane, plane != 0.0)
        assert np.array_equal(got, want), trial
        assert row["nodata"] == -1.0

        got_md, _ = _run(spark, plane, maxdist=3.0)
        want_md = _brute(plane, plane != 0.0, maxdist=3.0)
        assert np.array_equal(got_md, want_md), trial


def test_proximity_target_values(spark):
    plane = np.zeros((8, 8))
    plane[1, 1] = 5.0
    plane[6, 6] = 9.0
    got, _ = _run(spark, plane, target_values=[9.0])
    want = _brute(plane, plane == 9.0)
    assert np.array_equal(got, want)
    assert got[6, 6] == 0.0 and got[1, 1] > 0.0


def test_proximity_no_targets_fills(spark):
    plane = np.zeros((5, 5))
    got, _ = _run(spark, plane, fill=-7.0)
    assert np.all(got == -7.0)


def test_proximity_geo_units(spark):
    plane = np.zeros((6, 6))
    plane[2, 2] = 1.0
    got, _ = _run(spark, plane, units="geo")  # 0.5-deg square pixels
    want = _brute(plane, plane != 0.0, scale=0.5)
    assert np.allclose(got, want, rtol=0, atol=0)
    # geo maxdist converts to a column bound: 1.0 geo = 2 px
    got_md, _ = _run(spark, plane, units="geo", maxdist=1.0)
    want_md = _brute(plane, plane != 0.0, maxdist=1.0, scale=0.5)
    assert np.array_equal(got_md, want_md)

    with pytest.raises(Exception):
        df = _img_df(spark, plane, transform=[0.5, 0, -10.0, 0, -0.25, 60.0])
        transforms.apply_transforms(
            df, [proximity.proximity(units="geo")], out_fmt="raw"
        ).collect()


def test_proximity_validation():
    with pytest.raises(ValueError):
        proximity.proximity(units="furlong")


def _tiles_df(spark, plane, tile, gt):
    h, w = plane.shape
    rows = []
    for ty in range(h // tile):
        for tx in range(w // tile):
            sub = plane[ty * tile : (ty + 1) * tile, tx * tile : (tx + 1) * tile]
            t = [
                gt[0], 0.0, gt[2] + tx * tile * gt[0],
                0.0, gt[4], gt[5] + ty * tile * gt[4],
            ]
            rows.append(
                (
                    f"t_{tx}_{ty}",
                    bytearray(codec.encode(sub[None, :, :], "raw")),
                    [float(v) for v in t],
                    0.0,
                )
            )
    return spark.createDataFrame(
        rows,
        "image_id string, bytes binary, transform array<double>, nodata double",
    )


def test_proximity_grid_equals_untiled(spark):
    rng = np.random.Generator(np.random.Philox(key=np.uint64(53)))
    gt = [0.25, 0.0, -10.0, 0.0, -0.25, 60.0]
    tile = 20
    plane = np.zeros((40, 40))
    # sparse targets, several hugging tile boundaries to force the halo
    plane[rng.random((40, 40)) < 0.01] = 7.0
    plane[19, 21] = 7.0
    plane[20, 5] = 7.0
    plane[0, 39] = 7.0
    for maxdist in (3.0, 12.0):
        tiles = _tiles_df(spark, plane, tile, gt)
        out = proximity.proximity_grid(tiles, gt, tile=tile, maxdist=maxdist)
        rows = out.collect()
        assert len(rows) == 4
        got = np.full((40, 40), np.nan)
        for r in rows:
            tx, ty = int(r["image_id"].split("_")[1]), int(r["image_id"].split("_")[2])
            got[
                ty * tile : (ty + 1) * tile, tx * tile : (tx + 1) * tile
            ] = codec.decode(bytes(r["bytes"]))[0]
        # untiled reference through the single-image operator
        df = _img_df(spark, plane, transform=gt)
        want = codec.decode(
            bytes(
                transforms.apply_transforms(
                    df, [proximity.proximity(maxdist=maxdist)], out_fmt="raw"
                ).first()["bytes"]
            )
        )[0]
        assert np.array_equal(got, want), maxdist


def test_proximity_grid_validation(spark):
    import pytest as _pytest
    gt = [0.25, 0.0, -10.0, 0.0, -0.25, 60.0]
    with _pytest.raises(ValueError):
        proximity.proximity_grid(None, gt, tile=8, maxdist=9.0)
