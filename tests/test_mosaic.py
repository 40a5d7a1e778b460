"""Mosaic compositing vs an independent numpy brute force.

Oracle: for every target grid pixel, gather the selected band value of
every scene whose source cell contains the pixel center (nodata
dropped), then reduce — no tiling, no window logic shared with the
operator.
"""

import numpy as np
import pytest

from ukis_pysat_spark import codec, datagen
from ukis_pysat_spark.operators import mosaic


def _np_composite(pdf, grid_transform, grid_w, grid_h, band, method, nodata_out=0.0):
    ga, _, gc, _, ge, gf = grid_transform
    xs = gc + (np.arange(grid_w) + 0.5) * ga
    ys = gf + (np.arange(grid_h) + 0.5) * ge
    stacks = [[[] for _ in range(grid_w)] for _ in range(grid_h)]
    for _, img in pdf.iterrows():
        arr = codec.decode(img["bytes"]).astype(np.float64)
        nb, sh, sw = arr.shape
        plane = arr[min(band, nb - 1)]
        a, _b, c, _d, e, f_ = img["transform"]
        nod = img["nodata"]
        for gr in range(grid_h):
            sr = int(np.floor((ys[gr] - f_) / e))
            if not (0 <= sr < sh):
                continue
            for gcol in range(grid_w):
                sc = int(np.floor((xs[gcol] - c) / a))
                if not (0 <= sc < sw):
                    continue
                v = plane[sr, sc]
                if nod is None or v != nod:
                    stacks[gr][gcol].append(v)
    out = np.full((grid_h, grid_w), nodata_out)
    red = {
        "median": np.median,
        "mean": np.mean,
        "min": np.min,
        "max": np.max,
        "count": len,
    }[method]
    for gr in range(grid_h):
        for gcol in range(grid_w):
            if stacks[gr][gcol]:
                out[gr, gcol] = float(red(stacks[gr][gcol]))
    return out


def _assemble(rows, grid_w, grid_h, tile, gt, nodata_out=0.0):
    """Stitch the per-tile outputs back into one grid for comparison."""
    full = np.full((grid_h, grid_w), nodata_out)
    for r in rows:
        c = codec.decode(r["bytes"])[0]
        c0, r0 = r["tx"] * tile, r["ty"] * tile
        full[r0 : r0 + r["h"], c0 : c0 + r["w"]] = c
        assert r["transform"][2] == pytest.approx(gt[2] + c0 * gt[0])
        assert r["transform"][5] == pytest.approx(gt[5] + r0 * gt[4])
    return full


def _overlap_corpus(spark):
    """12 rng scenes (2 bands, 0.1-deg pixels) on a half-overlapping
    lattice over [0, 7.5] x [4, 8] — every grid pixel sees 0-4 scenes.
    Returns (spark DF, pandas-like list of dicts for the oracle)."""
    recs = []
    for i in range(12):
        arr = datagen.pixels_for(i, 2, 20, 30, "uint16", seed=11)
        ox = (i % 4) * 1.5
        oy = 8.0 - (i // 4) * 1.0
        recs.append(
            {
                "image_id": f"s{i:02d}",
                "bytes": codec.encode(arr, "raw"),
                "w": 30,
                "h": 20,
                "transform": [0.1, 0.0, ox, 0.0, -0.1, oy],
                "nodata": 0.0,
            }
        )
    df = spark.createDataFrame(
        [
            (
                r["image_id"],
                bytearray(r["bytes"]),
                r["w"],
                r["h"],
                r["transform"],
                r["nodata"],
            )
            for r in recs
        ],
        "image_id string, bytes binary, w int, h int, "
        "transform array<double>, nodata double",
    )
    return df, recs


class _Rows:
    def __init__(self, recs):
        self._recs = recs

    def iterrows(self):
        return ((i, r) for i, r in enumerate(self._recs))


@pytest.mark.parametrize("method", ["median", "count", "max"])
def test_composite_matches_numpy_bruteforce(spark, method):
    imgs, recs = _overlap_corpus(spark)
    # 0.07-deg grid (deliberately NOT aligned to the 0.1 source grid)
    # over the corpus; 37x29 pixels with tile=16 exercises partial
    # edge tiles
    gt = [0.07, 0.0, 5.2, 0.0, -0.07, 8.1]
    gw, gh, tile = 37, 29, 16
    rows = mosaic.composite(
        imgs, gt, gw, gh, tile=tile, method=method, band=1
    ).collect()
    exp = _np_composite(_Rows(recs), gt, gw, gh, 1, method)
    got = _assemble(rows, gw, gh, tile, gt)
    np.testing.assert_allclose(got, exp, rtol=0, atol=0)
    assert exp.any() and len(rows) > 1  # corpus genuinely composites


def test_composite_exact_median_overlap(spark):
    """Closed-form three-scene overlap: exact medians, nodata holes,
    partial coverage, and even-count interpolation."""
    rows = []
    for i, (ox, oy) in enumerate([(0.0, 6.0), (2.0, 6.0), (1.0, 5.0)]):
        arr = np.full((1, 4, 4), float(i + 1))
        arr[0, 0, 0] = 0.0  # nodata pixel in the top-left source cell
        rows.append(
            (
                f"s{i}",
                bytearray(codec.encode(arr.astype(np.float64), "raw")),
                4,
                4,
                [1.0, 0.0, ox, 0.0, -1.0, oy],
                0.0,
            )
        )
    imgs = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, "
        "transform array<double>, nodata double",
    )
    out = mosaic.composite(
        imgs, [1.0, 0.0, 0.0, 0.0, -1.0, 6.0], 6, 6, tile=6, method="median"
    ).collect()
    assert len(out) == 1 and out[0]["n_scenes"] == 3
    got = codec.decode(out[0]["bytes"])[0]
    exp = np.array(
        [
            [0.0, 1.0, 1.0, 1.5, 2.0, 2.0],
            [1.0, 1.0, 2.0, 2.0, 2.5, 2.0],
            [1.0, 2.0, 2.0, 2.0, 2.5, 2.0],
            [1.0, 2.0, 2.0, 2.0, 2.5, 2.0],
            [0.0, 3.0, 3.0, 3.0, 3.0, 0.0],
            [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        ]
    )
    np.testing.assert_array_equal(got, exp)


def test_composite_mean_and_dtype(spark):
    """mean reduction + non-default out_dtype round trip."""
    rows = []
    for i in range(4):
        arr = np.full((1, 2, 2), float(10 * (i + 1)))
        rows.append(
            (
                f"s{i}",
                bytearray(codec.encode(arr.astype(np.float64), "raw")),
                2,
                2,
                [1.0, 0.0, 0.0, 0.0, -1.0, 2.0],
                None,
            )
        )
    imgs = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, "
        "transform array<double>, nodata double",
    )
    out = mosaic.composite(
        imgs,
        [1.0, 0.0, 0.0, 0.0, -1.0, 2.0],
        2,
        2,
        tile=2,
        method="mean",
        out_dtype="float32",
    ).collect()
    assert len(out) == 1
    c = codec.decode(out[0]["bytes"])
    assert c.dtype == np.float32
    np.testing.assert_array_equal(c[0], np.full((2, 2), 25.0, dtype=np.float32))
    with pytest.raises(ValueError):
        mosaic.composite(imgs, [1.0, 0.0, 0.0, 0.0, -1.0, 2.0], 2, 2, method="mode")
