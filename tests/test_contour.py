"""Marching-squares contour vs a per-cell python reference + geometric
sanity fixtures."""

import numpy as np

from ukis_pysat_spark.operators import contour
from tests.test_terrain import _img_df

_T = [0.5, 0.0, -10.0, 0.0, -0.5, 60.0]


def _ref_segments(plane, nod, level, transform):
    """Per-cell scalar replay of the documented marching-squares spec."""
    a, _, c0, _, e, f0 = transform
    h, w = plane.shape
    xs = c0 + (np.arange(w) + 0.5) * a
    ys = f0 + (np.arange(h) + 0.5) * e
    segs = []
    cases = {
        1: [(3, 2)], 14: [(3, 2)], 2: [(2, 1)], 13: [(2, 1)],
        3: [(3, 1)], 12: [(3, 1)], 4: [(0, 1)], 11: [(0, 1)],
        6: [(0, 2)], 9: [(0, 2)], 7: [(0, 3)], 8: [(0, 3)],
    }
    for r in range(h - 1):
        for c in range(w - 1):
            z = {
                "tl": plane[r, c], "tr": plane[r, c + 1],
                "bl": plane[r + 1, c], "br": plane[r + 1, c + 1],
            }
            if nod is not None and any(v == nod for v in z.values()):
                continue
            idx = (
                8 * (z["tl"] > level) + 4 * (z["tr"] > level)
                + 2 * (z["br"] > level) + 1 * (z["bl"] > level)
            )
            if idx in (0, 15):
                continue

            def pt(edge):
                if edge == 0:
                    t = (level - z["tl"]) / (z["tr"] - z["tl"])
                    return (xs[c] + t * (xs[1] - xs[0]), ys[r])
                if edge == 1:
                    t = (level - z["tr"]) / (z["br"] - z["tr"])
                    return (xs[c + 1], ys[r] + t * (ys[1] - ys[0]))
                if edge == 2:
                    t = (level - z["bl"]) / (z["br"] - z["bl"])
                    return (xs[c] + t * (xs[1] - xs[0]), ys[r + 1])
                t = (level - z["tl"]) / (z["bl"] - z["tl"])
                return (xs[c], ys[r] + t * (ys[1] - ys[0]))

            if idx in (5, 10):
                above = (z["tl"] + z["tr"] + z["bl"] + z["br"]) / 4.0 > level
                if (idx == 5 and above) or (idx == 10 and not above):
                    pairs = [(3, 0), (1, 2)]
                else:
                    pairs = [(0, 1), (2, 3)]
            else:
                pairs = cases[idx]
            for ea, eb in pairs:
                pa_, pb = pt(ea), pt(eb)
                if (pb[0], pb[1]) < (pa_[0], pa_[1]):
                    pa_, pb = pb, pa_
                segs.append((r, c, pa_[0], pa_[1], pb[0], pb[1]))
    return sorted(segs)


def _got(spark, plane, levels, nodata=0.0):
    df = _img_df(spark, plane, transform=_T, nodata=nodata)
    rows = contour.contour(df, levels).collect()
    return rows


def test_contour_differential_random(spark):
    rng = np.random.Generator(np.random.Philox(key=np.uint64(61)))
    plane = rng.integers(0, 20, size=(9, 12)).astype(np.float64)
    plane[rng.random((9, 12)) < 0.1] = 0.0
    for level in (4.5, 10.5):
        rows = _got(spark, plane, [level])
        got = sorted(
            (r["r"], r["c"], r["x0"], r["y0"], r["x1"], r["y1"]) for r in rows
        )
        want = _ref_segments(plane, 0.0, level, _T)
        assert got == want, level


def test_contour_peak_is_closed_loop(spark):
    plane = np.zeros((5, 5))
    plane[2, 2] = 10.0
    rows = _got(spark, plane, [5.0], nodata=None)
    assert len(rows) == 4  # diamond around the peak
    # every endpoint appears exactly twice -> closed loop
    from collections import Counter
    ends = Counter()
    for r in rows:
        ends[(r["x0"], r["y0"])] += 1
        ends[(r["x1"], r["y1"])] += 1
    assert all(v == 2 for v in ends.values()), ends


def test_contour_linear_ramp_on_level_line(spark):
    # plane = x in map coords: the level-(-8.875) isoline is the
    # vertical line x = -8.875, crossing every cell row once
    w, h = 8, 6
    xs = -10.0 + (np.arange(w) + 0.5) * 0.5
    plane = np.broadcast_to(xs[None, :], (h, w)).copy()
    rows = _got(spark, plane, [-8.875], nodata=None)
    assert len(rows) == h - 1
    for r in rows:
        assert r["x0"] == -8.875 and r["x1"] == -8.875


def test_contour_saddle_and_validation(spark):
    # checkerboard 2x2: both saddle resolutions exercised
    plane = np.array([[10.0, 0.0], [0.0, 10.0]])
    rows = _got(spark, plane, [4.0], nodata=None)  # center 5 > 4
    assert len(rows) == 2
    rows2 = _got(spark, plane, [6.0], nodata=None)  # center 5 < 6
    assert len(rows2) == 2
    # the two resolutions pair different edges
    k1 = sorted((r["x0"], r["y0"], r["x1"], r["y1"]) for r in rows)
    k2 = sorted((r["x0"], r["y0"], r["x1"], r["y1"]) for r in rows2)
    assert k1 != k2
    import pytest as _pytest
    with _pytest.raises(ValueError):
        contour.contour(None, [])
