"""fillnodata (nearest-valid fill) vs brute-force lexicographic argmin."""

import numpy as np

from ukis_pysat_spark import codec
from ukis_pysat_spark.operators import proximity, transforms
from tests.test_terrain import _img_df


def _brute_fill(plane, nod, maxdist=None):
    h, w = plane.shape
    vr, vc = np.nonzero(plane != nod)
    out = plane.copy()
    if vr.size == 0:
        return out
    for r in range(h):
        for c in range(w):
            if plane[r, c] != nod:
                continue
            d2 = (vr - r) ** 2 + (vc - c) ** 2
            # argmin over (d2, src_r, src_c)
            order = np.lexsort((vc, vr, d2))
            i = order[0]
            if maxdist is not None and np.sqrt(d2[i]) > maxdist:
                continue
            out[r, c] = plane[vr[i], vc[i]]
    return out


def _run(spark, plane, nodata=0.0, **kw):
    df = _img_df(spark, plane, nodata=nodata)
    out = transforms.apply_transforms(
        df, [proximity.fillnodata(**kw)], out_fmt="raw"
    )
    return codec.decode(bytes(out.first()["bytes"]))[0]


def test_fillnodata_differential_random(spark):
    rng = np.random.Generator(np.random.Philox(key=np.uint64(41)))
    for trial in range(4):
        plane = rng.integers(1, 50, size=(10, 13)).astype(np.float64)
        plane[rng.random((10, 13)) < 0.45] = 0.0
        got = _run(spark, plane)
        want = _brute_fill(plane, 0.0)
        assert np.array_equal(got, want), trial
        got_md = _run(spark, plane, maxdist=2.0)
        want_md = _brute_fill(plane, 0.0, maxdist=2.0)
        assert np.array_equal(got_md, want_md), trial


def test_fillnodata_ties_are_lexicographic(spark):
    # nodata center equidistant from 4 valid pixels: (row, col) rule
    # picks the top one
    plane = np.zeros((5, 5))
    plane[1, 2], plane[3, 2], plane[2, 1], plane[2, 3] = 10.0, 20.0, 30.0, 40.0
    got = _run(spark, plane)
    assert got[2, 2] == 10.0  # src (1, 2) is lexicographically smallest


def test_fillnodata_untouched_cases(spark):
    full = np.full((4, 4), 3.0)
    assert np.array_equal(_run(spark, full), full)
    empty = np.zeros((4, 4))
    assert np.array_equal(_run(spark, empty), empty)
    # out-of-reach pixels stay nodata
    plane = np.zeros((3, 9))
    plane[1, 0] = 5.0
    got = _run(spark, plane, maxdist=1.0)
    assert got[1, 1] == 5.0 and got[1, 8] == 0.0
