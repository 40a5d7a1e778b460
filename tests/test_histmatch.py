"""Histogram matching vs a brute per-band rank-mapping oracle."""

import numpy as np

from ukis_pysat_spark import codec, datagen
from ukis_pysat_spark.operators import histmatch


def _img(spark, iid, arr, nodata):
    return spark.createDataFrame(
        [(
            iid, bytes(codec.encode(arr, "raw")), arr.shape[2], arr.shape[1],
            "raw", "", 0, arr.shape[0], "float64", "EPSG:4326",
            [0.25, 0.0, 0.0, 0.0, -0.25, 0.0], nodata,
            [0.0, 1.0, 1.0, 0.0, 0.0], [0.0, 0.0, -1.0, -1.0, 0.0], "X",
        )],
        datagen.IMAGES_SCHEMA,
    )


def _brute(src, rv, nod):
    out = src.copy()
    va = sorted(v for v in src.ravel() if v != nod)
    rs = sorted(rv)
    if not va or not rs:
        return out
    na, nr = len(va), len(rs)
    for i, v in enumerate(src.ravel()):
        if v == nod:
            continue
        pos = sum(1 for u in va if u <= v)
        j = (pos * nr + na - 1) // na
        out.ravel()[i] = rs[j - 1]
    return out


def test_match_histogram_differential(spark):
    rng = np.random.Generator(np.random.Philox(key=np.uint64(79)))
    src = rng.integers(1, 50, size=(2, 6, 7)).astype(np.float64)
    src[rng.random((2, 6, 7)) < 0.2] = 0.0
    ref = rng.integers(100, 220, size=(2, 9, 4)).astype(np.float64)
    ref[rng.random((2, 9, 4)) < 0.3] = -1.0  # different nodata AND grid
    out_df = histmatch.match_histogram(
        _img(spark, "a", src, 0.0), _img(spark, "a", ref, -1.0)
    )
    row = out_df.first()
    got = codec.decode(bytes(row["bytes"]))
    assert row["nodata"] == 0.0 and got.shape == src.shape
    for b in range(2):
        want = _brute(src[b], [v for v in ref[b].ravel() if v != -1.0], 0.0)
        assert np.array_equal(got[b], want), b
    # monotone + range: outputs are reference values, order preserved
    ok = src[0] != 0.0
    assert set(np.unique(got[0][ok])) <= set(ref[0][ref[0] != -1.0].ravel())
    o_in = np.argsort(src[0][ok], kind="stable")
    assert np.all(np.diff(got[0][ok][o_in]) >= 0)


def test_match_histogram_identity_and_errors(spark):
    import pytest
    src = np.arange(24, dtype=np.float64).reshape(1, 4, 6) + 1.0
    # matching an image to itself is the identity (j == pos)
    row = histmatch.match_histogram(
        _img(spark, "a", src, 0.0), _img(spark, "a", src, 0.0)
    ).first()
    assert np.array_equal(codec.decode(bytes(row["bytes"])), src)
    # band mismatch raises
    bad = np.zeros((2, 4, 6))
    with pytest.raises(Exception, match="band mismatch"):
        histmatch.match_histogram(
            _img(spark, "a", src, 0.0), _img(spark, "a", bad, 0.0)
        ).first()
