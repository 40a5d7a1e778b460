"""Weighted-Brovey pansharpening vs a brute numpy oracle."""

import numpy as np
import pytest

from ukis_pysat_spark import codec
from ukis_pysat_spark.operators import pansharpen
from tests.test_terrain import _img_df


def _pan_df(spark, plane, transform, iid="t0", nodata=0.0):
    return _img_df(spark, plane[None, :, :], transform=transform, nodata=nodata, iid=iid)


def test_pansharpen_differential(spark):
    rng = np.random.Generator(np.random.Philox(key=np.uint64(71)))
    ms = rng.integers(1, 200, size=(3, 5, 6)).astype(np.float64)
    ms[0, 0, 0] = 0.0  # one nodata ms pixel
    f = 2
    pan = rng.integers(10, 300, size=(10, 12)).astype(np.float64)
    pan[3, 3] = 0.0  # one nodata pan pixel
    t_ms = [0.5, 0.0, -10.0, 0.0, -0.5, 60.0]
    t_pan = [0.25, 0.0, -10.0, 0.0, -0.25, 60.0]
    ms_df = _img_df(spark, ms, transform=t_ms)
    pan_df = _pan_df(spark, pan, t_pan)
    out = pansharpen.pansharpen(ms_df, pan_df, weights=[0.25, 0.5, 0.25])
    row = out.first()
    got = codec.decode(bytes(row["bytes"]))
    assert got.shape == (3, 10, 12)
    assert row["transform"] == t_pan and row["nodata"] == 0.0

    wts = np.array([0.25, 0.5, 0.25])
    up = np.repeat(np.repeat(ms, f, axis=1), f, axis=2)
    pseudo = np.einsum("b,bij->ij", wts, up)
    valid = (pseudo != 0) & ~(up == 0.0).any(axis=0) & (pan != 0.0)
    want = np.where(valid, up * np.where(valid, pan / np.where(pseudo == 0, 1, pseudo), 0.0), 0.0)
    assert np.allclose(got, want, rtol=1e-14, atol=0)
    assert np.all(got[:, 0, 0] == 0.0)  # ms-nodata block
    assert np.all(got[:, 3, 3] == 0.0)  # pan-nodata pixel


def test_pansharpen_grid_validation(spark):
    ms = np.ones((2, 4, 4))
    pan = np.ones((9, 9))
    t_ms = [0.5, 0.0, -10.0, 0.0, -0.5, 60.0]
    t_pan = [0.25, 0.0, -10.0, 0.0, -0.25, 60.0]
    with pytest.raises(Exception, match="integer multiple"):
        pansharpen.pansharpen(
            _img_df(spark, ms, transform=t_ms),
            _pan_df(spark, pan, t_pan),
        ).collect()
    # mismatched origin
    pan2 = np.ones((8, 8))
    t_bad = [0.25, 0.0, -9.0, 0.0, -0.25, 60.0]
    with pytest.raises(Exception, match="transforms disagree"):
        pansharpen.pansharpen(
            _img_df(spark, ms, transform=t_ms),
            _pan_df(spark, pan2, t_bad),
        ).collect()
    with pytest.raises(Exception, match="weights"):
        pansharpen.pansharpen(
            _img_df(spark, ms, transform=t_ms),
            _pan_df(spark, np.ones((8, 8)), t_pan),
            weights=[1.0],
        ).collect()
