"""GLCM texture features vs a brute per-pair python oracle."""

import numpy as np

from ukis_pysat_spark import codec, datagen
from ukis_pysat_spark.operators import texture


def _img(spark, arr, nodata):
    return spark.createDataFrame(
        [(
            "g0", bytes(codec.encode(arr, "raw")), arr.shape[2], arr.shape[1],
            "raw", "", 0, arr.shape[0], "float64", "EPSG:4326",
            [0.25, 0.0, 0.0, 0.0, -0.25, 0.0], nodata,
            [0.0, 1.0, 1.0, 0.0, 0.0], [0.0, 0.0, -1.0, -1.0, 0.0], "X",
        )],
        datagen.IMAGES_SCHEMA,
    )


def _brute(z, nod, L, dr, dc):
    h, w = z.shape
    valid = z != nod if nod is not None else np.ones_like(z, bool)
    if not valid.any():
        return None
    mn, mx = z[valid].min(), z[valid].max()
    pairs = {}
    for r in range(h):
        for c in range(w):
            r2, c2 = r + dr, c + dc
            if not (0 <= r2 < h and 0 <= c2 < w):
                continue
            if not (valid[r, c] and valid[r2, c2]):
                continue
            def qb(v):
                if mx == mn:
                    return 0
                return min(int(np.floor((v - mn) * float(L) / (mx - mn))), L - 1)
            key = (qb(z[r, c]), qb(z[r2, c2]))
            pairs[key] = pairs.get(key, 0) + 1
    N = sum(pairs.values())
    if N == 0:
        return None
    con = sum(n * (i - j) ** 2 for (i, j), n in pairs.items())
    dis = sum(n * abs(i - j) for (i, j), n in pairs.items())
    hom = sum(n * 1048576 // (1 + (i - j) ** 2) for (i, j), n in pairs.items())
    en = sum(n * n for n in pairs.values())
    return (N, float(con) / N, float(dis) / N,
            hom / 1048576.0 / N, float(en) / (N * N))


def test_glcm_differential(spark):
    rng = np.random.Generator(np.random.Philox(key=np.uint64(89)))
    z = rng.integers(1, 200, size=(2, 7, 9)).astype(np.float64)
    z[rng.random((2, 7, 9)) < 0.2] = 0.0
    for dr, dc in [(0, 1), (1, 0), (1, 1), (1, -1)]:
        got = {
            r["band"]: (r["n_pairs"], r["contrast"], r["dissimilarity"],
                        r["homogeneity"], r["energy"])
            for r in texture.glcm_features(
                _img(spark, z, 0.0), levels=16, dr=dr, dc=dc
            ).collect()
        }
        for b in range(2):
            want = _brute(z[b], 0.0, 16, dr, dc)
            assert got[b] == want, (dr, dc, b)


def test_glcm_closed_forms(spark):
    # constant plane: one pair bin (0,0) -> contrast 0, homog 1, energy 1
    const = np.full((1, 4, 6), 9.0)
    r = texture.glcm_features(_img(spark, const, None)).first()
    assert (r["contrast"], r["dissimilarity"]) == (0.0, 0.0)
    assert r["homogeneity"] == 1.0 and r["energy"] == 1.0
    assert r["n_pairs"] == 4 * 5
    # alternating columns at the two extreme bins: every east pair
    # jumps |i-j| = 15 -> contrast 225, dissimilarity 15
    alt = np.tile(np.array([0.0, 15.0]), (4, 3))[None]
    r = texture.glcm_features(_img(spark, alt, None), levels=16).first()
    assert r["contrast"] == 225.0 and r["dissimilarity"] == 15.0
    import pytest as _pt
    with _pt.raises(ValueError):
        texture.glcm_features(_img(spark, const, None), levels=1)
    with _pt.raises(ValueError):
        texture.glcm_features(_img(spark, const, None), dr=0, dc=0)
