"""Terrain (slope/aspect/hillshade) and focal stats vs brute-force
numpy/python oracles, plus the to_pixels materializer."""

import math

import numpy as np
import pytest

from ukis_pysat_spark import codec
from ukis_pysat_spark.operators import pixels, terrain, transforms

_T = [0.5, 0.0, -10.0, 0.0, -0.5, 60.0]


def _img_df(spark, arr, transform=_T, nodata=0.0, crs="EPSG:4326", iid="t0"):
    arr = codec.promote_3d(np.asarray(arr))
    nb, h, w = arr.shape
    a, _, c, _, e, f_ = transform
    x1, y1 = c + w * a, f_ + h * e
    return spark.createDataFrame(
        [
            (
                iid,
                bytearray(codec.encode(arr, "raw")),
                w,
                h,
                "raw",
                None,
                0,
                nb,
                str(arr.dtype),
                crs,
                [float(v) for v in transform],
                nodata,
                [c, x1, x1, c, c],
                [f_, f_, y1, y1, f_],
                "Sentinel2",
            )
        ],
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long, bands int, dtype string, crs string, "
        "transform array<double>, nodata double, "
        "footprint_lon array<double>, footprint_lat array<double>, "
        "platform string",
    )


def _one(spark, arr, fns, **kw):
    df = transforms.apply_transforms(_img_df(spark, arr, **kw), fns, out_fmt="raw")
    row = df.first()
    return codec.decode(bytes(row["bytes"])), row


def _brute_horn(z, xres, yres, nod):
    """Reference 3x3 loop: nodata neighbors replaced by center, nodata
    centers and edges -> None."""
    h, w = z.shape
    p = np.full((h, w), np.nan)
    q = np.full((h, w), np.nan)
    ok = np.zeros((h, w), bool)
    for r in range(1, h - 1):
        for c in range(1, w - 1):
            zc = z[r, c]
            if nod is not None and zc == nod:
                continue
            win = {}
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    v = z[r + dr, c + dc]
                    if nod is not None and v == nod:
                        v = zc
                    win[(dr, dc)] = v
            p[r, c] = (
                (win[(-1, 1)] + 2 * win[(0, 1)] + win[(1, 1)])
                - (win[(-1, -1)] + 2 * win[(0, -1)] + win[(1, -1)])
            ) / (8 * xres)
            q[r, c] = (
                (win[(1, -1)] + 2 * win[(1, 0)] + win[(1, 1)])
                - (win[(-1, -1)] + 2 * win[(-1, 0)] + win[(-1, 1)])
            ) / (8 * yres)
            ok[r, c] = True
    return p, q, ok


def test_slope_aspect_on_planes(spark):
    h, w = 8, 9
    a, e = _T[0], _T[4]
    xs = (np.arange(w) + 0.5) * a
    ys = (np.arange(h) + 0.5) * e
    for gx, gy in [(2.0, 0.0), (0.0, 3.0), (2.0, 3.0), (-1.5, 0.5), (0.0, 0.0)]:
        z = gx * xs[None, :] + gy * ys[:, None] + 100.0
        out, _ = _one(spark, z, [terrain.slope()], nodata=None)
        interior = out[0, 1:-1, 1:-1]
        want = math.degrees(math.atan(math.hypot(gx, gy)))
        assert np.allclose(interior, want, atol=1e-9)
        assert np.all(out[0, 0, :] == -9999.0) and np.all(out[0, :, 0] == -9999.0)

        asp, _ = _one(spark, z, [terrain.aspect()], nodata=None)
        inner = asp[0, 1:-1, 1:-1]
        if gx == 0.0 and gy == 0.0:
            assert np.all(inner == -9999.0)
        else:
            want_az = math.degrees(math.atan2(-gx, -gy)) % 360.0
            assert np.allclose(inner, want_az, atol=1e-9)

    # percent mode
    z = 2.0 * xs[None, :] + 100.0
    pct, _ = _one(spark, z, [terrain.slope(percent=True)], nodata=None)
    assert np.allclose(pct[0, 1:-1, 1:-1], 200.0, atol=1e-9)


def test_terrain_nodata_differential(spark):
    rng = np.random.Generator(np.random.Philox(key=np.uint64(7)))
    z = rng.integers(1, 500, size=(10, 12)).astype(np.float64)
    z[rng.random((10, 12)) < 0.25] = 0.0  # nodata holes
    a, e = _T[0], _T[4]
    p, q, ok = _brute_horn(z, a, e, 0.0)

    out, row = _one(spark, z, [terrain.slope()])
    assert row["nodata"] == -9999.0
    got = out[0]
    want = np.where(ok, np.degrees(np.arctan(np.sqrt(p * p + q * q))), -9999.0)
    want[0, :] = want[-1, :] = -9999.0
    want[:, 0] = want[:, -1] = -9999.0
    assert np.allclose(np.where(np.isnan(want), -9999.0, want), got, atol=1e-9)

    asp, _ = _one(spark, z, [terrain.aspect()])
    d = np.degrees(np.arctan2(-p, -q))
    d = np.where(d < 0, d + 360.0, d)
    d = np.where((p == 0) & (q == 0), -9999.0, d)
    want = np.where(ok, d, -9999.0)
    want[0, :] = want[-1, :] = -9999.0
    want[:, 0] = want[:, -1] = -9999.0
    assert np.allclose(np.where(np.isnan(want), -9999.0, want), asp[0], atol=1e-9)

    hs, hrow = _one(spark, z, [terrain.hillshade()])
    assert hrow["dtype"] == "uint8" and hrow["nodata"] == 0.0
    sin_alt, c_east, c_north = terrain.hillshade_constants()
    cos_i = (sin_alt - p * c_east - q * c_north) / np.sqrt(1.0 + p * p + q * q)
    shade = np.floor(1.0 + 254.0 * np.maximum(cos_i, 0.0) + 0.5)
    want = np.where(ok, shade, 0.0)
    want[0, :] = want[-1, :] = 0.0
    want[:, 0] = want[:, -1] = 0.0
    assert np.array_equal(np.where(np.isnan(want), 0.0, want).astype(np.uint8), hs[0])
    assert hs.min() >= 0 and hs.max() <= 255


def test_hillshade_sun_orientation(spark):
    # NW-facing slope (rises to the SE) should be brighter than the
    # SE-facing mirror under the default 315-deg sun
    h, w = 8, 8
    xs = (np.arange(w) + 0.5) * _T[0]
    ys = (np.arange(h) + 0.5) * _T[4]
    # zp: dz/dx=+1, dz/dy=-1 -> downslope (-1, +1) points NW
    zp = 1.0 * xs[None, :] - 1.0 * ys[:, None]
    toward, _ = _one(spark, zp, [terrain.hillshade()], nodata=None)
    away, _ = _one(spark, -zp, [terrain.hillshade()], nodata=None)
    assert toward[0, 2, 2] > away[0, 2, 2]


def test_focal_differential(spark):
    rng = np.random.Generator(np.random.Philox(key=np.uint64(11)))
    z = rng.integers(1, 100, size=(2, 7, 9)).astype(np.float64)
    z[rng.random((2, 7, 9)) < 0.3] = 0.0
    for size in (3, 5):
        brute = {}
        nb, h, w = z.shape
        r = size // 2
        for b in range(nb):
            for rr in range(h):
                for cc in range(w):
                    win = z[
                        b,
                        max(rr - r, 0) : min(rr + r + 1, h),
                        max(cc - r, 0) : min(cc + r + 1, w),
                    ]
                    v = win[win != 0.0]
                    brute[(b, rr, cc)] = v
        for stat in ("sum", "count", "min", "max", "mean"):
            out, _ = _one(spark, z, [terrain.focal(stat, size)])
            for (b, rr, cc), v in brute.items():
                got = out[b, rr, cc]
                if v.size == 0:
                    want = 0.0 if stat == "count" else -9999.0
                elif stat == "sum":
                    want = v.sum()
                elif stat == "count":
                    want = v.size
                elif stat == "min":
                    want = v.min()
                elif stat == "max":
                    want = v.max()
                else:
                    want = v.sum() / v.size
                assert got == pytest.approx(want, rel=1e-12), (stat, size, b, rr, cc)


def test_tri_tpi_roughness_differential(spark):
    """TRI (both algs), TPI, roughness vs a brute 3x3 loop with nodata
    holes — same window rule as the Horn family (nodata neighbor ->
    center, nodata center / edges -> out nodata)."""
    rng = np.random.Generator(np.random.Philox(key=np.uint64(13)))
    z = rng.integers(1, 500, size=(9, 11)).astype(np.float64)
    z[rng.random((9, 11)) < 0.25] = 0.0
    h, w = z.shape

    brute = {k: np.full((h, w), -9999.0) for k in ("riley", "wilson", "tpi", "rough")}
    for r in range(1, h - 1):
        for c in range(1, w - 1):
            zc = z[r, c]
            if zc == 0.0:
                continue
            nb = []
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    if dr == 0 and dc == 0:
                        continue
                    v = z[r + dr, c + dc]
                    nb.append(zc if v == 0.0 else v)
            brute["riley"][r, c] = math.sqrt(sum((v - zc) ** 2 for v in nb))
            brute["wilson"][r, c] = sum(abs(v - zc) for v in nb) / 8.0
            brute["tpi"][r, c] = zc - sum(nb) / 8.0
            brute["rough"][r, c] = max(nb + [zc]) - min(nb + [zc])

    for key, fn in [
        ("riley", terrain.tri()),
        ("wilson", terrain.tri("Wilson")),
        ("tpi", terrain.tpi()),
        ("rough", terrain.roughness()),
    ]:
        out, row = _one(spark, z, [fn])
        assert row["nodata"] == -9999.0
        assert np.array_equal(out[0], brute[key]), key

    with pytest.raises(ValueError, match="TRI algorithm"):
        terrain.tri("riley")  # case-sensitive, like gdaldem -alg


def test_tri_flat_and_step(spark):
    # flat plane: every ruggedness measure is exactly zero inside
    flat = np.full((6, 6), 42.0)
    for fn in (terrain.tri(), terrain.tri("Wilson"), terrain.tpi(), terrain.roughness()):
        out, _ = _one(spark, flat, [fn], nodata=None)
        assert np.all(out[0, 1:-1, 1:-1] == 0.0)
    # unit step along x: closed-form values on the step columns
    step = np.where(np.arange(6)[None, :] >= 3, 1.0, 0.0) * np.ones((6, 1))
    out, _ = _one(spark, step, [terrain.roughness()], nodata=None)
    assert np.all(out[0, 1:-1, 2:4] == 1.0)  # columns adjacent to the step
    assert np.all(out[0, 1:-1, 1] == 0.0)


def test_focal_validation():
    with pytest.raises(ValueError):
        terrain.focal("mean", 4)
    with pytest.raises(ValueError):
        terrain.focal("median", 3)


def test_to_pixels_roundtrip(spark):
    rng = np.random.Generator(np.random.Philox(key=np.uint64(3)))
    arr = rng.integers(0, 200, size=(3, 5, 6)).astype(np.uint16)
    df = _img_df(spark, arr)
    rows = pixels.to_pixels(df).collect()
    assert len(rows) == 3 * 5 * 6
    a, _, c0, _, e, f0 = _T
    for r in rows:
        assert r["val"] == float(arr[r["band"], r["r"], r["c"]])
        assert r["x"] == pytest.approx(c0 + (r["c"] + 0.5) * a, abs=0)
        assert r["y"] == pytest.approx(f0 + (r["r"] + 0.5) * e, abs=0)

    kept = pixels.to_pixels(df, drop_nodata=True).collect()
    assert len(kept) == int((arr != 0).sum())
    assert all(r["val"] != 0.0 for r in kept)

    b1 = pixels.to_pixels(df, band=1).collect()
    assert len(b1) == 5 * 6 and all(r["band"] == 1 for r in b1)


def test_to_pixels_shear_transform(spark):
    arr = np.arange(12, dtype=np.float64).reshape(1, 3, 4)
    t = [2.0, 0.5, 100.0, 0.25, -2.0, 50.0]
    rows = pixels.to_pixels(_img_df(spark, arr, transform=t, nodata=None)).collect()
    for r in rows:
        cf, rf = r["c"] + 0.5, r["r"] + 0.5
        assert r["x"] == pytest.approx(100.0 + cf * 2.0 + rf * 0.5, abs=0)
        assert r["y"] == pytest.approx(50.0 + cf * 0.25 + rf * -2.0, abs=0)


def test_color_relief_differential(spark):
    """interp + nearest modes vs a brute per-pixel loop, nodata -> nv."""
    ramp = [(0.0, 0, 0, 255), (100.0, 64, 128, 32), (300.0, 255, 200, 100)]
    rng = np.random.Generator(np.random.Philox(key=np.uint64(17)))
    z = rng.integers(1, 350, size=(6, 7)).astype(np.float64)
    z[rng.random((6, 7)) < 0.2] = 0.0
    z[0, 1] = 100.0  # exact breakpoint
    z[0, 2] = 340.0  # above last -> clamp

    def brute(v, mode):
        vs = [e[0] for e in ramp]
        if mode == "nearest":
            best = min(range(len(vs)), key=lambda i: (abs(v - vs[i]), i))
            return tuple(ramp[best][1:])
        if v <= vs[0]:
            return tuple(ramp[0][1:])
        if v >= vs[-1]:
            return tuple(ramp[-1][1:])
        hi = next(i for i in range(len(vs)) if vs[i] >= v)
        lo = hi - 1
        out = []
        for k in range(3):
            lc, hc = float(ramp[lo][1 + k]), float(ramp[hi][1 + k])
            out.append(
                math.floor(lc + (v - vs[lo]) * (hc - lc) / (vs[hi] - vs[lo]) + 0.5)
            )
        return tuple(out)

    for mode in ("interp", "nearest"):
        out, row = _one(
            spark, z, [terrain.color_relief(ramp, nv_color=(1, 2, 3), mode=mode)]
        )
        assert row["dtype"] == "uint8" and row["bands"] == 3
        assert row["nodata"] is None
        for r in range(6):
            for c in range(7):
                want = (1, 2, 3) if z[r, c] == 0.0 else brute(z[r, c], mode)
                assert tuple(out[:, r, c]) == want, (mode, r, c, z[r, c])

    with pytest.raises(ValueError, match="sorted"):
        terrain.color_relief([(10, 0, 0, 0), (5, 1, 1, 1)])
    with pytest.raises(ValueError, match="mode"):
        terrain.color_relief(ramp, mode="exact")


def test_stretch_differential(spark):
    rng = np.random.Generator(np.random.Philox(key=np.uint64(19)))
    z = rng.integers(1, 1000, size=(2, 8, 9)).astype(np.float64)
    z[rng.random((2, 8, 9)) < 0.2] = 0.0
    out, row = _one(spark, z, [transforms.stretch(2.0, 98.0)])
    assert row["dtype"] == "uint8" and row["nodata"] == 0.0
    for b in range(2):
        valid = np.sort(z[b][z[b] != 0.0])
        n = valid.size
        for q, name in ((0.02, "qlo"), (0.98, "qhi")):
            pass
        pos = (n - 1) * 0.02
        i = int(pos)
        qlo = valid[i] + (valid[i + 1] - valid[i]) * (pos - i)
        pos = (n - 1) * 0.98
        i = int(pos)
        f = pos - i
        qhi = valid[i] if f == 0.0 else valid[i] + (valid[i + 1] - valid[i]) * f
        # round-6 nodata reservation: valid pixels stretch into [1, 255]
        want = np.floor(1.0 + (z[b] - qlo) * 254.0 / (qhi - qlo) + 0.5)
        want = np.clip(want, 1.0, 255.0)
        want = np.where(z[b] == 0.0, 0.0, want).astype(np.uint8)
        assert np.array_equal(out[b], want), b
    # numpy's own linear quantile agrees to float tolerance
    valid = z[0][z[0] != 0.0]
    assert np.isclose(
        transforms._quantile_linear(np.sort(valid), 0.37),
        np.quantile(valid, 0.37, method="linear"),
        rtol=1e-12,
    )
    # min/max stretch: endpoints map exactly to dst ends
    mm, _ = _one(spark, z, [transforms.stretch(0.0, 100.0)])
    for b in range(2):
        valid = z[b][z[b] != 0.0]
        got_at_max = mm[b][z[b] == valid.max()]
        got_at_min = mm[b][z[b] == valid.min()]
        assert np.all(got_at_max == 255) and np.all(got_at_min == 1)
    # constant band -> the valid floor everywhere (degenerate range);
    # nodata=None means no reservation, so the floor is d0 = 0
    const = np.full((1, 4, 4), 7.0)
    cc, _ = _one(spark, const, [transforms.stretch(0.0, 100.0)], nodata=None)
    assert np.all(cc == 0)
    with pytest.raises(ValueError):
        transforms.stretch(50.0, 50.0)


def _brute_viewshed(z, orow, ocol, oh, nod, tz=0.0, maxdist=None):
    """Per-target python LOS replay with the same rational crossings."""
    h, w = z.shape
    out = np.zeros((h, w), dtype=np.uint8)
    if nod is not None and z[orow, ocol] == nod:
        return out
    zo = z[orow, ocol] + oh
    for r in range(h):
        for c in range(w):
            if nod is not None and z[r, c] == nod:
                continue
            dr, dc = r - orow, c - ocol
            d = max(abs(dr), abs(dc))
            if maxdist is not None and d > maxdist:
                continue
            vis = True
            for k in range(1, d):
                if abs(dr) >= abs(dc):
                    num = dc * k
                    off0 = num // d
                    rem = num - off0 * d
                    r0 = orow + (1 if dr > 0 else -1) * k
                    c0 = ocol + off0
                    r1, c1 = r0, min(c0 + 1, w - 1)
                else:
                    num = dr * k
                    off0 = num // d
                    rem = num - off0 * d
                    c0 = ocol + (1 if dc > 0 else -1) * k
                    r0 = orow + off0
                    r1, c1 = min(r0 + 1, h - 1), c0
                z0, z1 = z[r0, c0], z[r1, c1]
                if nod is not None and (z0 == nod or (rem != 0 and z1 == nod)):
                    continue
                zk = z0 + (z1 - z0) * rem / d
                if (zk - zo) * d > (z[r, c] + tz - zo) * k:
                    vis = False
                    break
            out[r, c] = 255 if vis else 0
    if maxdist is not None:
        for r in range(h):
            for c in range(w):
                if max(abs(r - orow), abs(c - ocol)) > maxdist:
                    out[r, c] = 0
    return out


def test_viewshed_differential(spark):
    rng = np.random.Generator(np.random.Philox(key=np.uint64(23)))
    z = rng.integers(1, 60, size=(11, 13)).astype(np.float64)
    z[rng.random((11, 13)) < 0.15] = 0.0
    z[5, 6] = 10.0  # valid observer cell
    out, row = _one(spark, z, [terrain.viewshed((5, 6), oh=2.0)])
    assert row["dtype"] == "uint8" and row["bands"] == 1 and row["nodata"] is None
    want = _brute_viewshed(z, 5, 6, 2.0, 0.0)
    assert np.array_equal(out[0], want)
    assert out[0, 5, 6] == 255  # observer sees itself
    # blocked and visible cells both occur
    valid = z != 0.0
    assert (out[0][valid] == 0).any() and (out[0][valid] == 255).any()

    # maxdist bounds the radius
    md, _ = _one(spark, z, [terrain.viewshed((5, 6), oh=2.0, maxdist=3)])
    assert np.array_equal(md[0], _brute_viewshed(z, 5, 6, 2.0, 0.0, maxdist=3))

    # observer on nodata -> all-zero mask
    z2 = z.copy()
    z2[5, 6] = 0.0
    nul, _ = _one(spark, z2, [terrain.viewshed((5, 6))])
    assert np.all(nul == 0)

    with pytest.raises(Exception, match="outside"):
        _one(spark, z, [terrain.viewshed((50, 6))])


def test_viewshed_geo_and_closed_form(spark):
    # ramp rising away from the observer: everything visible
    h, w = 7, 9
    ramp_up = np.add.outer(np.zeros(h), np.arange(w, dtype=float)) + 1.0
    out, _ = _one(spark, ramp_up, [terrain.viewshed((3, 0), oh=1.0)], nodata=None)
    assert np.all(out[0] == 255)
    # a wall hides the cells straight behind it (same row, beyond wall)
    flat = np.full((7, 9), 5.0)
    flat[3, 4] = 50.0
    out2, _ = _one(spark, flat, [terrain.viewshed((3, 0), oh=1.0)], nodata=None)
    assert np.all(out2[0, 3, 5:] == 0) and out2[0, 3, 4] == 255
    want = _brute_viewshed(flat, 3, 0, 1.0, None)
    assert np.array_equal(out2[0], want)
    # geo mode: observer at the pixel-center geo coords of (3, 0)
    a, _, c0, _, e, f0 = _T
    gx, gy = c0 + 0.5 * a, f0 + 3.5 * e
    geo_out, _ = _one(
        spark, flat, [terrain.viewshed((gx, gy), oh=1.0, geo=True)], nodata=None
    )
    assert np.array_equal(geo_out[0], out2[0])


def test_flow_dir_differential(spark):
    rng = np.random.Generator(np.random.Philox(key=np.uint64(29)))
    z = rng.integers(1, 40, size=(2, 8, 10)).astype(np.float64)
    z[rng.random((2, 8, 10)) < 0.2] = 0.0
    z[0, 2, 2:5] = 7.0  # flats with ties
    out, row = _one(spark, z, [terrain.flow_dir()])
    assert row["nodata"] == -9999.0
    codes = [(0, 1, 1), (1, 1, 2), (1, 0, 4), (1, -1, 8),
             (0, -1, 16), (-1, -1, 32), (-1, 0, 64), (-1, 1, 128)]
    inv = 1.0 / math.sqrt(2.0)
    nb_, h, w = z.shape
    for b in range(nb_):
        for r in range(h):
            for c in range(w):
                if z[b, r, c] == 0.0:
                    assert out[b, r, c] == -9999.0, (b, r, c)
                    continue
                best, bcode = -math.inf, 0.0
                for dr, dc, code in codes:
                    rr2, cc2 = r + dr, c + dc
                    if not (0 <= rr2 < h and 0 <= cc2 < w):
                        continue
                    if z[b, rr2, cc2] == 0.0:
                        continue
                    s = (z[b, r, c] - z[b, rr2, cc2]) * (inv if dr and dc else 1.0)
                    if s > best:
                        best, bcode = s, float(code)
                want = bcode if best > 0.0 else 0.0
                assert out[b, r, c] == want, (b, r, c, want, out[b, r, c])
    # a strict bowl flows outward from the rim, the center is a pit
    yy, xx = np.mgrid[0:7, 0:7]
    bowl = ((yy - 3) ** 2 + (xx - 3) ** 2).astype(np.float64) + 1.0
    fd, _ = _one(spark, bowl, [terrain.flow_dir()], nodata=None)
    assert fd[0, 3, 3] == 0.0          # the minimum is a pit
    assert fd[0, 3, 2] == 1.0          # west of center flows E, downhill
    assert fd[0, 2, 3] == 4.0          # north of center flows S, downhill


def test_basins_differential(spark):
    rng = np.random.Generator(np.random.Philox(key=np.uint64(31)))
    z = rng.integers(1, 80, size=(2, 9, 11)).astype(np.float64)
    z[rng.random((2, 9, 11)) < 0.15] = 0.0
    out, row = _one(spark, z, [terrain.basins()])
    assert row["nodata"] == -1.0
    codes = [(0, 1, 1), (1, 1, 2), (1, 0, 4), (1, -1, 8),
             (0, -1, 16), (-1, -1, 32), (-1, 0, 64), (-1, 1, 128)]
    inv = 1.0 / math.sqrt(2.0)
    nb_, h, w = z.shape
    for b in range(nb_):
        for r in range(h):
            for c in range(w):
                if z[b, r, c] == 0.0:
                    assert out[b, r, c] == -1.0
                    continue
                cr, cc2 = r, c
                while True:  # brute pointer chase
                    best, bd = -math.inf, None
                    for dr, dc, _code in codes:
                        r2, c2 = cr + dr, cc2 + dc
                        if not (0 <= r2 < h and 0 <= c2 < w) or z[b, r2, c2] == 0.0:
                            continue
                        s = (z[b, cr, cc2] - z[b, r2, c2]) * (inv if dr and dc else 1.0)
                        if s > best:
                            best, bd = s, (dr, dc)
                    if best <= 0.0:
                        break
                    cr, cc2 = cr + bd[0], cc2 + bd[1]
                assert out[b, r, c] == float(cr * w + cc2), (b, r, c)
    # every label is a pit/flat of its own basin (self-labeling terminal)
    fd, _ = _one(spark, z, [terrain.flow_dir()])
    for b in range(nb_):
        for lab in np.unique(out[b][out[b] >= 0]):
            lr, lc = int(lab) // w, int(lab) % w
            assert fd[b, lr, lc] == 0.0


def test_stream_order_differential(spark):
    rng = np.random.Generator(np.random.Philox(key=np.uint64(43)))
    z = rng.integers(1, 70, size=(2, 9, 10)).astype(np.float64)
    z[rng.random((2, 9, 10)) < 0.15] = 0.0
    out, row = _one(spark, z, [terrain.stream_order()])
    assert row["nodata"] == -1.0
    codes = [(0, 1), (1, 1), (1, 0), (1, -1),
             (0, -1), (-1, -1), (-1, 0), (-1, 1)]
    inv = 1.0 / math.sqrt(2.0)
    nb_, h, w = z.shape

    def recv(b, r, c):
        best, bd = -math.inf, None
        for dr, dc in codes:
            r2, c2 = r + dr, c + dc
            if not (0 <= r2 < h and 0 <= c2 < w) or z[b, r2, c2] == 0.0:
                continue
            s = (z[b, r, c] - z[b, r2, c2]) * (inv if dr and dc else 1.0)
            if s > best:
                best, bd = s, (r2, c2)
        return bd if best > 0.0 else None

    import functools

    for b in range(nb_):
        inflows: dict = {}
        for r in range(h):
            for c in range(w):
                if z[b, r, c] == 0.0:
                    continue
                t = recv(b, r, c)
                if t is not None:
                    inflows.setdefault(t, []).append((r, c))

        @functools.lru_cache(maxsize=None)
        def order(rc):
            ins = inflows.get(rc, [])
            if not ins:
                return 1
            os_ = [order(u) for u in ins]
            m = max(os_)
            return m + 1 if os_.count(m) >= 2 else m

        for r in range(h):
            for c in range(w):
                want = -1.0 if z[b, r, c] == 0.0 else float(order((r, c)))
                assert out[b, r, c] == want, (b, r, c, out[b, r, c], want)
        order.cache_clear()


def test_stream_order_bowl(spark):
    """A radial bowl: every rim cell flows inward; the center pit
    collects >= 2 order-1 inflows and must be order 2; rim cells 1."""
    yy, xx = np.mgrid[0:7, 0:7]
    z = ((xx - 3) ** 2 + (yy - 3) ** 2).astype(np.float64)[None] + 1.0
    out, _ = _one(spark, z, [terrain.stream_order()])
    assert out[0, 3, 3] >= 2.0
    assert out[0, 0, 0] == 1.0


def test_flow_accum_differential(spark):
    rng = np.random.Generator(np.random.Philox(key=np.uint64(37)))
    z = rng.integers(1, 60, size=(2, 8, 12)).astype(np.float64)
    z[rng.random((2, 8, 12)) < 0.15] = 0.0
    out, row = _one(spark, z, [terrain.flow_accum()])
    assert row["nodata"] == -1.0
    codes = [(0, 1), (1, 1), (1, 0), (1, -1),
             (0, -1), (-1, -1), (-1, 0), (-1, 1)]
    inv = 1.0 / math.sqrt(2.0)
    nb_, h, w = z.shape
    # brute: chase every cell's path, +1 every node it visits
    acc = np.zeros((nb_, h, w))
    for b in range(nb_):
        for r in range(h):
            for c in range(w):
                if z[b, r, c] == 0.0:
                    continue
                cr, cc2 = r, c
                acc[b, cr, cc2] += 1
                while True:
                    best, bd = -math.inf, None
                    for dr, dc in codes:
                        r2, c2 = cr + dr, cc2 + dc
                        if not (0 <= r2 < h and 0 <= c2 < w) or z[b, r2, c2] == 0.0:
                            continue
                        s = (z[b, cr, cc2] - z[b, r2, c2]) * (inv if dr and dc else 1.0)
                        if s > best:
                            best, bd = s, (dr, dc)
                    if best <= 0.0:
                        break
                    cr, cc2 = cr + bd[0], cc2 + bd[1]
                    acc[b, cr, cc2] += 1
    exp = np.where(z != 0.0, acc, -1.0)
    assert np.array_equal(out, exp)
    # conservation: total accumulation == sum of path lengths; every
    # valid cell counts at least itself
    assert np.all(out[z != 0.0] >= 1.0)


def test_lbp_differential(spark):
    rng = np.random.Generator(np.random.Philox(key=np.uint64(71)))
    z = rng.integers(1, 30, size=(2, 7, 9)).astype(np.float64)
    z[rng.random((2, 7, 9)) < 0.2] = 0.0
    out, row = _one(spark, z, [terrain.lbp()])
    assert row["nodata"] == -1.0
    dirs = [(0, 1), (1, 1), (1, 0), (1, -1),
            (0, -1), (-1, -1), (-1, 0), (-1, 1)]
    nb_, h, w = z.shape
    for b in range(nb_):
        for r in range(h):
            for c in range(w):
                if z[b, r, c] == 0.0:
                    assert out[b, r, c] == -1.0
                    continue
                code = 0
                for k, (dr, dc) in enumerate(dirs):
                    r2, c2 = r + dr, c + dc
                    if (0 <= r2 < h and 0 <= c2 < w
                            and z[b, r2, c2] != 0.0
                            and z[b, r2, c2] >= z[b, r, c]):
                        code |= 1 << k
                assert out[b, r, c] == float(code), (b, r, c)
    # constant plane: every interior code is 255 (all neighbors equal)
    const = np.full((1, 5, 5), 4.0)
    cout, _ = _one(spark, const, [terrain.lbp()])
    assert cout[0, 2, 2] == 255.0
    assert cout[0, 0, 0] == float(1 | 2 | 4)  # only E, SE, S exist


def test_morphology_differential(spark):
    rng = np.random.Generator(np.random.Philox(key=np.uint64(73)))
    z = rng.integers(1, 90, size=(1, 8, 9)).astype(np.float64)
    z[rng.random((1, 8, 9)) < 0.2] = 0.0

    def brute_focal(plane, stat, nod):
        h, w = plane.shape
        out = np.full((h, w), -9999.0)
        for r in range(h):
            for c in range(w):
                vals = [plane[r2, c2]
                        for r2 in range(max(r - 1, 0), min(r + 2, h))
                        for c2 in range(max(c - 1, 0), min(c + 2, w))
                        if plane[r2, c2] != nod]
                if vals:
                    out[r, c] = min(vals) if stat == "min" else max(vals)
        return out

    for op, seq in [("erode", ["min"]), ("dilate", ["max"]),
                    ("open", ["min", "max"]), ("close", ["max", "min"])]:
        got, row = _one(spark, z, terrain.morphology(op))
        plane, nod = z[0], 0.0
        for stat in seq:
            plane = brute_focal(plane, stat, nod)
            nod = -9999.0
        assert np.array_equal(got[0], plane), op
        assert row["nodata"] == -9999.0

    import pytest as _pt
    with _pt.raises(ValueError, match="morphology"):
        terrain.morphology("skeleton")


def test_cost_distance_vs_dijkstra(spark):
    """The synchronized Bellman-Ford fixpoint must equal true Dijkstra
    shortest-path costs (allclose: path sums may associate
    differently), with barriers and an unreachable pocket."""
    import heapq

    rng = np.random.Generator(np.random.Philox(key=np.uint64(83)))
    z = rng.integers(1, 20, size=(1, 8, 10)).astype(np.float64)
    z[0, :, 4] = 0.0        # a full barrier column -> right side pocket
    z[0, 2, 4] = 7.0        # ...with one gate
    z[0, 6:, 7:] = 0.0      # a nodata pocket
    out, row = _one(spark, z, [terrain.cost_distance()])
    assert row["nodata"] == -1.0

    h, w = 8, 10
    plane = z[0]
    valid = plane != 0.0
    srcs = [(r, c) for r in range(h) for c in range(w)
            if valid[r, c] and plane[r, c] == plane[valid].min()]
    dist = {s: 0.0 for s in srcs}
    pq = [(0.0, s) for s in srcs]
    heapq.heapify(pq)
    while pq:
        d, (r, c) = heapq.heappop(pq)
        if d > dist.get((r, c), math.inf):
            continue
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if dr == 0 and dc == 0:
                    continue
                r2, c2 = r + dr, c + dc
                if not (0 <= r2 < h and 0 <= c2 < w) or not valid[r2, c2]:
                    continue
                step = (plane[r, c] + plane[r2, c2]) / 2.0 * (
                    math.sqrt(2.0) if dr and dc else 1.0)
                nd = d + step
                if nd < dist.get((r2, c2), math.inf) - 1e-12:
                    dist[(r2, c2)] = nd
                    heapq.heappush(pq, (nd, (r2, c2)))
    for r in range(h):
        for c in range(w):
            if not valid[r, c]:
                assert out[0, r, c] == -1.0
            elif (r, c) in dist:
                assert out[0, r, c] == pytest.approx(dist[(r, c)], rel=1e-9)
            else:
                assert out[0, r, c] == -1.0  # unreachable valid cell
    assert all(out[0, r, c] == 0.0 for r, c in srcs)
