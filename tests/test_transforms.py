"""Per-pixel transform tests; goldens from the reference test suite
(/root/reference/tests/test_raster.py:160-236) that depend only on
(w, h, transform) transfer exactly; pixel-dependent checks use the
deterministic datagen oracle."""

import math
import pytest
import numpy as np
import pyspark.sql.functions as F

from ukis_pysat_spark import codec, datagen
from ukis_pysat_spark.operators import transforms

MASK_BOX = (11.9027457562112939, 51.4664152338322580, 11.9477435281016131, 51.5009522690838750)
# reference golden bounds after mask (test_raster.py:178-186)
MASK_GOLDEN = (11.902702941366716, 51.46639813686387, 11.947798368783504, 51.50098327545026)


def _img0(spark):
    return datagen.gen_images(spark, 1, profile="golden")


def test_mask_bbox_golden(spark):
    out = transforms.apply_transforms(_img0(spark), [transforms.mask_bbox(MASK_BOX)])
    row = out.collect()[0]
    assert (row.h, row.w) == (385, 502)  # test_raster.py:80
    a, _, c, _, e, f_ = row.transform
    left, top = c, f_
    right, bottom = c + row.w * a, f_ + row.h * e
    assert np.allclose((left, bottom, right, top), MASK_GOLDEN, atol=1e-9)


def test_mask_polygon_sets_outside_to_nodata(spark):
    # diamond inside the image; corners of the cropped window -> nodata
    cx, cy = 11.92, 51.49
    ring = [(cx - 0.01, cy), (cx, cy + 0.01), (cx + 0.01, cy), (cx, cy - 0.01), (cx - 0.01, cy)]
    out = transforms.apply_transforms(_img0(spark), [transforms.mask_bbox(ring, nodata=0.0)])
    row = out.collect()[0]
    arr = codec.decode(row.bytes)
    assert arr[0, 0, 0] == 0 and arr[0, -1, -1] == 0  # corners masked
    assert (arr != 0).any()  # interior survives


def test_mask_fill_pads_to_cover(spark):
    # bbox extends beyond the left edge -> fill pads first (raster.py:125-129)
    big = (MASK_BOX[0] - 0.005, MASK_BOX[1], MASK_BOX[2], MASK_BOX[3])
    out = transforms.apply_transforms(_img0(spark), [transforms.mask_bbox(big, fill=True)])
    row = out.collect()[0]
    a, _, c, _, e, f_ = row.transform
    assert c <= big[0] + 1e-9  # raster now covers the requested bbox
    assert row.w > 502


def test_pad_shifts_transform(spark):
    out = transforms.apply_transforms(_img0(spark), [transforms.pad(10)])
    row = out.collect()[0]
    assert (row.h, row.w) == (764 + 20, 679 + 20)
    a, _, c, _, e, f_ = row.transform
    assert np.isclose(c, datagen.REF_ORIGIN[0] - 10 * datagen.REF_PIXEL_X)
    assert np.isclose(f_, datagen.REF_ORIGIN[1] - 10 * datagen.REF_PIXEL_Y)
    arr = codec.decode(row.bytes)
    assert (arr[:, :10, :] == 0).all() and (arr[:, :, :10] == 0).all()


def test_valid_data_bbox_oracle(spark):
    # img0 has exactly 1 nodata row at the top (idx%7+1); all cols valid
    row = transforms.valid_data_bbox(_img0(spark), nodata=0.0).collect()[0]
    a, e = datagen.REF_PIXEL_X, datagen.REF_PIXEL_Y
    c, f_ = datagen.REF_ORIGIN
    assert np.isclose(row.left, c) and np.isclose(row.right, c + 679 * a)
    assert np.isclose(row.top, f_ + 1 * e)  # first valid row = 1
    assert np.isclose(row.bottom, f_ + 764 * e)


def test_pixel_math_scale_and_shape_guard(spark):
    out = transforms.apply_transforms(
        _img0(spark), [transforms.pixel_math(lambda a: a * 0.3)], out_fmt="raw"
    )
    row = out.collect()[0]
    arr = codec.decode(row.bytes)
    src = datagen.pixels_for(0, 1, 764, 679, "int16", 42)
    assert np.allclose(arr, src * 0.3)


def test_dn2toa_matches_oracle(spark):
    imgs = datagen.gen_images(spark, 8, profile="mixed")
    meta = datagen.gen_metadata(spark, 8, profile="mixed")
    out = transforms.dn2toa(imgs, meta)
    rows = {r.image_id: r for r in out.collect()}
    mrows = {r.image_id: r for r in meta.collect()}
    irows = {r.image_id: r for r in imgs.collect()}
    assert len(rows) == 8
    for iid, r in rows.items():
        assert r.dtype == "float32"
        got = codec.decode(r.bytes)
        m = mrows[iid]
        src = codec.decode(irows[iid].bytes)
        exp = transforms.dn2toa_arrays(
            src, m.platform, m.sun_elevation, m.mult_reflectance, m.add_reflectance,
            m.mult_radiance, m.add_radiance, m.k1, m.k2, m.thermal_band_idx,
            m.quantification_value, m.radio_add_offset, m.processing_baseline,
        )
        assert np.allclose(got, exp, equal_nan=True)
        # reflectance bands land in a plausible range
        assert np.isfinite(got).all()
        # caption survives the transform byte-identically
        assert r.caption == irows[iid].caption


def test_dn2toa_psnr_through_lossy_codec(spark):
    imgs = datagen.gen_images(spark, 4, profile="mixed")
    meta = datagen.gen_metadata(spark, 4, profile="mixed")
    out = transforms.dn2toa(imgs, meta, out_fmt="q8")
    irows = {r.image_id: r for r in imgs.collect()}
    mrows = {r.image_id: r for r in meta.collect()}
    for r in out.collect():
        got = codec.decode(r.bytes)
        m = mrows[r.image_id]
        exp = transforms.dn2toa_arrays(
            codec.decode(irows[r.image_id].bytes), m.platform, m.sun_elevation,
            m.mult_reflectance, m.add_reflectance, m.mult_radiance, m.add_radiance,
            m.k1, m.k2, m.thermal_band_idx, m.quantification_value,
            m.radio_add_offset, m.processing_baseline,
        )
        assert codec.psnr(exp, got) >= 40.0  # BASELINE.json:15 lossy gate


def test_warp_crs_and_resolution(spark):
    # mirrors the reference's warp assertions (test_raster.py:223-236)
    out = transforms.apply_transforms(_img0(spark), [transforms.warp("EPSG:3857")])
    row = out.collect()[0]
    assert row.crs == "EPSG:3857"
    out2 = transforms.apply_transforms(
        out, [transforms.warp("EPSG:4326", resolution=0.001)]
    )
    row2 = out2.collect()[0]
    assert np.isclose(row2.transform[0], 0.001)

    # target_align: same transform + size as the target
    t10 = transforms.apply_transforms(_img0(spark), [transforms.warp("EPSG:3857", resolution=10)])
    t25 = transforms.apply_transforms(_img0(spark), [transforms.warp("EPSG:3857", resolution=25)])
    r25 = t25.collect()[0]
    aligned = transforms.apply_transforms(
        _img0(spark),
        [transforms.warp("EPSG:3857", target_transform=list(r25.transform),
                         target_size=(r25.w, r25.h))],
    ).collect()[0]
    assert np.allclose(aligned.transform, r25.transform)
    assert (aligned.w, aligned.h) == (r25.w, r25.h)


def test_warp_roundtrip_preserves_pixels(spark):
    # 4326 -> 3857 -> 4326 at native resolution: nearest-neighbor
    # round-trip keeps the dominant pixel values (interior exactness)
    src = datagen.pixels_for(0, 1, 764, 679, "int16", 42)
    out = transforms.apply_transforms(
        _img0(spark),
        [transforms.warp("EPSG:3857"), transforms.warp("EPSG:4326")],
    )
    row = out.collect()[0]
    arr = codec.decode(row.bytes)
    # compare central crop (edges may shift by 1px from grid snapping)
    interior_match = np.mean(arr[:, 50:-50, 50:-50] == src[:, 50 : arr.shape[1] - 50, 50 : arr.shape[2] - 50])
    assert interior_match > 0.95


def test_lookup_bands_reference_parity():
    from ukis_pysat_spark.functions import bands

    # reference raster.py:432-481 tables, doc example raster.py:280
    assert bands.lookup_bands("Landsat5", ["Blue", "Green", "Red"]) == ["1", "2", "3"]
    assert bands.lookup_bands("Landsat7", ["TIRS1", "TIRS2"]) == ["6_VCID_1", "6_VCID_2"]
    assert bands.lookup_bands("Landsat8", ["Aerosol", "TIRS1", "TIRS2"]) == ["1", "10", "11"]
    assert bands.lookup_bands("Sentinel-2", ["Aerosol", "Swir2"]) == ["0", "12"]
    try:
        bands.lookup_bands("Landsat8", ["Magenta"])
        assert False, "unknown wavelength must raise"
    except KeyError:
        pass
    assert bands.is_thermal_label("Landsat8", "10")
    assert bands.is_thermal_label("Landsat7", "6_VCID_2")
    assert not bands.is_thermal_label("Landsat8", "6")
    assert not bands.is_thermal_label("Sentinel2", "10")


def test_dn2toa_wavelengths_subset(spark):
    """dn2toa(wavelengths=...) == the matching bands of the full
    conversion (positional semantics of raster.py:337: band i of the
    payload is the i-th requested wavelength)."""
    imgs = datagen.gen_images(spark, 8, profile="mixed")
    meta = datagen.gen_metadata(spark, 8, profile="mixed")
    wl = ["Blue", "Green", "Red"]
    # Landsat5/7/8 rows: blue/green/red are reflectance bands at
    # positions 0.. so the subset equals the first bands of the full run
    # full Landsat-like stacks only: small analogs put metadata thermal
    # indices inside the first 3 positions, where the formulas differ
    sel = imgs.filter((F.col("platform") != "Sentinel2") & (F.col("bands") >= 7))
    sub = {
        r.image_id: codec.decode(r.bytes)
        for r in transforms.dn2toa(sel, meta, wavelengths=wl).collect()
    }
    full = {
        r.image_id: codec.decode(r.bytes)
        for r in transforms.dn2toa(sel, meta).collect()
    }
    assert sub and set(sub) == set(full)
    for iid, got in sub.items():
        assert got.shape[0] == 3
        # positional factor convention: subset equals leading bands
        assert np.allclose(got, full[iid][:3], equal_nan=True)


def test_dn2toa_wavelengths_thermal_relabel(spark):
    """A wavelengths request that includes a thermal band must apply the
    brightness-temperature formula at the REQUEST position (thermal
    membership re-derived from labels, not from metadata indices)."""
    imgs = datagen.gen_images(spark, 8, profile="mixed").filter(
        F.col("platform") == "Landsat8"
    )
    meta = datagen.gen_metadata(spark, 8, profile="mixed")
    out = transforms.dn2toa_stats(imgs, meta, wavelengths=["TIRS1"]).collect()
    assert out
    for r in out:
        assert r.band == 0
        # brightness temperature, not reflectance: hundreds of Kelvin
        assert r.mean > 100.0


def test_warp_utm_roundtrip_and_proj_string(spark):
    # zone 32U covers the golden image's origin (11.9E, 51.5N)
    src = datagen.pixels_for(0, 1, 764, 679, "int16", 42)
    out = transforms.apply_transforms(
        _img0(spark), [transforms.warp("EPSG:32632")]
    )
    row = out.collect()[0]
    assert row.crs == "EPSG:32632"
    a = row.transform[0]
    assert 5.0 < a < 15.0  # ~deg px at 51.5N -> single-digit meters
    # footprint columns must be geographic again (inverse-projected)
    assert 11.0 < row.footprint_lon[0] < 13.0
    assert 51.0 < row.footprint_lat[0] < 52.0
    # roundtrip aligned back onto the ORIGINAL grid (UTM grid convergence
    # rotates the footprint, so raw index comparison would misalign)
    orig_t = [datagen.REF_PIXEL_X, 0.0, datagen.REF_ORIGIN[0],
              0.0, datagen.REF_PIXEL_Y, datagen.REF_ORIGIN[1]]
    back = transforms.apply_transforms(
        out,
        [transforms.warp("EPSG:4326", target_transform=orig_t, target_size=(679, 764))],
    ).collect()[0]
    arr = codec.decode(back.bytes)
    exact = np.mean(arr[:, 50:-50, 50:-50] == src[:, 50:-50, 50:-50])
    assert exact > 0.85  # nearest-neighbor double resample: ~0.92 measured
    close = np.mean(
        np.abs(arr[:, 50:-50, 50:-50].astype(float) - src[:, 50:-50, 50:-50]) <= 60
    )
    assert close > 0.99  # off-by-one-pixel picks differ only by local noise

    # the get_proj_string output is a consumable warp target
    via_proj = transforms.apply_transforms(
        _img0(spark),
        [transforms.warp("+proj=utm +zone=32U, +ellps=WGS84 +datum=WGS84 +units=m +no_defs")],
    ).collect()[0]
    assert np.allclose(via_proj.transform, row.transform)


def test_utm_math_self_consistency():
    lon = np.array([11.9, 6.2, 9.0])
    lat = np.array([51.5, 50.1, 48.5])
    x, y = transforms._utm_fwd(lon, lat, 9.0, False)
    assert ((x > 160_000) & (x < 840_000)).all()  # inside zone envelope
    lon2, lat2 = transforms._utm_inv(x, y, 9.0, False)
    assert np.allclose(lon, lon2, atol=1e-9)
    assert np.allclose(lat, lat2, atol=1e-9)
    # southern hemisphere false northing
    xs, ys = transforms._utm_fwd(np.array([11.9]), np.array([-33.5]), 9.0, True)
    assert ys[0] > 5_000_000
    lon3, lat3 = transforms._utm_inv(xs, ys, 9.0, True)
    assert np.isclose(lat3[0], -33.5, atol=1e-9)


def test_write_images_min_dtype_roundtrip(spark, tmp_path):
    """S4 sink parity: dtype='min' picks the smallest representing dtype
    (reference raster.py:555-556) and the payload roundtrips losslessly."""
    from ukis_pysat_spark import sinks

    # uint8-representable float content
    imgs = transforms.apply_transforms(
        _img0(spark),
        [transforms.pixel_math(lambda a: (a % 200).astype(np.float32))],
    )
    dest = str(tmp_path / "sink")
    sinks.write_images(imgs, dest, dtype="min", out_fmt="rawz")
    back = spark.read.parquet(dest).collect()[0]
    assert back.dtype == "uint8"
    assert back.fmt == "rawz"
    arr = codec.decode(back.bytes)
    exp = (datagen.pixels_for(0, 1, 764, 679, "int16", 42) % 200).astype(np.float32)
    assert np.array_equal(arr.astype(np.float32), exp)
    # negative values -> int16; large positive -> uint16
    assert codec.minimum_dtype(np.array([-5, 100])) == "int16"
    assert codec.minimum_dtype(np.array([0, 70000])) == "uint32"
    assert codec.minimum_dtype(np.array([0.5, 1.25])) == "float32"


def test_fused_chain_single_stage(spark):
    # mask -> pad -> pixel_math composes in ONE decode/encode pass
    out = transforms.apply_transforms(
        _img0(spark),
        transforms.compose(
            transforms.mask_bbox(MASK_BOX),
            transforms.pad(5),
            transforms.pixel_math(lambda a: a + 1),
        ),
    )
    row = out.collect()[0]
    assert (row.h, row.w) == (385 + 10, 502 + 10)


def test_dn2toa_stats_fused_matches_two_stage(spark):
    from ukis_pysat_spark.operators import multimodal

    imgs = datagen.gen_images(spark, 6, profile="mixed")
    meta = datagen.gen_metadata(spark, 6, profile="mixed")
    fused = transforms.dn2toa_stats(imgs, meta).orderBy("image_id", "band").collect()
    two_stage = (
        multimodal.decode_stats(transforms.dn2toa(imgs, meta), nodata=None)
        .orderBy("image_id", "band")
        .collect()
    )
    assert len(fused) == len(two_stage)
    for a, b in zip(fused, two_stage):
        assert a.image_id == b.image_id and a.band == b.band
        assert np.isclose(a.mean, b.mean) and np.isclose(a.std, b.std)
        assert np.isclose(a.min, b.min) and np.isclose(a.max, b.max)


def test_minimum_dtype_wide_integer_rungs():
    """ADVICE r2: values beyond uint32/int32 must pick int64/uint64 (not
    silently wrap through a too-small dtype), and ranges no integer type
    represents must raise before any cast happens."""
    assert codec.minimum_dtype(np.array([0, 2**40])) == "uint64"
    assert codec.minimum_dtype(np.array([0, 2**63], dtype=np.uint64)) == "uint64"
    assert codec.minimum_dtype(np.array([-5e9, 0.0])) == "int64"  # int-valued floats
    assert codec.minimum_dtype(np.array([-(2**40), 2**40])) == "int64"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no integer dtype"):
        codec.minimum_dtype(np.array([-1, 2**63], dtype=np.float64))
    # the verified ADVICE repro: [0, 2**40] must roundtrip losslessly
    arr = np.array([[[0, 2**40]]], dtype=np.int64)
    dt = codec.minimum_dtype(arr)
    back = codec.decode(codec.encode(arr.astype(np.dtype(dt)), "raw"))
    assert int(back.max()) == 2**40


def test_utm_params_requires_determinable_hemisphere():
    """ADVICE r2: '+proj=utm +zone=56' without letter or +south/+north is
    ambiguous -> None (warp raises unsupported-CRS instead of silently
    assuming north and shifting southern coords by the false northing)."""
    assert transforms._utm_params("+proj=utm +zone=56") is None
    assert transforms._utm_params("+proj=utm +zone=56 +south") == (153.0, True)
    assert transforms._utm_params("+proj=utm +zone=56 +north") == (153.0, False)
    assert transforms._utm_params("+proj=utm +zone=56J, +ellps=WGS84") == (153.0, True)
    assert transforms._utm_params("+proj=utm +zone=33N, +ellps=WGS84") == (153.0 - 23 * 6, False)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported CRS"):
        transforms._fwd("+proj=utm +zone=56", np.array([153.0]), np.array([-33.0]))


def test_warp_bilinear_golden_ramp(spark):
    """VERDICT r2 #7: bilinear resampling against a closed-form linear
    ramp — a 2x same-CRS upsample of arr[r,c] = 10r + c must reproduce
    10*fy + fx exactly at every interior destination pixel (bilinear of
    a linear field IS the field), while nearest provably differs."""
    ramp = (10.0 * np.arange(16)[:, None] + np.arange(16)[None, :]).astype(np.float64)
    arr = ramp[None, :, :]
    meta = {"transform": [0.01, 0.0, 10.0, 0.0, -0.01, 50.0], "nodata": 0.0, "crs": "EPSG:4326"}
    tgt = dict(
        target_transform=[0.005, 0.0, 10.0, 0.0, -0.005, 50.0], target_size=(32, 32)
    )
    bl, meta_bl = transforms.warp("EPSG:4326", resampling="bilinear", **tgt)(
        arr.copy(), dict(meta)
    )
    nn, _ = transforms.warp("EPSG:4326", resampling="nearest", **tgt)(
        arr.copy(), dict(meta)
    )
    assert bl.shape == (1, 32, 32) and nn.shape == (1, 32, 32)
    # destination center (i, j) sits at source pixel-center coords
    # fy = i/2 - 0.25, fx = j/2 - 0.25 (closed form, not impl-derived)
    ii, jj = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    fy = ii / 2.0 - 0.25
    fx = jj / 2.0 - 0.25
    interior = (fx >= 0) & (fx <= 15) & (fy >= 0) & (fy <= 15)
    expected = 10.0 * fy + fx
    assert np.allclose(bl[0][interior], expected[interior], atol=1e-9)
    # nearest yields the step function — must differ on interior pixels
    assert not np.allclose(nn[0][interior], expected[interior])
    assert meta_bl["transform"][0] == 0.005
    # integer dtype: result is rounded, not truncated
    bl_i, _ = transforms.warp("EPSG:4326", resampling="bilinear", **tgt)(
        (ramp[None] * 3).astype(np.int32), dict(meta)
    )
    assert bl_i.dtype == np.int32
    assert np.array_equal(
        bl_i[0][interior], np.rint(3 * expected[interior]).astype(np.int32)
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported resampling"):
        transforms.warp("EPSG:4326", resampling="cubic_spline")


def test_warp_lanczos_golden_bandlimited():
    """VERDICT r4 stretch #9: lanczos (windowed sinc a=3) on a
    bandlimited field.  Gates: (1) constant fields survive EXACTLY
    (renormalized discrete weights give DC gain 1 between taps);
    (2) on a low-frequency sinusoid a 2x upsample reconstructs the
    closed-form field at interior pixels tighter than bilinear by a
    wide margin (windowed sinc approaches ideal reconstruction where
    linear interpolation has O(h^2) error)."""
    n = 32
    const = np.full((1, n, n), 7.25)
    meta = {"transform": [0.01, 0.0, 10.0, 0.0, -0.01, 50.0], "nodata": -1.0, "crs": "EPSG:4326"}
    tgt = dict(
        target_transform=[0.005, 0.0, 10.0, 0.0, -0.005, 50.0],
        target_size=(2 * n, 2 * n),
    )
    lz, meta_lz = transforms.warp("EPSG:4326", resampling="lanczos", **tgt)(
        const.copy(), dict(meta)
    )
    ii, jj = np.meshgrid(np.arange(2 * n), np.arange(2 * n), indexing="ij")
    fy = ii / 2.0 - 0.25
    fx = jj / 2.0 - 0.25
    interior = (fx >= 2.5) & (fx <= n - 4) & (fy >= 2.5) & (fy <= n - 4)
    assert np.allclose(lz[0][interior], 7.25, atol=1e-12)
    assert meta_lz["transform"][0] == 0.005

    # bandlimited sinusoid at period 4 px (half Nyquist) — the regime
    # the windowed sinc exists for: its sharper frequency cutoff must
    # reconstruct the closed-form field several times tighter than the
    # 4-tap cubic, and an order of magnitude tighter than bilinear
    # (measured here: lanczos 0.020, cubic 0.087, bilinear 0.192)
    cc, rr = np.meshgrid(np.arange(n, dtype=np.float64),
                         np.arange(n, dtype=np.float64), indexing="xy")
    field = np.sin(2 * np.pi * cc / 4.0) + np.cos(2 * np.pi * rr / 14.0)
    arr = field[None, :, :]
    expected = np.sin(2 * np.pi * fx / 4.0) + np.cos(2 * np.pi * fy / 14.0)
    errs = {}
    for rs in ("lanczos", "cubic", "bilinear"):
        out, _ = transforms.warp("EPSG:4326", resampling=rs, **tgt)(
            arr.copy(), dict(meta)
        )
        errs[rs] = float(np.abs(out[0][interior] - expected[interior]).max())
    assert errs["lanczos"] < 0.03, errs
    assert errs["lanczos"] < errs["cubic"] / 3.0, errs
    assert errs["lanczos"] < errs["bilinear"] / 5.0, errs


def test_warp_cubic_golden_quadratic_ramp():
    """VERDICT r3 #6: Catmull-Rom cubic is third-order accurate — a 2x
    same-CRS upsample of the quadratic field arr[r,c] = c^2 + r^2 must
    reproduce fx^2 + fy^2 exactly at interior destination pixels
    (cubic convolution with a=-0.5 reproduces quadratics), while
    bilinear provably differs there (it is only exact for linear
    fields)."""
    n = 24
    cc, rr = np.meshgrid(np.arange(n, dtype=np.float64),
                         np.arange(n, dtype=np.float64), indexing="xy")
    arr = (cc**2 + rr**2)[None, :, :]
    meta = {"transform": [0.01, 0.0, 10.0, 0.0, -0.01, 50.0], "nodata": 0.0, "crs": "EPSG:4326"}
    tgt = dict(
        target_transform=[0.005, 0.0, 10.0, 0.0, -0.005, 50.0],
        target_size=(2 * n, 2 * n),
    )
    cu, meta_cu = transforms.warp("EPSG:4326", resampling="cubic", **tgt)(
        arr.copy(), dict(meta)
    )
    bl, _ = transforms.warp("EPSG:4326", resampling="bilinear", **tgt)(
        arr.copy(), dict(meta)
    )
    ii, jj = np.meshgrid(np.arange(2 * n), np.arange(2 * n), indexing="ij")
    fy = ii / 2.0 - 0.25
    fx = jj / 2.0 - 0.25
    # interior: all 4x4 taps in-bounds (floor(f)-1 >= 0, floor(f)+2 <= n-1)
    interior = (fx >= 1.5) & (fx <= n - 3) & (fy >= 1.5) & (fy <= n - 3)
    expected = fx**2 + fy**2
    assert np.allclose(cu[0][interior], expected[interior], atol=1e-9)
    # bilinear of a strictly convex field steps at half-offsets
    assert not np.allclose(bl[0][interior], expected[interior])
    assert float(np.abs(bl[0][interior] - expected[interior]).max()) > 0.2
    assert meta_cu["transform"][0] == 0.005
    # integer dtype rounds and clips
    cu_i, _ = transforms.warp("EPSG:4326", resampling="cubic", **tgt)(
        arr.astype(np.uint16), dict(meta)
    )
    assert cu_i.dtype == np.uint16
    assert np.array_equal(
        cu_i[0][interior], np.rint(expected[interior]).astype(np.uint16)
    )


def test_warp_average_golden_block_mean():
    """'average' warp: on an exact 2x same-CRS downscale every dest
    cell receives exactly the 2x2 source block, so the result IS the
    block mean (reduceat oracle); upscale regions fall back to nearest;
    integer dtypes round."""
    rng = np.random.Generator(np.random.Philox(key=np.uint64(33)))
    arr = rng.integers(0, 4000, size=(2, 32, 40)).astype(np.float64)
    meta = {"transform": [0.01, 0.0, 10.0, 0.0, -0.01, 50.0], "nodata": 0.0, "crs": "EPSG:4326"}
    tgt = dict(
        target_transform=[0.02, 0.0, 10.0, 0.0, -0.02, 50.0],
        target_size=(20, 16),
    )
    av, meta_av = transforms.warp("EPSG:4326", resampling="average", **tgt)(
        arr.copy(), dict(meta)
    )
    re = np.arange(17) * 2
    ce = np.arange(21) * 2
    oracle = (
        np.add.reduceat(np.add.reduceat(arr, re[:-1], axis=1), ce[:-1], axis=2) / 4.0
    )
    assert np.allclose(av, oracle, atol=1e-12)
    assert meta_av["transform"][0] == 0.02
    # integer dtype rounds the bucket mean
    av_i, _ = transforms.warp("EPSG:4326", resampling="average", **tgt)(
        arr.astype(np.uint16), dict(meta)
    )
    assert av_i.dtype == np.uint16
    assert np.array_equal(av_i, np.rint(oracle).astype(np.uint16))
    # upscale: every dest cell has at most one source center -> the
    # populated cells equal that source pixel, empty ones fall back to
    # nearest; net effect == nearest everywhere
    up = dict(
        target_transform=[0.005, 0.0, 10.0, 0.0, -0.005, 50.0],
        target_size=(80, 64),
    )
    av_u, _ = transforms.warp("EPSG:4326", resampling="average", **up)(
        arr.copy(), dict(meta)
    )
    nn_u, _ = transforms.warp("EPSG:4326", resampling="nearest", **up)(
        arr.copy(), dict(meta)
    )
    assert np.array_equal(av_u, nn_u)


def test_warp_mode_golden_majority():
    """'mode' warp: on an exact 3x same-CRS downscale each dest cell is
    the 3x3 block's majority class (ties -> smallest value), checked
    against a dict-count oracle; float rasters raise."""
    import pytest as _pytest
    from collections import Counter

    rng = np.random.Generator(np.random.Philox(key=np.uint64(37)))
    arr = rng.integers(0, 6, size=(1, 30, 36)).astype(np.int16)
    meta = {"transform": [0.01, 0.0, 10.0, 0.0, -0.01, 50.0], "nodata": 0.0, "crs": "EPSG:4326"}
    tgt = dict(
        target_transform=[0.03, 0.0, 10.0, 0.0, -0.03, 50.0],
        target_size=(12, 10),
    )
    md, meta_md = transforms.warp("EPSG:4326", resampling="mode", **tgt)(
        arr.copy(), dict(meta)
    )
    assert md.dtype == np.int16 and md.shape == (1, 10, 12)
    for i in range(10):
        for j in range(12):
            block = arr[0, 3 * i : 3 * i + 3, 3 * j : 3 * j + 3].ravel()
            counts = Counter(block.tolist())
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            assert md[0, i, j] == best, (i, j, counts, md[0, i, j])
    with _pytest.raises(ValueError, match="integer raster"):
        transforms.warp("EPSG:4326", resampling="mode", **tgt)(
            arr.astype(np.float32), dict(meta)
        )


# --- round 5: polar stereographic + LAEA analytic CRS -------------------------


def test_polar_stereographic_invariants():
    """EPSG:3413/3976/3031 (ellipsoidal polar stereographic, variant
    B): fwd/inv round-trip < 1e-9 deg across the hemisphere, the pole
    maps to the grid origin, and the scale factor is 1 at the standard
    parallel (projected parallel arc == ellipsoidal parallel arc)."""
    rng = np.random.Generator(np.random.Philox(key=np.uint64(51)))
    cases = {
        "EPSG:3413": (70.0, -45.0, 1),
        "EPSG:3976": (-70.0, 0.0, -1),
        "EPSG:3031": (-71.0, 0.0, -1),
    }
    for crs, (lat_ts, lon0, hemi) in cases.items():
        lon = -180.0 + 360.0 * rng.random(500)
        lat = hemi * (30.0 + 59.9 * rng.random(500))
        x, y = transforms._fwd(crs, lon, lat)
        lon2, lat2 = transforms._inv(crs, x, y)
        dlon = (lon2 - lon + 180.0) % 360.0 - 180.0
        assert np.abs(dlon * np.cos(np.radians(lat))).max() < 1e-9, crs
        assert np.abs(lat2 - lat).max() < 1e-9, crs
        # pole -> origin
        px, py = transforms._fwd(crs, np.array([12.0]), np.array([90.0 * hemi]))
        assert abs(px[0]) < 1e-6 and abs(py[0]) < 1e-6, crs
        # k == 1 at the standard parallel: compare a short projected
        # arc along lat_ts with the ellipsoidal parallel arc
        d = 1e-4
        x1, y1 = transforms._fwd(crs, np.array([lon0 - d]), np.array([lat_ts]))
        x2, y2 = transforms._fwd(crs, np.array([lon0 + d]), np.array([lat_ts]))
        proj = float(np.hypot(x2 - x1, y2 - y1)[0])
        phi = np.radians(lat_ts)
        nu = transforms._WGS_A / np.sqrt(1 - transforms._E2 * np.sin(phi) ** 2)
        true = float(nu * np.cos(phi) * np.radians(2 * d))
        assert abs(proj / true - 1.0) < 1e-9, crs


def test_laea_europe_invariants():
    """EPSG:3035: the natural origin (10E, 52N) maps to (FE, FN) by
    definition; round-trip < 1e-9 deg over Europe; the projection is
    EQUAL-AREA — a projected 1x1 deg quad's planar area matches the
    authalic-sphere cell area to 1e-6 relative."""
    x0, y0 = transforms._fwd("EPSG:3035", np.array([10.0]), np.array([52.0]))
    assert abs(x0[0] - 4_321_000.0) < 1e-6 and abs(y0[0] - 3_210_000.0) < 1e-6
    rng = np.random.Generator(np.random.Philox(key=np.uint64(53)))
    lon = -10.0 + 40.0 * rng.random(500)
    lat = 35.0 + 35.0 * rng.random(500)
    x, y = transforms._fwd("EPSG:3035", lon, lat)
    lon2, lat2 = transforms._inv("EPSG:3035", x, y)
    assert np.abs(lon2 - lon).max() < 5e-8
    assert np.abs(lat2 - lat).max() < 5e-8  # 3-term authalic series ~ 1e-8 deg
    # equal-area check on a 1x1 deg cell at (15E, 48N): shoelace area
    # of the projected ring vs authalic-sphere area R_q^2*dlam*dsinbeta
    ring_lon = np.array([15.0, 16.0, 16.0, 15.0])
    ring_lat = np.array([48.0, 48.0, 49.0, 49.0])
    # densify edges so the planar polygon tracks the projected edges
    pts_lon, pts_lat = [], []
    for i in range(4):
        a_lon, a_lat = ring_lon[i], ring_lat[i]
        b_lon, b_lat = ring_lon[(i + 1) % 4], ring_lat[(i + 1) % 4]
        t = np.linspace(0, 1, 200, endpoint=False)
        pts_lon.append(a_lon + (b_lon - a_lon) * t)
        pts_lat.append(a_lat + (b_lat - a_lat) * t)
    rl, rb = np.concatenate(pts_lon), np.concatenate(pts_lat)
    X, Y = transforms._fwd("EPSG:3035", rl, rb)
    area = 0.5 * abs(np.dot(X, np.roll(Y, -1)) - np.dot(Y, np.roll(X, -1)))
    beta = lambda la: np.arcsin(
        transforms._laea_q(np.radians(np.asarray(la))) / transforms._LAEA_QP
    )
    exp = (
        transforms._LAEA_RQ**2
        * np.radians(1.0)
        * (np.sin(beta(49.0)) - np.sin(beta(48.0)))
    )
    assert abs(area / float(exp) - 1.0) < 1e-6


def test_warp_polar_and_laea_roundtrip(spark):
    """End-to-end warp into EPSG:3035 and back preserves interior
    pixels.  LAEA's grid is curved relative to lon/lat, so the
    back-warp pins target_transform/target_size to the SOURCE grid
    (the reference's target_align pattern) — then the nearest
    round-trip must reproduce interior pixels at identical indices."""
    src = datagen.pixels_for(0, 1, 764, 679, "int16", 42)
    src_t = [datagen.REF_PIXEL_X, 0.0, datagen.REF_ORIGIN[0],
             0.0, datagen.REF_PIXEL_Y, datagen.REF_ORIGIN[1]]
    out = transforms.apply_transforms(
        _img0(spark),
        [transforms.warp("EPSG:3035"),
         transforms.warp("EPSG:4326", target_transform=src_t,
                         target_size=(679, 764))],
    )
    row = out.collect()[0]
    arr = codec.decode(row.bytes)
    assert arr.shape == (1, 764, 679)
    interior_match = np.mean(arr[:, 50:-50, 50:-50] == src[:, 50:-50, 50:-50])
    assert interior_match > 0.93


def _densified_cell_ring(lon0, lat0, dlon=1.0, dlat=1.0, n=200):
    ring_lon = np.array([lon0, lon0 + dlon, lon0 + dlon, lon0])
    ring_lat = np.array([lat0, lat0, lat0 + dlat, lat0 + dlat])
    pts_lon, pts_lat = [], []
    for i in range(4):
        a_lon, a_lat = ring_lon[i], ring_lat[i]
        b_lon, b_lat = ring_lon[(i + 1) % 4], ring_lat[(i + 1) % 4]
        t = np.linspace(0, 1, n, endpoint=False)
        pts_lon.append(a_lon + (b_lon - a_lon) * t)
        pts_lat.append(a_lat + (b_lat - a_lat) * t)
    return np.concatenate(pts_lon), np.concatenate(pts_lat)


def _shoelace(X, Y):
    return 0.5 * abs(np.dot(X, np.roll(Y, -1)) - np.dot(Y, np.roll(X, -1)))


def _authalic_cell_area(lat_lo, lat_hi, dlon_deg):
    """Exact ellipsoid area of a lon/lat cell via the authalic q:
    A = a^2/2 * dlam * (q(hi) - q(lo))."""
    q = lambda la: float(transforms._laea_q(np.radians(np.asarray(la))))  # noqa: E731
    return transforms._WGS_A**2 / 2.0 * np.radians(dlon_deg) * (q(lat_hi) - q(lat_lo))


def test_lcc_invariants():
    """Lambert conformal conic 2SP (EPSG:2154 Lambert-93, EPSG:3347
    StatCan, + a proj-string cone): the natural origin maps to (FE,FN)
    by definition, round-trip < 1e-9 deg, scale == 1 along BOTH
    standard parallels, and the map is CONFORMAL (local scale isotropic
    and the graticule locally orthogonal).  Conformality + k=1 on two
    named parallels + the origin anchor uniquely pin LCC among smooth
    projections, so these properties are an implementation-independent
    oracle (Snyder 1987 ch. 15)."""
    cases = {
        "EPSG:2154": (49.0, 44.0, 46.5, 3.0, 700_000.0, 6_600_000.0, (-4, 9, 41, 51)),
        "EPSG:3347": (49.0, 77.0, 63.390675, -91.8666666666667, 6_200_000.0,
                      3_000_000.0, (-140, -50, 41, 84)),
        "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=39 +lon_0=-96 +x_0=0 +y_0=0":
            (33.0, 45.0, 39.0, -96.0, 0.0, 0.0, (-120, -70, 24, 52)),
    }
    rng = np.random.Generator(np.random.Philox(key=np.uint64(55)))
    for crs, (lat1, lat2, lat0, lon0, fe, fn, box) in cases.items():
        x0, y0 = transforms._fwd(crs, np.array([lon0]), np.array([lat0]))
        assert abs(x0[0] - fe) < 1e-6 and abs(y0[0] - fn) < 1e-6, crs
        lon = box[0] + (box[1] - box[0]) * rng.random(400)
        lat = box[2] + (box[3] - box[2]) * rng.random(400)
        x, y = transforms._fwd(crs, lon, lat)
        ilon, ilat = transforms._inv(crs, x, y)
        assert np.abs(ilon - lon).max() < 1e-9, crs
        assert np.abs(ilat - lat).max() < 1e-9, crs
        # scale 1 along both standard parallels
        d = 1e-4
        for sp in (lat1, lat2):
            x1, y1 = transforms._fwd(crs, np.array([lon0 - d]), np.array([sp]))
            x2, y2 = transforms._fwd(crs, np.array([lon0 + d]), np.array([sp]))
            proj = float(np.hypot(x2 - x1, y2 - y1)[0])
            phi = np.radians(sp)
            nu = transforms._WGS_A / np.sqrt(1 - transforms._E2 * np.sin(phi) ** 2)
            true = float(nu * np.cos(phi) * np.radians(2 * d))
            assert abs(proj / true - 1.0) < 1e-9, (crs, sp)
        # conformality at interior probe points: isotropic local scale
        # (|df/dlon-arc| == |df/dlat-arc|) and orthogonal image axes
        for plon, plat in [(lon0 + 4.0, (lat1 + lat2) / 2), (lon0 - 6.0, lat1)]:
            phi = np.radians(plat)
            nu = transforms._WGS_A / np.sqrt(1 - transforms._E2 * np.sin(phi) ** 2)
            rho_m = (transforms._WGS_A * (1 - transforms._E2)
                     / (1 - transforms._E2 * np.sin(phi) ** 2) ** 1.5)
            xa, ya = transforms._fwd(crs, np.array([plon - d]), np.array([plat]))
            xb, yb = transforms._fwd(crs, np.array([plon + d]), np.array([plat]))
            xc, yc = transforms._fwd(crs, np.array([plon]), np.array([plat - d]))
            xd, yd = transforms._fwd(crs, np.array([plon]), np.array([plat + d]))
            k = float(np.hypot(xb - xa, yb - ya)[0]) / float(
                nu * np.cos(phi) * np.radians(2 * d))
            h = float(np.hypot(xd - xc, yd - yc)[0]) / float(rho_m * np.radians(2 * d))
            assert abs(k / h - 1.0) < 1e-6, (crs, plon, plat)
            dot = float(((xb - xa) * (xd - xc) + (yb - ya) * (yd - yc))[0])
            norm = float((np.hypot(xb - xa, yb - ya) * np.hypot(xd - xc, yd - yc))[0])
            assert abs(dot / norm) < 1e-6, (crs, plon, plat)


def test_albers_invariants():
    """Albers equal-area conic (EPSG:5070 Conus, EPSG:3577 Australian —
    a SOUTHERN cone with n<0): origin anchor, round-trip at authalic-
    series precision, scale 1 along both standard parallels, and the
    EQUAL-AREA property (projected cell area == exact ellipsoid cell
    area via the authalic q) — which LCC provably fails, so the two
    conics cannot be confused by these gates."""
    cases = {
        "EPSG:5070": (29.5, 45.5, 23.0, -96.0, 0.0, 0.0, (-120, -70, 24, 49), (36.0, -100.0)),
        "EPSG:3577": (-18.0, -36.0, 0.0, 132.0, 0.0, 0.0, (115, 150, -43, -11), (-28.0, 140.0)),
    }
    rng = np.random.Generator(np.random.Philox(key=np.uint64(57)))
    for crs, (lat1, lat2, lat0, lon0, fe, fn, box, cell) in cases.items():
        x0, y0 = transforms._fwd(crs, np.array([lon0]), np.array([lat0]))
        assert abs(x0[0] - fe) < 1e-6 and abs(y0[0] - fn) < 1e-6, crs
        lon = box[0] + (box[1] - box[0]) * rng.random(400)
        lat = box[2] + (box[3] - box[2]) * rng.random(400)
        x, y = transforms._fwd(crs, lon, lat)
        ilon, ilat = transforms._inv(crs, x, y)
        assert np.abs(ilon - lon).max() < 5e-8, crs
        assert np.abs(ilat - lat).max() < 5e-8, crs
        d = 1e-4
        for sp in (lat1, lat2):
            x1, y1 = transforms._fwd(crs, np.array([lon0 - d]), np.array([sp]))
            x2, y2 = transforms._fwd(crs, np.array([lon0 + d]), np.array([sp]))
            proj = float(np.hypot(x2 - x1, y2 - y1)[0])
            phi = np.radians(sp)
            nu = transforms._WGS_A / np.sqrt(1 - transforms._E2 * np.sin(phi) ** 2)
            true = float(nu * np.cos(phi) * np.radians(2 * d))
            assert abs(proj / true - 1.0) < 1e-9, (crs, sp)
        clat, clon = cell
        X, Y = transforms._fwd(crs, *_densified_cell_ring(clon, clat))
        area = _shoelace(X, Y)
        exp = _authalic_cell_area(clat, clat + 1.0, 1.0)
        assert abs(area / exp - 1.0) < 1e-6, crs


def test_sinusoidal_and_eqc_invariants():
    """Sinusoidal (ellipsoidal ESRI:54008 and the spherical MODIS SIN
    grid) and equidistant cylindrical EPSG:4087.

    Sinusoidal: equal-area (projected cell == exact ellipsoid cell
    area), the central meridian maps to y == meridian arc with x == 0,
    and every parallel is TRUE TO SCALE (x spans a*m(phi)*dlam) —
    Snyder ch. 30.  MODIS SIN: x == R*lam*cos(phi), y == R*phi exactly.
    EqC: x == a*lam and meridian distances preserved."""
    # ellipsoidal sinusoidal
    crs = "ESRI:54008"
    lon = np.array([0.0, 10.0, -150.0, 60.0])
    lat = np.array([0.0, 47.3, -33.0, 80.0])
    x, y = transforms._fwd(crs, lon, lat)
    assert abs(x[0]) < 1e-9 and abs(y[0]) < 1e-9
    # parallel true to scale at every latitude probed
    m = transforms._m_ell(np.radians(lat))
    assert np.allclose(x, transforms._WGS_A * np.radians(lon) * m, rtol=0, atol=1e-6)
    # central meridian = meridian arc
    assert np.allclose(y, transforms._meridian_arc(np.radians(lat)), atol=1e-6)
    X, Y = transforms._fwd(crs, *_densified_cell_ring(11.0, 38.0))
    assert abs(_shoelace(X, Y) / _authalic_cell_area(38.0, 39.0, 1.0) - 1.0) < 1e-6
    lon2, lat2 = transforms._inv(crs, x, y)
    # rectifying-series lat error is amplified into lon by 1/cos(phi)
    # at the lat=80 probe; 1e-7 deg is ~3 mm on the parallel
    assert np.abs(lon2 - lon).max() < 1e-7 and np.abs(lat2 - lat).max() < 5e-8
    # spherical MODIS SIN grid
    R = 6371007.181
    crs = f"+proj=sinu +R={R} +lon_0=0 +x_0=0 +y_0=0"
    x, y = transforms._fwd(crs, lon, lat)
    assert np.allclose(x, R * np.radians(lon) * np.cos(np.radians(lat)), atol=1e-6)
    assert np.allclose(y, R * np.radians(lat), atol=1e-6)
    lon2, lat2 = transforms._inv(crs, x, y)
    assert np.abs(lon2 - lon).max() < 1e-10 and np.abs(lat2 - lat).max() < 1e-10
    # equidistant cylindrical
    x, y = transforms._fwd("EPSG:4087", lon, lat)
    assert np.allclose(x, transforms._WGS_A * np.radians(lon), atol=1e-6)
    assert np.allclose(y, transforms._meridian_arc(np.radians(lat)), atol=1e-6)
    lon2, lat2 = transforms._inv("EPSG:4087", x, y)
    assert np.abs(lon2 - lon).max() < 1e-8 and np.abs(lat2 - lat).max() < 1e-8


def test_conic_proj_string_validation():
    """Malformed conic proj strings fail loudly, never silently."""
    import pytest

    with pytest.raises(ValueError, match="lat_1"):
        transforms._fwd("+proj=lcc +lon_0=3", np.array([1.0]), np.array([45.0]))
    with pytest.raises(ValueError, match="POLAR"):
        # oblique stereographic is not analytic here — must be loud
        transforms._fwd("+proj=stere +lat_0=52", np.array([1.0]), np.array([45.0]))
    with pytest.raises(ValueError, match="unsupported CRS"):
        transforms._fwd("+proj=robin", np.array([1.0]), np.array([45.0]))


def test_warp_lcc_albers_sinu_roundtrip(spark):
    """End-to-end warp through the DataFrame API into each new conic/
    pseudocylindrical family and back onto the source grid (the
    target_align pattern) — interior pixels must survive the nearest
    round-trip.  The cones are centered on the scene (11.9E, 51.5N) so
    grid rotation stays small — the projections' correctness is pinned
    by the invariant tests; this test gates the warp WIRING."""
    src = datagen.pixels_for(0, 1, 764, 679, "int16", 42)
    src_t = [datagen.REF_PIXEL_X, 0.0, datagen.REF_ORIGIN[0],
             0.0, datagen.REF_PIXEL_Y, datagen.REF_ORIGIN[1]]
    for crs in ("+proj=lcc +lat_1=50 +lat_2=53 +lat_0=51.5 +lon_0=12",
                "+proj=aea +lat_1=50 +lat_2=53 +lat_0=51.5 +lon_0=12",
                "+proj=sinu +lon_0=12"):
        out = transforms.apply_transforms(
            _img0(spark),
            [transforms.warp(crs),
             transforms.warp("EPSG:4326", target_transform=src_t,
                             target_size=(679, 764))],
        )
        row = out.collect()[0]
        arr = codec.decode(row.bytes)
        assert arr.shape == (1, 764, 679), crs
        interior_match = np.mean(arr[:, 50:-50, 50:-50] == src[:, 50:-50, 50:-50])
        assert interior_match > 0.93, (crs, interior_match)


def test_ups_variant_a_published_anchor():
    """WGS 84 / UPS North & South (EPSG:5041/5042, polar stereographic
    VARIANT A — scale factor at the pole): the EPSG Guidance Note 7-2
    worked example (73N 44E -> E 3,320,416.75 N 632,668.43) must
    reproduce to < 1 cm, the pole must map to (FE, FN) exactly, and
    the inverse must close < 1e-9 deg."""
    x, y = transforms._fwd("EPSG:5041", np.array([44.0]), np.array([73.0]))
    assert abs(x[0] - 3_320_416.75) < 0.01
    assert abs(y[0] - 632_668.43) < 0.01
    lon, lat = transforms._inv("EPSG:5041", x, y)
    assert abs(lon[0] - 44.0) < 1e-9 and abs(lat[0] - 73.0) < 1e-8
    px, py = transforms._fwd("EPSG:5041", np.array([31.0]), np.array([90.0]))
    assert abs(px[0] - 2_000_000.0) < 1e-6 and abs(py[0] - 2_000_000.0) < 1e-6
    # south UPS: mirrored hemisphere, same grid origin at the pole
    px, py = transforms._fwd("EPSG:5042", np.array([31.0]), np.array([-90.0]))
    assert abs(px[0] - 2_000_000.0) < 1e-6 and abs(py[0] - 2_000_000.0) < 1e-6
    rng = np.random.Generator(np.random.Philox(key=np.uint64(61)))
    lon = -180.0 + 360.0 * rng.random(300)
    lat = -(60.0 + 29.9 * rng.random(300))
    lon2, lat2 = transforms._inv("EPSG:5042", *transforms._fwd("EPSG:5042", lon, lat))
    dlon = (lon2 - lon + 180.0) % 360.0 - 180.0
    assert np.abs(dlon * np.cos(np.radians(lat))).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9


def test_polar_stereo_variant_b_published_anchor():
    """EPSG:3032 (Australian Antarctic Polar Stereographic, variant B,
    lat_ts=71S lon0=70E FE=FN=6,000 km): the EPSG Guidance Note 7-2
    worked example 75S 120E -> E 7,255,380.79 N 7,053,389.56 to < 1 cm,
    and the equivalent +proj=stere string lands on the same grid."""
    x, y = transforms._fwd("EPSG:3032", np.array([120.0]), np.array([-75.0]))
    assert abs(x[0] - 7_255_380.79) < 0.01
    assert abs(y[0] - 7_053_389.56) < 0.01
    ps = "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=70 +x_0=6000000 +y_0=6000000"
    xs, ys = transforms._fwd(ps, np.array([120.0]), np.array([-75.0]))
    assert abs(xs[0] - x[0]) < 1e-9 and abs(ys[0] - y[0]) < 1e-9
    lon, lat = transforms._inv(ps, xs, ys)
    assert abs(lon[0] - 120.0) < 1e-9 and abs(lat[0] + 75.0) < 1e-9


def test_tmerc_proj_string_generalizes_utm():
    """+proj=tmerc with UTM parameters is bit-identical to the
    EPSG:326xx/327xx path; a shifted natural origin (lat_0 != 0) maps
    the origin to (x_0, y_0) exactly and inverts < 1e-8 deg."""
    rng = np.random.Generator(np.random.Philox(key=np.uint64(62)))
    lon = 12.0 + 6.0 * rng.random(200)
    lat = -70.0 + 140.0 * rng.random(200)
    xu, yu = transforms._fwd("EPSG:32633", lon, lat)
    xt, yt = transforms._fwd(
        "+proj=tmerc +lat_0=0 +lon_0=15 +k=0.9996 +x_0=500000 +y_0=0", lon, lat
    )
    assert np.abs(xu - xt).max() == 0.0 and np.abs(yu - yt).max() == 0.0
    osgb = "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 +y_0=-100000"
    x0, y0 = transforms._fwd(osgb, np.array([-2.0]), np.array([49.0]))
    assert abs(x0[0] - 400_000.0) < 1e-9 and abs(y0[0] + 100_000.0) < 1e-9
    lon = -2.0 + 3.0 * (rng.random(200) - 0.5)
    lat = 49.0 + 8.0 * (rng.random(200) - 0.5)
    lon2, lat2 = transforms._inv(osgb, *transforms._fwd(osgb, lon, lat))
    assert np.abs(lon2 - lon).max() < 1e-8 and np.abs(lat2 - lat).max() < 1e-8


def test_mercator_ellipsoidal_invariants():
    """EPSG:3395 (ellipsoidal Mercator): same eastings as spherical
    3857 (both a*lam at k0=1) but SMALLER northings (conformal-latitude
    compression); round-trip < 1e-9 deg; variant B's easting scales by
    exactly m(lat_ts); the e->0 limit recovers the spherical formula."""
    rng = np.random.Generator(np.random.Philox(key=np.uint64(63)))
    lon = -180.0 + 360.0 * rng.random(300)
    lat = -80.0 + 160.0 * rng.random(300)
    x95, y95 = transforms._fwd("EPSG:3395", lon, lat)
    x57, y57 = transforms._fwd("EPSG:3857", lon, lat)
    assert np.abs(x95 - x57).max() < 1e-6
    nz = np.abs(lat) > 1.0
    assert (np.abs(y95[nz]) < np.abs(y57[nz])).all()
    lon2, lat2 = transforms._inv("EPSG:3395", x95, y95)
    dlon = (lon2 - lon + 180.0) % 360.0 - 180.0
    assert np.abs(dlon * np.cos(np.radians(lat))).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9
    # variant B == variant A scaled by m(lat_ts)
    import math

    m30 = math.cos(math.radians(30.0)) / math.sqrt(
        1.0 - transforms._E2 * math.sin(math.radians(30.0)) ** 2
    )
    xb, yb = transforms._fwd("+proj=merc +lat_ts=30", lon, lat)
    assert np.abs(xb - m30 * x95).max() < 1e-6
    assert np.abs(yb - m30 * y95).max() < 1e-6


def test_family_proj_string_roundtrips():
    """Arbitrary-parameter proj strings for every newly parameterized
    family round-trip < 5e-8 deg (sub-cm; the authalic/rectifying
    series truncation at continental distances) on points inside their
    useful area, and +proj=longlat is the identity."""
    rng = np.random.Generator(np.random.Philox(key=np.uint64(64)))
    cases = {
        "+proj=laea +lat_0=45 +lon_0=-100 +x_0=12345 +y_0=-6789": (-130, -70, 20, 70),
        "+proj=stere +lat_0=90 +k=0.97 +lon_0=-30 +x_0=1000": (-180, 180, 45, 89),
        "+proj=stere +lat_0=-90 +lat_ts=-80 +lon_0=10": (-180, 180, -89, -45),
        "+proj=merc +k=0.75 +lon_0=40 +x_0=5000 +y_0=5000": (-140, 140, -70, 70),
        "+proj=eqc +lat_ts=37.5 +lon_0=12": (-170, 170, -80, 80),
        "+proj=tmerc +lat_0=-20 +lon_0=133 +k=1.2 +y_0=10000": (130, 136, -45, 5),
    }
    for crs, (lo0, lo1, la0, la1) in cases.items():
        lon = lo0 + (lo1 - lo0) * rng.random(200)
        lat = la0 + (la1 - la0) * rng.random(200)
        lon2, lat2 = transforms._inv(crs, *transforms._fwd(crs, lon, lat))
        dlon = (lon2 - lon + 180.0) % 360.0 - 180.0
        assert np.abs(dlon * np.cos(np.radians(lat))).max() < 5e-8, crs
        assert np.abs(lat2 - lat).max() < 5e-8, crs
    lon = np.array([1.5, -77.0])
    lat = np.array([-33.0, 8.0])
    for crs in ("+proj=longlat", "+proj=latlong +datum=WGS84"):
        x, y = transforms._fwd(crs, lon, lat)
        assert (x == lon).all() and (y == lat).all(), crs
        x, y = transforms._inv(crs, lon, lat)
        assert (x == lon).all() and (y == lat).all(), crs


def test_oblique_stereographic_rd_new_published_anchor():
    """+proj=sterea (EPSG method 9809, the oblique-stereographic
    double projection): the EPSG Guidance Note 7-2 worked example
    (Amersfoort / RD New on the Bessel ellipsoid: 53N 6E ->
    E 196,105.283 N 557,057.739) reproduces to < 1 cm, the natural
    origin maps to (x_0, y_0) exactly, and the inverse (conformal
    sphere -> Newton on the isometric latitude) closes < 1e-10 deg.
    +ellps selects the computation surface only — no datum shift."""
    rd = ("+proj=sterea +lat_0=52.156160555555556 +lon_0=5.387638888888889 "
          "+k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel")
    x, y = transforms._fwd(rd, np.array([6.0]), np.array([53.0]))
    assert abs(x[0] - 196_105.283) < 0.01
    assert abs(y[0] - 557_057.739) < 0.01
    lon, lat = transforms._inv(rd, x, y)
    assert abs(lon[0] - 6.0) < 1e-10 and abs(lat[0] - 53.0) < 1e-10
    x0, y0 = transforms._fwd(
        rd, np.array([5.387638888888889]), np.array([52.156160555555556])
    )
    assert abs(x0[0] - 155_000.0) < 1e-6 and abs(y0[0] - 463_000.0) < 1e-6


def test_oblique_stereographic_wgs84_invariants():
    """sterea on the default WGS84 surface: round-trip to machine
    precision over a +-10 deg window, CONFORMAL (local scale isotropic
    to 1e-6 relative), and unknown +ellps names fail loudly."""
    import math

    import pytest

    ob = "+proj=sterea +lat_0=46.5 +lon_0=7.4 +k=0.99985 +x_0=2000 +y_0=-1000"
    rng = np.random.Generator(np.random.Philox(key=np.uint64(65)))
    lon = 7.4 + 20.0 * (rng.random(300) - 0.5)
    lat = 46.5 + 16.0 * (rng.random(300) - 0.5)
    lon2, lat2 = transforms._inv(ob, *transforms._fwd(ob, lon, lat))
    assert np.abs(lon2 - lon).max() < 1e-12
    assert np.abs(lat2 - lat).max() < 1e-12
    d = 1e-6
    for L, P in [(10.0, 50.0), (0.0, 40.0), (14.0, 53.0)]:
        x0, y0 = transforms._fwd(ob, np.array([L]), np.array([P]))
        xe, ye = transforms._fwd(ob, np.array([L + d]), np.array([P]))
        xn, yn = transforms._fwd(ob, np.array([L]), np.array([P + d]))
        phi = math.radians(P)
        nu = transforms._WGS_A / math.sqrt(1 - transforms._E2 * math.sin(phi) ** 2)
        rho = (
            transforms._WGS_A * (1 - transforms._E2)
            / (1 - transforms._E2 * math.sin(phi) ** 2) ** 1.5
        )
        ke = math.hypot(xe[0] - x0[0], ye[0] - y0[0]) / (nu * math.cos(phi) * math.radians(d))
        kn = math.hypot(xn[0] - x0[0], yn[0] - y0[0]) / (rho * math.radians(d))
        assert abs(ke / kn - 1.0) < 1e-6, (L, P)
    with pytest.raises(ValueError, match="ellps"):
        transforms._fwd(
            "+proj=sterea +lat_0=10 +ellps=airy", np.array([1.0]), np.array([2.0])
        )


def test_warp_sterea_roundtrip(spark):
    """End-to-end warp through the DataFrame API into an oblique
    stereographic grid centered on the scene and back onto the source
    grid (target_align): interior pixels survive the nearest
    round-trip — the projections' correctness is pinned by the anchor/
    invariant tests; this pins the warp plumbing for the family."""
    src = datagen.pixels_for(0, 1, 764, 679, "int16", 42)
    src_t = [datagen.REF_PIXEL_X, 0.0, datagen.REF_ORIGIN[0],
             0.0, datagen.REF_PIXEL_Y, datagen.REF_ORIGIN[1]]
    ob = "+proj=sterea +lat_0=51.5 +lon_0=11.9 +k=1"
    out = transforms.apply_transforms(
        _img0(spark),
        [transforms.warp(ob),
         transforms.warp("EPSG:4326", target_transform=src_t,
                         target_size=(679, 764))],
    )
    row = out.collect()[0]
    arr = codec.decode(row.bytes)
    assert arr.shape == (1, 764, 679)
    interior_match = np.mean(arr[:, 50:-50, 50:-50] == src[:, 50:-50, 50:-50])
    assert interior_match > 0.93


def _raw_img(spark, arr, nodata):
    return spark.createDataFrame(
        [(
            "eq0", bytes(codec.encode(arr, "raw")), arr.shape[2], arr.shape[1],
            "raw", "", 0, arr.shape[0], "float64", "EPSG:4326",
            [0.25, 0.0, 0.0, 0.0, -0.25, 0.0], nodata,
            [0.0, 1.0, 1.0, 0.0, 0.0], [0.0, 0.0, -1.0, -1.0, 0.0], "X",
        )],
        datagen.IMAGES_SCHEMA,
    )


def test_equalize_differential(spark):
    rng = np.random.Generator(np.random.Philox(key=np.uint64(61)))
    arr = rng.integers(0, 40, size=(2, 9, 11)).astype(np.float64)
    arr[rng.random((2, 9, 11)) < 0.2] = -5.0  # nodata
    row = transforms.apply_transforms(
        _raw_img(spark, arr, -5.0), [transforms.equalize()], out_fmt="raw"
    ).first()
    got = codec.decode(bytes(row["bytes"]))
    # brute: per band, per pixel, integer cdf formula
    for b in range(2):
        vals = sorted(v for v in arr[b].ravel() if v != -5.0)
        n = len(vals)
        cmin = sum(1 for v in vals if v == vals[0])
        for r in range(9):
            for c in range(11):
                v = arr[b, r, c]
                if v == -5.0:
                    assert got[b, r, c] == -5.0
                    continue
                cdf = sum(1 for u in vals if u <= v)
                want = ((cdf - cmin) * 255 * 2 + (n - cmin)) // (2 * (n - cmin))
                assert got[b, r, c] == float(want), (b, r, c)
    # monotone: equal inputs -> equal outputs; order preserved
    flat_in, flat_out = arr[0].ravel(), got[0].ravel()
    ok = flat_in != -5.0
    order = np.argsort(flat_in[ok], kind="stable")
    assert np.all(np.diff(flat_out[ok][order]) >= 0)


def test_equalize_edge_cases(spark):
    # constant band -> 0 everywhere; full 0..255 range on a ramp
    const = np.full((1, 4, 4), 7.0)
    row = transforms.apply_transforms(
        _raw_img(spark, const, None), [transforms.equalize()], out_fmt="raw"
    ).first()
    assert np.all(codec.decode(bytes(row["bytes"])) == 0.0)
    ramp = np.arange(256, dtype=np.float64).reshape(1, 16, 16)
    row = transforms.apply_transforms(
        _raw_img(spark, ramp, None), [transforms.equalize()], out_fmt="raw"
    ).first()
    out = codec.decode(bytes(row["bytes"]))
    # a uniform ramp is already equalized: identity map 0..255
    assert out.min() == 0.0 and out.max() == 255.0
    assert np.all(np.diff(out.ravel()) >= 0)
    import pytest as _pt
    with _pt.raises(ValueError):
        transforms.equalize(levels=1)


def test_spectral_indices_differential(spark):
    from ukis_pysat_spark.operators import indices as indices_op

    rng = np.random.Generator(np.random.Philox(key=np.uint64(67)))
    arr = rng.integers(1, 300, size=(4, 6, 7)).astype(np.float64)
    arr[:, 0, :3] = 0.0  # nodata strip across all bands
    bm = {"nir": 3, "red": 2, "blue": 1, "green": 0, "swir": 3}
    # force an exact EVI zero denominator at one pixel:
    # nir + 6*red - 7.5*blue + 1 = 0 with blue even
    arr[3, 5, 6], arr[2, 5, 6], arr[1, 5, 6] = 5.0, 4.0, 4.0  # 5+24-30+1=0
    img = _raw_img(spark, arr, 0.0)
    for kind, expr in [
        ("ndvi", lambda p: (p["nir"] - p["red"]) / (p["nir"] + p["red"])),
        ("ndwi", lambda p: (p["green"] - p["nir"]) / (p["green"] + p["nir"])),
        ("savi", lambda p: ((p["nir"] - p["red"]) * 1.5)
                           / (p["nir"] + p["red"] + 0.5)),
        ("evi", lambda p: (2.5 * (p["nir"] - p["red"]))
                          / (p["nir"] + 6.0 * p["red"] - 7.5 * p["blue"] + 1.0)),
    ]:
        row = transforms.apply_transforms(
            img, [indices_op.spectral_index(kind, bm)], out_fmt="raw"
        ).first()
        got = codec.decode(bytes(row["bytes"]))
        assert got.shape == (1, 6, 7)
        assert row["nodata"] == -9999.0
        p = {n: arr[i] for n, i in bm.items()}
        with np.errstate(divide="ignore", invalid="ignore"):
            want = expr(p)
        for r in range(6):
            for c in range(7):
                if any(arr[bm[n], r, c] == 0.0 for n in
                       ("nir", "red", "blue", "green", "swir")):
                    assert got[0, r, c] == -9999.0, (kind, r, c)
                elif kind == "evi" and (r, c) == (5, 6):
                    assert got[0, r, c] == -9999.0  # exact zero denominator
                else:
                    assert got[0, r, c] == want[r, c], (kind, r, c)

    import pytest as _pt
    with _pt.raises(ValueError, match="unknown index"):
        indices_op.spectral_index("vari", bm)
    with _pt.raises(ValueError, match="needs bands"):
        indices_op.spectral_index("ndvi", {"nir": 3})
    with _pt.raises(Exception, match="out of range"):
        transforms.apply_transforms(
            img, [indices_op.spectral_index("ndvi", {"nir": 9, "red": 2})],
            out_fmt="raw",
        ).first()


def test_lcc_differential_vs_independent_snyder():
    """LCC forward/inverse (2SP and the 1SP +k_0 form, EPSG methods
    9802/9801) against an INDEPENDENT in-test transcription of Snyder
    1987 eqs. 15-1..15-11 / 7-9 (no shared code with the kernel): the
    projected coordinates must agree to < 1e-6 m and the inverse must
    close the loop to < 1e-9 deg."""
    a = 6378137.0
    e2 = 0.00669437999014
    e = math.sqrt(e2)

    def t_of(phi):
        return np.tan(np.pi / 4.0 - phi / 2.0) / (
            (1.0 - e * np.sin(phi)) / (1.0 + e * np.sin(phi))
        ) ** (e / 2.0)

    def m_of(phi):
        return np.cos(phi) / np.sqrt(1.0 - e2 * np.sin(phi) ** 2)

    def snyder_fwd(lon, lat, lat1, lat2, lat0, lon0, fe, fn, k0):
        p1, p2, p0 = map(math.radians, (lat1, lat2, lat0))
        if lat1 != lat2:
            n = (math.log(m_of(p1)) - math.log(m_of(p2))) / (
                math.log(t_of(p1)) - math.log(t_of(p2))
            )
        else:
            n = math.sin(p1)
        Fc = k0 * m_of(p1) / (n * t_of(p1) ** n)
        rho0 = a * Fc * t_of(p0) ** n
        phi = np.radians(lat)
        rho = a * Fc * t_of(phi) ** n
        th = n * np.radians(lon - lon0)
        return rho * np.sin(th) + fe, rho0 - rho * np.cos(th) + fn

    rng = np.random.Generator(np.random.Philox(key=np.uint64(77)))
    cases = [
        ("EPSG:2154", (49.0, 44.0, 46.5, 3.0, 700_000.0, 6_600_000.0, 1.0),
         (-4, 9, 41, 51)),
        ("+proj=lcc +lat_1=33 +lat_2=45 +lat_0=39 +lon_0=-96",
         (33.0, 45.0, 39.0, -96.0, 0.0, 0.0, 1.0), (-120, -70, 25, 50)),
        ("+proj=lcc +lat_1=18 +lat_0=18 +lon_0=-77 +k_0=0.98 "
         "+x_0=250000 +y_0=150000",
         (18.0, 18.0, 18.0, -77.0, 250_000.0, 150_000.0, 0.98),
         (-79, -75, 16.5, 19.5)),
        ("+proj=lcc +lat_1=-18 +lat_2=-36 +lat_0=-24 +lon_0=134",
         (-18.0, -36.0, -24.0, 134.0, 0.0, 0.0, 1.0),
         (115, 150, -40, -12)),  # southern cone, n < 0
    ]
    for crs, params, box in cases:
        lon = box[0] + (box[1] - box[0]) * rng.random(300)
        lat = box[2] + (box[3] - box[2]) * rng.random(300)
        gx, gy = snyder_fwd(lon, lat, *params)
        x, y = transforms._fwd(crs, lon, lat)
        assert np.abs(x - gx).max() < 1e-6, crs
        assert np.abs(y - gy).max() < 1e-6, crs
        ilon, ilat = transforms._inv(crs, x, y)
        assert np.abs(ilon - lon).max() < 1e-9, crs
        assert np.abs(ilat - lat).max() < 1e-9, crs


def test_lcc_1sp_scale_at_origin_is_k0():
    """1SP invariant (implementation-independent): the local scale
    factor along the standard parallel lat_0 equals k_0 exactly, and
    drifts above k_0 away from it (conformal cone tangent scaled by
    k_0 — Snyder ch. 15, EPSG 9801)."""
    crs = "+proj=lcc +lat_1=18 +lat_0=18 +lon_0=-77 +k_0=0.98"
    d = 1e-5
    for lat, expect in ((18.0, 0.98), (21.0, None), (15.0, None)):
        x1, y1 = transforms._fwd(crs, np.array([-77.0 - d]), np.array([lat]))
        x2, y2 = transforms._fwd(crs, np.array([-77.0 + d]), np.array([lat]))
        proj = float(np.hypot(x2 - x1, y2 - y1)[0])
        phi = math.radians(lat)
        nu = transforms._WGS_A / math.sqrt(1.0 - transforms._E2 * math.sin(phi) ** 2)
        true = nu * math.cos(phi) * math.radians(2 * d)
        k = proj / true
        if expect is not None:
            assert abs(k - expect) < 1e-9, (lat, k)
        else:
            assert k > 0.98 + 1e-6, (lat, k)


def test_stretch_and_equalize_reserve_nodata_code():
    """ADVICE r5: a valid low-percentile pixel must never land on the
    output nodata code — unsigned stretch maps valid into [1, 255],
    equalize with nodata 0 into [1, levels-1]; mid-range nodata that
    cannot be reserved raises instead of silently growing the mask."""
    arr = np.array([[[0.0, 5.0, 5.0, 9.0], [7.0, 8.0, 9.0, 5.0]]])
    meta = {"transform": [1, 0, 0, 0, -1, 0], "nodata": 0.0, "crs": "EPSG:4326"}
    out, m2 = transforms.stretch(0.0, 100.0)(arr.copy(), dict(meta))
    valid = out[arr != 0.0]
    assert m2["nodata"] == 0.0
    assert valid.min() >= 1 and valid.max() == 255  # code 0 is nodata-only
    assert (out[arr == 0.0] == 0).all()
    # degenerate (constant) band maps to the valid floor, not nodata
    const = np.full((1, 2, 2), 4.0)
    outc, _ = transforms.stretch(0.0, 100.0)(const, dict(meta))
    assert (outc == 1).all()
    # signed output with mid-range nodata cannot be reserved -> raise
    with pytest.raises(ValueError, match="inside dst"):
        transforms.stretch(0.0, 100.0, dst=(0.0, 255.0), out_dtype="int16")(
            arr.copy(), dict(meta, nodata=100.0)
        )

    eq, _ = transforms.equalize(256)(arr.copy(), dict(meta))
    ev = eq[arr != 0.0]
    assert ev.min() >= 1 and ev.max() == 255
    assert (eq[arr == 0.0] == 0).all()
    with pytest.raises(ValueError, match="reserved|rescale"):
        transforms.equalize(256)(arr.copy(), dict(meta, nodata=12.0))
    # nodata outside the range keeps the full span
    arr2 = np.array([[[-9999.0, 5.0, 7.0, 9.0]]])
    eq2, _ = transforms.equalize(256)(arr2, dict(meta, nodata=-9999.0))
    assert eq2[0, 0, 1] == 0.0 and eq2[0, 0, 3] == 255.0
