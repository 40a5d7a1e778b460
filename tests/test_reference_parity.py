"""END-TO-END parity against the reference's OWN fixtures.

The reference validates dn2toa by converting a DN GeoTIFF with factors
from the scene's MTL/MTD file and comparing to a precomputed *_toa.tif
with np.allclose (/root/reference/tests/test_raster.py:241-336).  These
tests run the SAME inputs through THIS engine's full distributed path —
binaryFile scan -> geotiff decode -> images table, MTL/MTD parse ->
metadata table, broadcast join + Arrow dn2toa — and assert the same
allclose gate against the reference's golden rasters.  Tile/mask
goldens run on the real dummy.tif.  Skipped when the reference checkout
is absent.
"""

import glob
import os

import numpy as np
import pytest
import pyspark.sql.functions as F

from ukis_pysat_spark import codec
from ukis_pysat_spark.operators import tiling, transforms
from ukis_pysat_spark.sources import geotiff, ingest

REF = "/root/reference/tests/testfiles"
SAT = f"{REF}/satellite_data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SAT), reason="reference fixture checkout not present"
)

# the reference's own test matrix (tests/test_raster.py:241-308)
DN2TOA_CASES = [
    ("LC08_L1TP_193024_20200509_20200509_01_RT", "Landsat8", "MTL.txt",
     ["Aerosol", "Blue", "Green", "Red", "NIR", "SWIR1", "SWIR2", "Cirrus", "TIRS1", "TIRS2"]),
    ("LE07_L1TP_193024_20100420_20161215_01_T1", "Landsat7", "MTL.txt",
     ["Blue", "Green", "Red", "NIR", "SWIR1", "TIRS1", "TIRS2", "SWIR2"]),
    ("LT05_L1TP_193024_20050516_20161127_01_T1", "Landsat5", "MTL.txt",
     ["Blue", "Green", "Red", "NIR", "SWIR1", "TIRS", "SWIR2"]),
    ("S2B_MSIL1C_20200406T101559_N0209_R065_T32UPC_20200406T130159", "Sentinel2", "MTD.xml",
     ["Aerosol", "Blue", "Green", "Red", "Rededge1", "Rededge2", "Rededge3",
      "NIR", "Rededge4", "Watervapor", "Cirrus", "Swir1", "Swir2"]),
    ("S2B_MSIL1C_20220615T101559_N0400_R065_T32UPC_20220615T122549", "Sentinel2", "MTD.xml",
     ["Aerosol", "Blue", "Green", "Red", "Rededge1", "Rededge2", "Rededge3",
      "NIR", "Rededge4", "Watervapor", "Cirrus", "Swir1", "Swir2"]),
]


def test_geotiff_reader_fixture_inventory():
    """Shapes/dtypes of every fixture match SURVEY §5.3."""
    arr, meta = geotiff.read_geotiff(open(f"{REF}/dummy.tif", "rb").read())
    assert arr.shape == (1, 764, 679) and arr.dtype == np.int16
    assert meta["crs"] == "EPSG:4326"
    assert np.isclose(meta["transform"][0], 8.983152871870239e-05)
    assert np.isclose(meta["transform"][2], 11.896863892)
    assert np.isclose(meta["transform"][5], 51.515176657)
    shapes = {}
    for p in glob.glob(f"{SAT}/*.tif"):
        a, _ = geotiff.read_geotiff(open(p, "rb").read())
        shapes[os.path.basename(p)[:4], a.shape, str(a.dtype)] = True
    assert ("LC08", (10, 10, 10), "uint16") in shapes
    assert ("LE07", (8, 10, 10), "uint8") in shapes
    assert ("LT05", (7, 10, 10), "uint8") in shapes
    assert ("S2B_", (13, 10, 10), "uint16") in shapes
    assert ("S2B_", (13, 8, 9), "uint16") in shapes


@pytest.mark.parametrize("ident,platform,meta_suffix,wavelengths",
                         DN2TOA_CASES, ids=[c[0][:4] + c[0][-6:] for c in DN2TOA_CASES])
def test_dn2toa_matches_reference_golden(spark, ident, platform, meta_suffix, wavelengths):
    """THE reference correctness gate: dn2toa output == *_toa.tif."""
    files = ingest.scan_scene_files(spark, SAT, glob=f"{ident}.tif")
    images = geotiff.ingest_geotiffs(files)
    meta_files = ingest.scan_scene_files(spark, SAT, glob=f"{ident}_{meta_suffix}")
    metadata = ingest.parse_scene_metadata(meta_files)
    out = transforms.dn2toa(images, metadata, wavelengths=wavelengths).collect()
    assert len(out) == 1
    got = codec.decode(out[0].bytes)
    exp, _ = geotiff.read_geotiff(open(f"{SAT}/{ident}_toa.tif", "rb").read())
    assert got.shape == exp.shape
    assert got.dtype == np.float32
    # the reference's own assertion (tests/test_raster.py:334)
    assert np.allclose(got, exp, equal_nan=True)


def test_tiling_golden_on_real_dummy_tif(spark):
    """get_tiles goldens on the REAL dummy.tif (tests/test_raster.py:362-375)."""
    files = ingest.scan_scene_files(spark, REF, glob="dummy.tif", recursive=False)
    images = geotiff.ingest_geotiffs(files)
    tp = tiling.tile_pixels(images, 5, 5, 1)
    rows = {r.tile_id: r for r in tp.collect()}
    assert len(rows) == 20808
    r = rows[2578]
    assert (r.col_off, r.row_off, r.tw, r.th) == (79, 649, 7, 7)
    assert np.allclose(
        (r.left, r.bottom, r.right, r.top),
        (11.903960582768779, 51.45624717410995, 11.904589403469808, 51.45687599481152),
    )
    arr = codec.decode(r.px)
    assert arr.shape == (1, 7, 7)
    # window 2578 of dummy.tif is all zeros (reference test_raster.py:371)
    assert (arr == 0).all()


def test_mask_golden_on_real_dummy_tif(spark):
    """mask-to-bbox golden on the REAL dummy.tif (test_raster.py:166-186)."""
    files = ingest.scan_scene_files(spark, REF, glob="dummy.tif", recursive=False)
    images = geotiff.ingest_geotiffs(files)
    box = (11.9027457562112939, 51.4664152338322580, 11.9477435281016131, 51.5009522690838750)
    row = transforms.apply_transforms(images, [transforms.mask_bbox(box)]).collect()[0]
    assert (row.h, row.w) == (385, 502)
    a, _, c, _, e, f_ = row.transform
    got_bounds = (c, f_ + row.h * e, c + row.w * a, f_)
    exp = (11.902702941366716, 51.46639813686387, 11.947798368783504, 51.50098327545026)
    assert np.allclose(got_bounds, exp, atol=1e-9)
