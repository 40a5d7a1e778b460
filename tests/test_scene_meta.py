"""Scene-metadata function goldens — inputs/outputs from the reference's
public doctests and unit tests (/root/reference/ukis_pysat/file.py
doctests; /root/reference/tests/test_file.py)."""

import datetime as dt
import os
import zipfile

import pyspark.sql.functions as F
import pytest

from ukis_pysat_spark.functions import scene_meta
from ukis_pysat_spark.sources import ingest

S1_SDH = "MMM_BB_TTTR_1SDH_YYYYMMDDTHHMMSS_YYYYMMDDTHHMMSS_OOOOOO_DDDDDD_CCCC.SAFE.zip"
S1_SSH = "MMM_BB_TTTR_1SSH_YYYYMMDDTHHMMSS_YYYYMMDDTHHMMSS_OOOOOO_DDDDDD_CCCC.SAFE.zip"
S1_SSV = "MMM_BB_TTTR_2SSV_YYYYMMDDTHHMMSS_YYYYMMDDTHHMMSS_OOOOOO_DDDDDD_CCCC.SAFE.zip"
S1_SDV = "MMM_BB_TTTR_1SDV_YYYYMMDDTHHMMSS_YYYYMMDDTHHMMSS_OOOOOO_DDDDDD_CCCC.SAFE.zip"
S1_START = "S1M_BB_TTTR_LFPP_20200113T074619_YYYYMMDDTHHMMSS_OOOOOO_DDDDDD_CCCC.SAFE.zip"
S1_STOP = "S1M_BB_TTTR_LFPP_YYYYMMDDTHHMMSS_20200113T002219_OOOOOO_DDDDDD_CCCC.SAFE.zip"
S2_NAME = "S2AM_MSIXXX_20200113T074619_Nxxyy_ROOO_Txxxxx_PD.SAFE"
S3_NAME = "S3M_OL_L_TTT____20200113T074619_YYYYMMDDTHHMMSS_YYYYMMDDTHHMMSS_i_GGG_c.SEN3"
S3_STOP = "S3M_OL_L_TTTTTT_yyyymmddThhmmss_20200113T074619_YYYYMMDDTHHMMSS_i_GGG_c.SEN3"

# reference footprint golden (tests/test_file.py:109-114)
REF_RING_LONLAT = [
    (149.766922, -24.439564),
    (153.728622, -23.51771),
    (154.075058, -24.737713),
    (150.077042, -25.668921),
    (149.766922, -24.439564),
]


def test_polarization(spark):
    df = spark.createDataFrame(
        [(S1_SDH,), (S1_SSH,), (S1_SSV,), (S1_SDV,)], ["fn"]
    )
    got = df.select(
        scene_meta.polarization_from_s1_filename(F.col("fn")).alias("single"),
        scene_meta.polarization_from_s1_filename(F.col("fn"), dual=True).alias("dual"),
    ).collect()
    assert [r.single for r in got] == ["HH", "HH", "VV", "VV"]
    assert [r.dual for r in got] == ["HH,HV", "HH", "VV", "VV,VH"]


def test_timestamps(spark):
    df = spark.createDataFrame(
        [(S1_START, True), (S1_STOP, False), (S2_NAME, True), (S3_NAME, True), (S3_STOP, False)],
        ["fn", "start"],
    )
    start = df.filter("start").select(
        scene_meta.ts_from_sentinel_filename(F.col("fn")).alias("ts"), "fn"
    ).collect()
    stop = df.filter("NOT start").select(
        scene_meta.ts_from_sentinel_filename(F.col("fn"), start_date=False).alias("ts"), "fn"
    ).collect()
    exp_start = dt.datetime(2020, 1, 13, 7, 46, 19)
    assert all(r.ts == exp_start for r in start)
    assert {r.ts for r in stop} == {dt.datetime(2020, 1, 13, 0, 22, 19),
                                    dt.datetime(2020, 1, 13, 7, 46, 19)}


def test_sat_ts_roundtrip(spark):
    df = spark.createDataFrame([(dt.datetime(2020, 1, 13, 7, 46, 19),)], ["ts"])
    got = df.select(scene_meta.sat_ts_from_datetime(F.col("ts")).alias("s")).collect()[0].s
    assert got == "20200113T074619"


def test_proj_string_golden(spark):
    # reference golden: zone 56J for the manifest footprint
    # (tests/test_file.py:141-145)
    lons = [p[0] for p in REF_RING_LONLAT]
    lats = [p[1] for p in REF_RING_LONLAT]
    df = spark.createDataFrame([(lons, lats)], ["ring_lon", "ring_lat"])
    got = df.select(
        scene_meta.proj_string_from_footprint(F.col("ring_lon"), F.col("ring_lat")).alias("p")
    ).collect()[0].p
    assert got == "+proj=utm +zone=56J, +ellps=WGS84 +datum=WGS84 +units=m +no_defs"


def test_pixel_spacing_degree(spark):
    df = spark.createDataFrame([(40.0,)], ["m"])
    got = df.select(scene_meta.pixel_spacing_degree(F.col("m")).alias("d")).collect()[0].d
    assert got == 0.0003593261136478086  # file.py doctest golden


MANIFEST_XML = b"""<?xml version="1.0" encoding="UTF-8"?>
<xfdu:XFDU xmlns:xfdu="urn:ccsds:schema:xfdu:1" xmlns:gml="http://www.opengis.net/gml"
           xmlns:safe="http://www.esa.int/safe/sentinel-1.0">
  <metadataSection>
    <metadataObject>
      <metadataWrap><xmlData>
        <safe:processing><safe:facility country="United Kingdom">
          <safe:software name="Sentinel-1 IPF" version="2.82"/>
        </safe:facility></safe:processing>
      </xmlData></metadataWrap>
    </metadataObject>
    <metadataObject>
      <metadataWrap><xmlData><frameSet><frame><footPrint>
        <gml:coordinates>-24.439564,149.766922 -23.517710,153.728622 -24.737713,154.075058 -25.668921,150.077042</gml:coordinates>
      </footPrint></frame></frameSet></xmlData></metadataWrap>
    </metadataObject>
  </metadataSection>
</xfdu:XFDU>"""

ANNOTATION_XML = b"""<?xml version="1.0"?>
<product><imageAnnotation><imageInformation>
  <rangePixelSpacing>4.000000e+01</rangePixelSpacing>
</imageInformation></imageAnnotation></product>"""


def test_parse_manifest(spark, tmp_path):
    p = tmp_path / "manifest.safe"
    p.write_bytes(MANIFEST_XML)
    files = ingest.scan_scene_files(spark, str(tmp_path), glob="*.safe")
    row = ingest.parse_manifests(files).collect()[0]
    assert row.origin == "United Kingdom"
    assert row.ipf == 2.82
    # lat/lon swap + ring closure (file.py:165-168)
    assert row.footprint_lon[0] == 149.766922 and row.footprint_lat[0] == -24.439564
    assert row.footprint_lon[-1] == row.footprint_lon[0]
    assert len(row.footprint_lon) == 5


def test_parse_annotation(spark, tmp_path):
    ann = tmp_path / "annotation"
    ann.mkdir()
    (ann / "s1b-ew-grd-hh-20200325.xml").write_bytes(ANNOTATION_XML)
    (ann / "s1b-ew-grd-vv-20200325.xml").write_bytes(ANNOTATION_XML)
    files = ingest.scan_scene_files(spark, str(ann), glob="*.xml")
    rows = ingest.parse_annotations(files, polarization="HH").collect()
    assert len(rows) == 1
    assert rows[0].spacing_m == 40.0
    assert rows[0].spacing_deg == 0.0003593261136478086
    assert ingest.parse_annotations(files, polarization="FF").count() == 0


def test_scene_dir_scan_with_zip(spark, tmp_path):
    # zip containing a scene dir is discovered without extraction
    # (reference unzips to a tempdir + chdir, file.py:50-60)
    zp = tmp_path / "S1M_hello_from_inside.zip"
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("S1M_hello_from_inside/data.txt", "x")
    os.mkdir(tmp_path / "S2__IN_FOLDER")
    (tmp_path / "S2__IN_FOLDER" / "f.txt").write_text("y")
    (tmp_path / "not_a_scene.txt").write_text("z")
    files = ingest.scan_scene_files(spark, str(tmp_path))
    rows = ingest.list_scene_idents(files).collect()
    idents = {r.ident for r in rows}
    kinds = {(r.ident, r.kind) for r in rows}
    assert "S1M_hello_from_inside" in idents
    # scene DIRECTORIES are first-class idents (reference file.py:29-62)
    assert ("S2__IN_FOLDER", "dir") in kinds
    assert not any("not_a_scene" in i for i in idents)


# --- MTL / MTD rescale-factor ingestion (reference raster.py:294-331,391-401)

MTL_C1 = """GROUP = L1_METADATA_FILE
  GROUP = METADATA_FILE_INFO
    COLLECTION_NUMBER = 01
  END_GROUP = METADATA_FILE_INFO
  GROUP = IMAGE_ATTRIBUTES
    SUN_ELEVATION = 53.65148658
  END_GROUP = IMAGE_ATTRIBUTES
  GROUP = RADIOMETRIC_RESCALING
    RADIANCE_MULT_BAND_10 = 3.3420E-04
    RADIANCE_ADD_BAND_10 = 0.10000
    RADIANCE_MULT_BAND_11 = 3.3420E-04
    RADIANCE_ADD_BAND_11 = 0.10000
    REFLECTANCE_MULT_BAND_1 = 2.0000E-05
    REFLECTANCE_ADD_BAND_1 = -0.100000
    REFLECTANCE_MULT_BAND_2 = 2.0000E-05
    REFLECTANCE_ADD_BAND_2 = -0.100000
  END_GROUP = RADIOMETRIC_RESCALING
  GROUP = TIRS_THERMAL_CONSTANTS
    K1_CONSTANT_BAND_10 = 774.8853
    K2_CONSTANT_BAND_10 = 1321.0789
    K1_CONSTANT_BAND_11 = 480.8883
    K2_CONSTANT_BAND_11 = 1201.1442
  END_GROUP = TIRS_THERMAL_CONSTANTS
END_GROUP = L1_METADATA_FILE
END
"""

MTL_C2 = MTL_C1.replace("L1_METADATA_FILE", "LANDSAT_METADATA_FILE").replace(
    "RADIOMETRIC_RESCALING", "LEVEL1_RADIOMETRIC_RESCALING"
).replace("TIRS_THERMAL_CONSTANTS", "LEVEL1_THERMAL_CONSTANTS").replace(
    "COLLECTION_NUMBER = 01", "COLLECTION_NUMBER = 02"
)

MTD_B4 = b"""<?xml version="1.0"?>
<n1:Level-1C_User_Product xmlns:n1="https://psd-14.sentinel2.eo.esa.int/PSD/User_Product_Level-1C.xsd">
  <n1:General_Info>
    <Product_Info><PROCESSING_BASELINE>04.00</PROCESSING_BASELINE></Product_Info>
    <Product_Image_Characteristics>
      <QUANTIFICATION_VALUE unit="none">10000</QUANTIFICATION_VALUE>
      <Radiometric_Offset_List>
        <RADIO_ADD_OFFSET band_id="0">-1000</RADIO_ADD_OFFSET>
        <RADIO_ADD_OFFSET band_id="1">-1000</RADIO_ADD_OFFSET>
        <RADIO_ADD_OFFSET band_id="12">-1000</RADIO_ADD_OFFSET>
      </Radiometric_Offset_List>
    </Product_Image_Characteristics>
  </n1:General_Info>
</n1:Level-1C_User_Product>
"""


def test_metadata_from_mtl_collections():
    for text, coll in ((MTL_C1, 1), (MTL_C2, 2)):
        m = ingest.metadata_from_mtl(text, "Landsat8", "scene1")
        assert m["sun_elevation"] == 53.65148658
        # band order Landsat8: ... positions of labels '10','11' are 9,10
        assert m["mult_radiance"][9] == 3.3420e-04
        assert m["k1"][9] == 774.8853 and m["k2"][10] == 1201.1442
        assert m["mult_reflectance"][0] == 2.0000e-05
        assert m["thermal_band_idx"] == [9, 10]


def test_metadata_from_mtl_unsupported_collection():
    bad = MTL_C1.replace("COLLECTION_NUMBER = 01", "COLLECTION_NUMBER = 03")
    with pytest.raises(ValueError, match="COLLECTION_NUMBER"):
        ingest.metadata_from_mtl(bad, "Landsat8", "x")


def test_metadata_from_mtd_baseline4():
    m = ingest.metadata_from_mtd(MTD_B4, "s2scene")
    assert m["processing_baseline"] == 4.0
    assert m["quantification_value"] == 10000.0
    assert m["radio_add_offset"][0] == -1000.0
    assert m["radio_add_offset"][12] == -1000.0
    assert m["radio_add_offset"][5] == 0.0
    # baseline < 4 zeroes the offsets (raster.py:411-413)
    m_old = ingest.metadata_from_mtd(MTD_B4.replace(b"04.00", b"02.09"), "s")
    assert all(v == 0.0 for v in m_old["radio_add_offset"])


def test_mtl_feeds_dn2toa_end_to_end(spark, tmp_path):
    """Parse a synthetic MTL via the binaryFile scan path and run dn2toa
    end-to-end; thermal output matches the closed-form numpy oracle."""
    import numpy as np
    from ukis_pysat_spark import codec, datagen
    from ukis_pysat_spark.operators import transforms

    (tmp_path / "LC08_TEST_SCENE_MTL.txt").write_text(MTL_C1)
    files = ingest.scan_scene_files(spark, str(tmp_path), glob="*_MTL.txt")
    meta = ingest.parse_scene_metadata(files).withColumn(
        "image_id", F.lit("img00000000")
    )
    imgs = transforms.apply_transforms(
        datagen.gen_images(spark, 1, profile="bench"),
        [transforms.pixel_math(lambda a: np.concatenate([a, a], axis=0))],
    ).withColumn("platform", F.lit("Landsat8"))
    out = transforms.dn2toa(imgs, meta, wavelengths=["Blue", "TIRS1"]).collect()[0]
    got = codec.decode(out.bytes)
    dn = datagen.pixels_for(0, 1, 128, 128, "int16", 42).astype(np.float32)[0]
    sin_e = np.float32(np.sin(np.radians(53.65148658)))
    exp_blue = (np.float32(2.0e-05) * dn + np.float32(-0.1)) / sin_e
    L = np.float32(3.342e-04) * dn + np.float32(0.1)
    exp_tirs = np.float32(1321.0789) / np.log(np.float32(774.8853) / L + 1.0)
    assert got.shape[0] == 2
    assert np.allclose(got[0], exp_blue, equal_nan=True)
    assert np.allclose(got[1], exp_tirs, equal_nan=True)


def test_mtd_feeds_dn2toa_end_to_end(spark, tmp_path):
    import numpy as np
    from ukis_pysat_spark import codec, datagen
    from ukis_pysat_spark.operators import transforms

    (tmp_path / "S2B_TEST_SCENE_MTD.xml").write_bytes(MTD_B4)
    files = ingest.scan_scene_files(spark, str(tmp_path), glob="*_MTD.xml")
    meta = ingest.parse_scene_metadata(files).withColumn(
        "image_id", F.lit("img00000000")
    )
    imgs = datagen.gen_images(spark, 1, profile="bench").withColumn(
        "platform", F.lit("Sentinel2")
    )
    out = transforms.dn2toa(imgs, meta, wavelengths=["Aerosol"]).collect()[0]
    got = codec.decode(out.bytes)
    dn = datagen.pixels_for(0, 1, 128, 128, "int16", 42).astype(np.float32)[0]
    assert np.allclose(got[0], (dn + np.float32(-1000.0)) / np.float32(10000.0))
