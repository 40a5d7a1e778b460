"""Scene-metadata scalar functions — pure Column expressions.

Re-expresses the reference's filename/footprint parsers
(ukis_pysat/file.py:65-254) as JVM-side Spark SQL expressions: no UDFs,
no Python on executors, fully codegen-able and usable in any query.

Semantics parity notes (file:line cites into /root/reference):
- polarization: filename[13:16] -> {SSV,SSH,SDV,SDH} map, non-dual takes
  the first of a dual pair (file.py:82-92).
- timestamps: S2 -> '_'-split field 2; S1 -> field 4 (start) / 5 (stop);
  S3 -> fixed slices [16:31] / [32:47]; always UTC (file.py:116-127).
- UTM proj string: zone/band of the footprint's area-weighted centroid
  (shapely centroid semantics) incl. the Norway/Svalbard zone
  exceptions of the `utm` package (file.py:236-254).
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F

_TS_FMT = "yyyyMMdd'T'HHmmss"


def polarization_from_s1_filename(filename: Column, dual: bool = False) -> Column:
    """file.py:65-93: filename[13:16] -> polarization code(s)."""
    code = F.substring(filename, 14, 3)
    pol = (
        F.when(code == "SSV", F.lit("VV"))
        .when(code == "SSH", F.lit("HH"))
        .when(code == "SDV", F.lit("VV,VH"))
        .when(code == "SDH", F.lit("HH,HV"))
    )
    if dual:
        return pol
    return F.split(pol, ",").getItem(0)


def ts_from_sentinel_filename(filename: Column, start_date: bool = True) -> Column:
    """file.py:96-127: platform-dispatched timestamp extraction (UTC)."""
    s2 = F.split(filename, "_").getItem(2)
    s1 = F.split(filename, "_").getItem(4 if start_date else 5)
    s3 = F.substring(filename, 17, 15) if start_date else F.substring(filename, 33, 15)
    raw = (
        F.when(filename.startswith("S2"), s2)
        .when(filename.startswith("S1"), s1)
        .otherwise(s3)
    )
    return F.to_timestamp(raw, _TS_FMT)


def sat_ts_from_datetime(ts: Column) -> Column:
    """file.py:130-140: datetime -> ESA filename timestamp string."""
    return F.date_format(ts, _TS_FMT)


def ring_centroid_cols(ring_lon: Column, ring_lat: Column) -> tuple[Column, Column]:
    """Area-weighted polygon centroid as relational expressions
    (shapely `.centroid` semantics used at file.py:252).

    Expects a closed ring (first == last vertex). Falls back to the
    vertex mean for degenerate zero-area rings.
    """
    n = F.size(ring_lon)
    idx = F.sequence(F.lit(1), n - 1)  # 1-based edges: (i, i+1)
    xi = lambda i: F.element_at(ring_lon, i)  # noqa: E731
    yi = lambda i: F.element_at(ring_lat, i)  # noqa: E731
    cross = F.transform(idx, lambda i: xi(i) * yi(i + 1) - xi(i + 1) * yi(i))
    area2 = F.aggregate(cross, F.lit(0.0), lambda acc, v: acc + v)  # 2*area
    cx_num = F.aggregate(
        F.transform(idx, lambda i: (xi(i) + xi(i + 1)) * (xi(i) * yi(i + 1) - xi(i + 1) * yi(i))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    cy_num = F.aggregate(
        F.transform(idx, lambda i: (yi(i) + yi(i + 1)) * (xi(i) * yi(i + 1) - xi(i + 1) * yi(i))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    mean_x = F.aggregate(F.slice(ring_lon, 1, n - 1), F.lit(0.0), lambda a, v: a + v) / (
        n - 1
    ).cast("double")
    mean_y = F.aggregate(F.slice(ring_lat, 1, n - 1), F.lit(0.0), lambda a, v: a + v) / (
        n - 1
    ).cast("double")
    cx = F.when(area2 == 0.0, mean_x).otherwise(cx_num / (F.lit(3.0) * area2))
    cy = F.when(area2 == 0.0, mean_y).otherwise(cy_num / (F.lit(3.0) * area2))
    return cx, cy


_UTM_LETTERS = "CDEFGHJKLMNPQRSTUVWX"


def utm_zone_col(lon: Column, lat: Column) -> Column:
    """UTM zone number incl. Norway/Svalbard exceptions (utm package
    parity, used by get_proj_string, file.py:252)."""
    base = (F.floor((lon + 180.0) / 6.0) + 1).cast("int")
    return (
        F.when((lat >= 56.0) & (lat < 64.0) & (lon >= 3.0) & (lon < 12.0), F.lit(32))
        .when((lat >= 72.0) & (lat <= 84.0) & (lon >= 0.0) & (lon < 9.0), F.lit(31))
        .when((lat >= 72.0) & (lat <= 84.0) & (lon >= 9.0) & (lon < 21.0), F.lit(33))
        .when((lat >= 72.0) & (lat <= 84.0) & (lon >= 21.0) & (lon < 33.0), F.lit(35))
        .when((lat >= 72.0) & (lat <= 84.0) & (lon >= 33.0) & (lon < 42.0), F.lit(37))
        .otherwise(base)
    )


def utm_letter(lat: Column) -> Column:
    idx = F.least(
        F.greatest(F.floor((lat + 80.0) / 8.0).cast("int"), F.lit(0)),
        F.lit(len(_UTM_LETTERS) - 1),
    )
    return F.substring(F.lit(_UTM_LETTERS), idx + 1, 1)


def proj_string_from_footprint(ring_lon: Column, ring_lat: Column) -> Column:
    """file.py:236-254: '+proj=utm +zone=<zone><letter>, +ellps=WGS84
    +datum=WGS84 +units=m +no_defs' of the footprint centroid."""
    cx, cy = ring_centroid_cols(ring_lon, ring_lat)
    return F.concat(
        F.lit("+proj=utm +zone="),
        utm_zone_col(cx, cy).cast("string"),
        utm_letter(cy),
        F.lit(", +ellps=WGS84 +datum=WGS84 +units=m +no_defs"),
    )


PIXEL_SPACING_DEG_PER_10M = 8.983152841195215e-5  # file.py:230 constant


def pixel_spacing_degree(spacing_m: Column) -> Column:
    """file.py:230: meters -> degrees via the reference's constant."""
    return (spacing_m / F.lit(10.0)) * F.lit(PIXEL_SPACING_DEG_PER_10M)
