"""Wavelength -> band lookup (reference P10, raster.py:424-483).

The reference keeps a static per-platform dict from wavelength name
("blue", "nir", ...) to band LABEL ("1", "6_VCID_1", "10", ...); dn2toa
uses the label to pick MTL factor keys while the POSITION of the
wavelength in the request list indexes the pixel array
(raster.py:337-386: ``for idx, b in enumerate(self._lookup_bands(...))``).

Engine mapping (SURVEY.md §2.2): the tables become a broadcast
``create_map`` literal for relational queries (`wavelength_band_col`)
plus plain-Python helpers used inside the dn2toa Arrow stage
(`lookup_bands`, `band_indices`).
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F

# verbatim parity with reference raster.py:432-481
WAVE_BANDS: dict[str, dict[str, str]] = {
    "Landsat5": {
        "blue": "1",
        "green": "2",
        "red": "3",
        "nir": "4",
        "swir1": "5",
        "tirs": "6",
        "swir2": "7",
    },
    "Landsat7": {
        "blue": "1",
        "green": "2",
        "red": "3",
        "nir": "4",
        "swir1": "5",
        "tirs1": "6_VCID_1",
        "tirs2": "6_VCID_2",
        "swir2": "7",
        "pan": "8",
    },
    "Landsat8": {
        "aerosol": "1",
        "blue": "2",
        "green": "3",
        "red": "4",
        "nir": "5",
        "swir1": "6",
        "swir2": "7",
        "pan": "8",
        "cirrus": "9",
        "tirs1": "10",
        "tirs2": "11",
    },
    "Sentinel2": {
        "aerosol": "0",
        "blue": "1",
        "green": "2",
        "red": "3",
        "rededge1": "4",
        "rededge2": "5",
        "rededge3": "6",
        "nir": "7",
        "rededge4": "8",
        "watervapor": "9",
        "cirrus": "10",
        "swir1": "11",
        "swir2": "12",
    },
}

# full-band order per platform: position of a label in this list is the
# band's index in the image payload (and in the metadata factor arrays)
BAND_ORDER: dict[str, list[str]] = {
    p: list(m.values()) for p, m in WAVE_BANDS.items()
}


def _norm_platform(platform: str) -> str:
    return platform.replace("-", "")


def lookup_bands(platform: str, wavelengths: list[str]) -> list[str]:
    """Reference-parity _lookup_bands: wavelength names -> band labels.

    Raises KeyError for unknown platform/wavelength (the reference does
    the same via dict indexing)."""
    table = WAVE_BANDS[_norm_platform(platform)]
    return [table[w.lower()] for w in wavelengths]


def band_indices(platform: str, wavelengths: list[str] | None) -> list[int] | None:
    """Positions of the requested wavelengths' bands in the platform's
    full band stack (None = all bands, in stack order)."""
    if wavelengths is None:
        return None
    p = _norm_platform(platform)
    order = BAND_ORDER[p]
    return [order.index(label) for label in lookup_bands(p, wavelengths)]


def is_thermal_label(platform: str, label: str) -> bool:
    """Thermal-band test on the label (raster.py:338-341 semantics):
    Landsat-8 bands 10/11; other Landsats any band starting '6';
    Sentinel-2 has no thermal bands."""
    p = _norm_platform(platform)
    if p == "Landsat8":
        return label in ("10", "11")
    if p.startswith("Landsat"):
        return label.startswith("6")
    return False


def wavelength_band_col(platform: Column, wavelength: Column) -> Column:
    """Relational wavelength->band-label lookup: a broadcast map literal
    per platform behind a CASE dispatch — pure JVM, usable in any query
    (and checkable against a SQL CASE oracle)."""
    expr = F.lit(None).cast("string")
    normed = F.replace(platform, F.lit("-"), F.lit(""))
    for p, table in WAVE_BANDS.items():
        kv = []
        for k, v in table.items():
            kv.extend([F.lit(k), F.lit(v)])
        expr = F.when(normed == p, F.element_at(F.create_map(*kv), F.lower(wavelength))).otherwise(
            expr
        )
    return expr


def band_index_col(platform: Column, wavelength: Column) -> Column:
    """Relational wavelength -> band POSITION in the platform stack."""
    expr = F.lit(None).cast("int")
    normed = F.replace(platform, F.lit("-"), F.lit(""))
    for p, table in WAVE_BANDS.items():
        order = BAND_ORDER[p]
        kv = []
        for k, v in table.items():
            kv.extend([F.lit(k), F.lit(order.index(v))])
        expr = F.when(normed == p, F.element_at(F.create_map(*kv), F.lower(wavelength))).otherwise(
            expr
        )
    return expr
