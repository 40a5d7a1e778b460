"""Spectral indices: the standard EO band-math catalog (NDVI & co).

The reference stops at dn2toa (raster.py:236-334) and leaves index math
to the caller's numpy; here each index is a TransformFn that chains
into the same single-``mapInArrow`` payload pipeline as pixel_math /
warp / dn2toa — one decode per image, no extra stage, no shuffle.

Determinism/oracle contract: every index is a fixed-order IEEE
expression over the selected band planes (each +,-,*,/ correctly
rounded), so for integer-valued DNs the result is bit-reproducible in
any engine — the driver's DuckDB twin replays the same expression over
the closed-form pixel grid.  Pixels where any input band is nodata, or
where the denominator is exactly 0, emit ``out_nodata``.

Catalog (band names -> meaning):
  ndvi  (nir, red)          (nir - red) / (nir + red)
  ndwi  (green, nir)        (green - nir) / (green + nir)   [McFeeters]
  ndbi  (swir, nir)         (swir - nir) / (swir + nir)
  savi  (nir, red)          ((nir - red) * 1.5) / (nir + red + 0.5)
  evi   (nir, red, blue)    (2.5 * (nir - red))
                            / (nir + 6.0 * red - 7.5 * blue + 1.0)
"""

from __future__ import annotations

import numpy as np

_INDICES = {
    "ndvi": ("nir", "red"),
    "ndwi": ("green", "nir"),
    "ndbi": ("swir", "nir"),
    "savi": ("nir", "red"),
    "evi": ("nir", "red", "blue"),
}


def _compute(kind: str, p: dict[str, np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """(numerator-applied value, denominator) in the documented
    expression order; the caller masks den == 0."""
    if kind == "ndvi":
        den = p["nir"] + p["red"]
        return (p["nir"] - p["red"]) / np.where(den == 0.0, 1.0, den), den
    if kind == "ndwi":
        den = p["green"] + p["nir"]
        return (p["green"] - p["nir"]) / np.where(den == 0.0, 1.0, den), den
    if kind == "ndbi":
        den = p["swir"] + p["nir"]
        return (p["swir"] - p["nir"]) / np.where(den == 0.0, 1.0, den), den
    if kind == "savi":
        den = p["nir"] + p["red"] + 0.5
        return ((p["nir"] - p["red"]) * 1.5) / np.where(den == 0.0, 1.0, den), den
    if kind == "evi":
        den = p["nir"] + 6.0 * p["red"] - 7.5 * p["blue"] + 1.0
        return (2.5 * (p["nir"] - p["red"])) / np.where(den == 0.0, 1.0, den), den
    raise ValueError(f"unknown index {kind!r}")


def spectral_index(
    kind: str, band_map: dict[str, int], out_nodata: float = -9999.0
):
    """TransformFn computing one spectral index plane from a multi-band
    payload.  ``band_map`` names the required bands' array indices,
    e.g. ``spectral_index("ndvi", {"nir": 3, "red": 2})``.  Output is a
    single-band float64 payload with nodata ``out_nodata``."""
    need = _INDICES.get(kind)
    if need is None:
        raise ValueError(
            f"unknown index {kind!r}; have {sorted(_INDICES)}"
        )
    missing = [n for n in need if n not in band_map]
    if missing:
        raise ValueError(f"{kind} needs bands {missing}")

    def t(arr: np.ndarray, meta: dict):
        nod = meta["nodata"]
        nb = arr.shape[0]
        for n in need:
            if not 0 <= band_map[n] < nb:
                raise ValueError(
                    f"band {n}={band_map[n]} out of range for {nb}-band image"
                )
        p = {n: arr[band_map[n]].astype(np.float64) for n in need}
        val, den = _compute(kind, p)
        ok = den != 0.0
        if nod is not None:
            for n in need:
                ok &= p[n] != nod
        out = np.where(ok, val, out_nodata)[None]
        return out, dict(meta, nodata=out_nodata)

    return t
