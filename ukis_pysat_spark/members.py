"""Platform dimension (reference: ukis_pysat/members.py:4-10).

String codes are used in DataFrame columns (broadcast-joinable,
Catalyst-prunable); the enum exists for API parity and validation.
"""

from __future__ import annotations

from enum import Enum


class Platform(Enum):
    Sentinel1 = "Sentinel-1"
    Sentinel2 = "Sentinel-2"
    Sentinel3 = "Sentinel-3"
    Landsat5 = "Landsat-5"
    Landsat7 = "Landsat-7"
    Landsat8 = "Landsat-8"


DN2TOA_PLATFORMS = {Platform.Landsat5, Platform.Landsat7, Platform.Landsat8, Platform.Sentinel2}
