"""Proximity raster (the ``gdal_proximity`` workflow): per-pixel
Euclidean distance to the nearest TARGET pixel, computed exactly.

GDAL users run gdal_proximity on the reference's masks (e.g. distance
to the nearest water/cloud pixel feeding a classifier); here it is a
:data:`~ukis_pysat_spark.operators.transforms.TransformFn`, so it
chains inside the same single ``mapInArrow`` stage as pixel_math /
sieve / terrain kernels — embarrassingly parallel per image, zero
shuffle at any scale.

Algorithm (exact, fully vectorized):

1. vertical pass — two row sweeps give each pixel the exact distance
   to the nearest target IN ITS COLUMN (O(h*w));
2. horizontal pass — ``D2(r, c) = min_d (d^2 + vdist(r, c+d)^2)`` over
   the shifted planes for ``|d| <= md``, where ``md`` is the maxdist
   bound in columns.  This decomposition is the standard exact
   two-pass squared EDT; bounding ``md`` costs nothing in accuracy for
   any pixel whose true distance is <= maxdist (a nearer target can
   never sit further than maxdist columns away).

Cost is O(h * w * md) elementwise mins.  At 100 TB the realistic use
is a bounded search radius (the GDAL ``-maxdist`` contract: beyond it
the fill value is emitted); leaving ``maxdist=None`` scans the full
width and is O(h * w^2) — exact but only sensible on moderate tiles.

Distances are sqrt of integer squared sums — bit-exact across engines
(IEEE sqrt is correctly rounded), which the driver's value-oracle
exploits.
"""

from __future__ import annotations

import math

import numpy as np


def _nearest_valid(valid: np.ndarray, maxdist_px: float | None):
    """Exact nearest-valid-pixel transport: returns (src_r, src_c, d2)
    per pixel, argmin over (d2, src_r, src_c) lexicographically — a
    total, partitioning-independent tie rule an oracle can replay.
    Same two-pass decomposition as the EDT, carrying the winner's
    coordinates through both passes."""
    h, w = valid.shape
    inf = float(h + w + 1)
    # vertical: nearest valid row per column, ties -> smaller row
    vd = np.where(valid, 0.0, inf)
    vr = np.where(valid, np.arange(h)[:, None], -1).astype(np.float64)
    for r in range(1, h):
        better = vd[r - 1] + 1.0 < vd[r]  # strict: up wins ties later
        vd[r] = np.where(better, vd[r - 1] + 1.0, vd[r])
        vr[r] = np.where(better, vr[r - 1], vr[r])
    for r in range(h - 2, -1, -1):
        better = vd[r + 1] + 1.0 < vd[r]  # strict: smaller row kept on tie
        vd[r] = np.where(better, vd[r + 1] + 1.0, vd[r])
        vr[r] = np.where(better, vr[r + 1], vr[r])
    v2 = vd * vd
    # horizontal: argmin over (d2, src_r, src_c); src_c = c + d
    d2 = v2.copy()
    src_r = vr.copy()
    src_c = np.broadcast_to(
        np.arange(w, dtype=np.float64)[None, :], (h, w)
    ).copy()
    src_c[vr < 0] = -1.0

    def consider(cand_d2, cand_r, cand_c, sl):
        cur_d2, cur_r, cur_c = d2[:, sl], src_r[:, sl], src_c[:, sl]
        take = (cand_d2 < cur_d2) | (
            (cand_d2 == cur_d2)
            & ((cand_r < cur_r) | ((cand_r == cur_r) & (cand_c < cur_c)))
        )
        d2[:, sl] = np.where(take, cand_d2, cur_d2)
        src_r[:, sl] = np.where(take, cand_r, cur_r)
        src_c[:, sl] = np.where(take, cand_c, cur_c)

    md = w - 1 if maxdist_px is None else min(int(np.ceil(maxdist_px)), w - 1)
    cols = np.arange(w, dtype=np.float64)
    for d in range(1, md + 1):
        dd = float(d * d)
        consider(v2[:, :-d] + dd, vr[:, :-d],
                 np.broadcast_to(cols[:-d], (h, w - d)), slice(d, None))
        consider(v2[:, d:] + dd, vr[:, d:],
                 np.broadcast_to(cols[d:], (h, w - d)), slice(None, w - d))
    return src_r.astype(np.int64), src_c.astype(np.int64), d2


def fillnodata(maxdist: float | None = None):
    """TransformFn (gdal.FillNodata workflow, nearest-neighbor
    variant): every nodata pixel takes the value of its nearest valid
    pixel (Euclidean; ties broken by smaller (row, col) — exact and
    deterministic), searching up to `maxdist` pixels.  Pixels with no
    valid pixel in reach stay nodata.  Valid pixels are untouched."""

    def t(arr: np.ndarray, meta: dict):
        nod = meta["nodata"]
        if nod is None:
            return arr, meta
        z = arr.astype(np.float64, copy=True)
        nb, h, w = z.shape
        for b in range(nb):
            plane = z[b]
            valid = plane != nod
            if valid.all() or not valid.any():
                continue
            sr, sc, d2 = _nearest_valid(valid, maxdist)
            dist = np.sqrt(d2)
            ok = (sr >= 0) & (dist <= (maxdist if maxdist is not None else np.inf))
            fill_from = plane[np.clip(sr, 0, h - 1), np.clip(sc, 0, w - 1)]
            z[b] = np.where(valid, plane, np.where(ok, fill_from, nod))
        return z, meta

    return t


def proximity(
    target_values: list[float] | None = None,
    maxdist: float | None = None,
    units: str = "pixel",
    fill: float = -1.0,
):
    """TransformFn: per-band Euclidean distance to the nearest target
    pixel.  Targets are pixels whose value is in `target_values`
    (default: every non-zero pixel — the gdal_proximity default).
    Distances beyond `maxdist` (same units as the output) emit `fill`.
    ``units='geo'`` scales by the pixel size (square pixels required);
    ``'pixel'`` leaves distances in pixel units."""
    if units not in ("pixel", "geo"):
        raise ValueError("units must be 'pixel' or 'geo'")

    def t(arr: np.ndarray, meta: dict):
        a, _, _, _, e, _ = meta["transform"]
        if units == "geo":
            if abs(abs(a) - abs(e)) > 1e-12 * max(abs(a), abs(e)):
                raise ValueError(
                    "units='geo' needs square pixels; warp to a square "
                    "grid first"
                )
            scale = abs(a)
        else:
            scale = 1.0
        md_px = None if maxdist is None else maxdist / scale
        z = arr.astype(np.float64, copy=False)
        nb, h, w = z.shape
        out = np.empty((nb, h, w), dtype=np.float64)
        inf = float(h + w + 1)
        for b in range(nb):
            plane = z[b]
            if target_values is None:
                tgt = plane != 0.0
            else:
                tgt = np.isin(plane, np.asarray(target_values, dtype=np.float64))
            vd = np.where(tgt, 0.0, inf)
            for r in range(1, h):
                np.minimum(vd[r], vd[r - 1] + 1.0, out=vd[r])
            for r in range(h - 2, -1, -1):
                np.minimum(vd[r], vd[r + 1] + 1.0, out=vd[r])
            v2 = vd * vd
            d2 = v2.copy()
            md = w - 1 if md_px is None else min(int(np.ceil(md_px)), w - 1)
            for d in range(1, md + 1):
                dd = float(d * d)
                np.minimum(d2[:, d:], v2[:, :-d] + dd, out=d2[:, d:])
                np.minimum(d2[:, :-d], v2[:, d:] + dd, out=d2[:, :-d])
            dist = np.sqrt(d2) * scale
            # no-target pixels carry the sentinel (> any real distance)
            lim = math.hypot(h, w) * scale if maxdist is None else maxdist
            out[b] = np.where(dist > lim, fill, dist)
        return out, dict(meta, nodata=fill)

    return t
