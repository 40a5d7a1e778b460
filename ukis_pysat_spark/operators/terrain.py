"""Terrain analysis (the ``gdaldem`` family) and focal statistics as
fused per-pixel transforms.

The reference hands rasters to GDAL for everything beyond per-band
arithmetic; EO users chain ``gdaldem slope/aspect/hillshade`` (and
QGIS/GRASS ``r.neighbors`` focal windows) on the same scenes the
reference tiles (ukis_pysat/raster.py:84-102 exposes the raw array for
exactly this kind of follow-up math).  Here each operator is a
:data:`~ukis_pysat_spark.operators.transforms.TransformFn`, so it runs
inside the same single-``mapInArrow`` stage as pixel_math / warp /
dn2toa — one decode + one encode per image however many steps are
chained, and embarrassingly parallel across images (no shuffle at any
scale).

Semantics follow the gdaldem documentation (Horn 1981 kernel):

- derivatives come from the 3x3 Horn stencil divided by ``8 * res``;
- the outermost row/column has no full stencil and emits nodata
  (gdaldem's default, i.e. without ``-compute_edges``);
- a nodata CENTER emits nodata; nodata NEIGHBORS are replaced by the
  center value (gdaldem's interpolation rule), so isolated gaps do not
  punch 3x3 holes in the output;
- ``aspect`` is the azimuth of the downslope direction in degrees
  clockwise from map north, flat cells emit nodata;
- ``hillshade`` is the classic Lambertian formula quantized to uint8
  1..255 with 0 reserved for nodata.

``focal`` is a k x k moving-window aggregate (sum/count/min/max/mean)
over VALID pixels with the window clipped at the image edge — the
``r.neighbors`` contract.  The box passes are separable (two 1-D
sweeps), so cost is O(pixels) per axis, independent of window size for
sum/count and O(k * pixels) for min/max.

Numerical note: expressions are written in the exact operation order
the driver's DuckDB value-oracles replay (``sqrt(p*p + q*q)`` rather
than ``hypot``, explicit ``180/pi`` multiplies), so per-pixel outputs
are bit-comparable after a round(6) guard against libm ulp drift.
"""

from __future__ import annotations

import math

import numpy as np

# degrees-per-radian as the literal double both engines multiply by
_DEG = 180.0 / math.pi


def _stencil(arr: np.ndarray, nod):
    """Interior 3x3 stencil views, nodata-aware (the gdaldem generic
    rule): returns ``(center, n, ok)`` where ``center`` is the interior
    plane (bands, h-2, w-2), ``n(dr, dc)`` yields the shifted neighbor
    plane with nodata NEIGHBORS replaced by the center value, and
    ``ok`` marks valid centers.  Degenerate (< 3x3) grids return empty
    interiors."""
    z = arr.astype(np.float64, copy=False)
    h, w = z.shape[-2], z.shape[-1]
    if h < 3 or w < 3:
        shp = (z.shape[0], max(h - 2, 0), max(w - 2, 0))
        zero = np.zeros(shp)
        return zero, lambda dr, dc: zero, np.zeros(shp, dtype=bool)
    center = z[:, 1 : h - 1, 1 : w - 1]
    ok = np.ones(center.shape, dtype=bool) if nod is None else center != nod

    def n(dr: int, dc: int) -> np.ndarray:
        v = z[:, 1 + dr : h - 1 + dr, 1 + dc : w - 1 + dc]
        if nod is None:
            return v
        return np.where(v == nod, center, v)

    return center, n, ok


# the 8 neighbor offsets in gdaldem's window order (row-major, no center)
_NBR8 = ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1))


def _horn(arr: np.ndarray, xres: float, yres: float, nod):
    """Horn-kernel derivatives on the interior grid, nodata-aware.

    Returns ``(p, q, ok)``, each shaped (bands, h-2, w-2): ``p`` is
    dz/dx (map +x axis), ``q`` is dz/dy (map +y axis — with a north-up
    transform ``yres < 0``, positive q means the surface rises
    northward), ``ok`` marks valid centers.  Nodata neighbors are
    replaced by the center value before the stencil is applied.
    """
    _, n, ok = _stencil(arr, nod)
    z1, z2, z3 = n(-1, -1), n(-1, 0), n(-1, 1)
    z4, z6 = n(0, -1), n(0, 1)
    z7, z8, z9 = n(1, -1), n(1, 0), n(1, 1)
    p = ((z3 + 2.0 * z6 + z9) - (z1 + 2.0 * z4 + z7)) / (8.0 * xres)
    q = ((z7 + 2.0 * z8 + z9) - (z1 + 2.0 * z2 + z3)) / (8.0 * yres)
    return p, q, ok


def _frame(vals: np.ndarray, ok: np.ndarray, bands: int, h: int, w: int, fill: float):
    """Place interior values back into a full-size float64 plane with a
    nodata frame (the gdaldem no---compute_edges layout)."""
    out = np.full((bands, h, w), fill, dtype=np.float64)
    if vals.size:
        out[:, 1 : h - 1, 1 : w - 1] = np.where(ok, vals, fill)
    return out


def slope(scale: float = 1.0, percent: bool = False, out_nodata: float = -9999.0):
    """``gdaldem slope``: steepest-descent angle from the Horn
    derivatives.  ``scale`` is the vertical/horizontal unit ratio
    (gdaldem ``-s``); ``percent=True`` gives 100*rise/run instead of
    degrees."""

    def t(arr: np.ndarray, meta: dict):
        a, _, _, _, e, _ = meta["transform"]
        nb, h, w = arr.shape
        p, q, ok = _horn(arr, a, e, meta["nodata"])
        g = np.sqrt(p * p + q * q) / scale
        s = 100.0 * g if percent else np.arctan(g) * _DEG
        out = _frame(s, ok, nb, h, w, out_nodata)
        return out, dict(meta, nodata=out_nodata)

    return t


def aspect(out_nodata: float = -9999.0):
    """``gdaldem aspect``: azimuth of the downslope direction, degrees
    clockwise from map north in [0, 360); flat cells emit nodata."""

    def t(arr: np.ndarray, meta: dict):
        a, _, _, _, e, _ = meta["transform"]
        nb, h, w = arr.shape
        p, q, ok = _horn(arr, a, e, meta["nodata"])
        flat = (p == 0.0) & (q == 0.0)
        d = np.arctan2(-p, -q) * _DEG
        # + 0.0 normalizes the one negative-zero case (p == 0, q < 0
        # gives atan2(-0.0, +x) = -0.0, which the < 0 branch keeps) so
        # outputs are sign-of-zero comparable with SQL twins computing
        # atan2(0.0 - p, 0.0 - q)
        d = np.where(d < 0.0, d + 360.0, d) + 0.0
        out = _frame(np.where(flat, out_nodata, d), ok, nb, h, w, out_nodata)
        return out, dict(meta, nodata=out_nodata)

    return t


def hillshade(
    azimuth: float = 315.0,
    altitude: float = 45.0,
    z: float = 1.0,
    scale: float = 1.0,
):
    """``gdaldem hillshade``: Lambertian shading quantized to uint8
    1..255; 0 is the nodata value (edges and nodata centers)."""
    sin_alt = math.sin(math.radians(altitude))
    cos_alt = math.cos(math.radians(altitude))
    # east / north sun-vector factors folded into python constants so
    # the SQL twin can inline the identical double literals
    c_east = math.sin(math.radians(azimuth)) * cos_alt
    c_north = math.cos(math.radians(azimuth)) * cos_alt
    zf = z / scale

    def t(arr: np.ndarray, meta: dict):
        a, _, _, _, e, _ = meta["transform"]
        nb, h, w = arr.shape
        p, q, ok = _horn(arr, a, e, meta["nodata"])
        pz = p * zf
        qz = q * zf
        cos_i = (sin_alt - pz * c_east - qz * c_north) / np.sqrt(
            1.0 + pz * pz + qz * qz
        )
        shade = np.floor(1.0 + 254.0 * np.maximum(cos_i, 0.0) + 0.5)
        out = _frame(shade, ok, nb, h, w, 0.0).astype(np.uint8)
        return out, dict(meta, nodata=0.0)

    return t


def hillshade_constants(azimuth: float = 315.0, altitude: float = 45.0):
    """(sin_alt, c_east, c_north) as the exact double literals the
    hillshade kernel multiplies by — for SQL value-oracle twins."""
    cos_alt = math.cos(math.radians(altitude))
    return (
        math.sin(math.radians(altitude)),
        math.sin(math.radians(azimuth)) * cos_alt,
        math.cos(math.radians(azimuth)) * cos_alt,
    )


def tri(alg: str = "Riley", out_nodata: float = -9999.0):
    """``gdaldem TRI``: terrain ruggedness index over the 8-neighbor
    window.  ``alg='Riley'`` (the gdaldem default since 3.3) is the
    square root of the sum of squared center-neighbor differences
    (Riley et al. 1999); ``alg='Wilson'`` is the mean absolute
    center-neighbor difference (Wilson et al. 2007, the bathymetry
    variant).  Nodata neighbors collapse to the center (contributing
    zero difference), matching the family rule in the module
    docstring.  With integer DNs both variants are bit-reproducible:
    the sums are exact integers and IEEE sqrt / the dyadic /8 are
    correctly rounded."""
    if alg not in ("Riley", "Wilson"):
        raise ValueError(f"unknown TRI algorithm {alg!r}")

    def t(arr: np.ndarray, meta: dict):
        nb, h, w = arr.shape
        center, n, ok = _stencil(arr, meta["nodata"])
        if alg == "Riley":
            ss = np.zeros(center.shape)
            for dr, dc in _NBR8:
                d = n(dr, dc) - center
                ss += d * d
            v = np.sqrt(ss)
        else:
            sa = np.zeros(center.shape)
            for dr, dc in _NBR8:
                sa += np.abs(n(dr, dc) - center)
            v = sa / 8.0
        out = _frame(v, ok, nb, h, w, out_nodata)
        return out, dict(meta, nodata=out_nodata)

    return t


def tpi(out_nodata: float = -9999.0):
    """``gdaldem TPI``: topographic position index — center elevation
    minus the mean of its 8 neighbors (positive on ridges, negative in
    valleys).  Integer DNs make it bit-reproducible (integer neighbor
    sum, one dyadic /8, one subtraction)."""

    def t(arr: np.ndarray, meta: dict):
        nb, h, w = arr.shape
        center, n, ok = _stencil(arr, meta["nodata"])
        s = np.zeros(center.shape)
        for dr, dc in _NBR8:
            s += n(dr, dc)
        out = _frame(center - s / 8.0, ok, nb, h, w, out_nodata)
        return out, dict(meta, nodata=out_nodata)

    return t


def roughness(out_nodata: float = -9999.0):
    """``gdaldem roughness``: largest inter-cell elevation difference
    in the 3x3 window (max over the 9 cells minus min, nodata
    neighbors collapsed to the center).  Pure integer arithmetic on
    integer DNs."""

    def t(arr: np.ndarray, meta: dict):
        nb, h, w = arr.shape
        center, n, ok = _stencil(arr, meta["nodata"])
        mx = center.copy()
        mn = center.copy()
        for dr, dc in _NBR8:
            v = n(dr, dc)
            np.maximum(mx, v, out=mx)
            np.minimum(mn, v, out=mn)
        out = _frame(mx - mn, ok, nb, h, w, out_nodata)
        return out, dict(meta, nodata=out_nodata)

    return t


def color_relief(ramp, nv_color=(0, 0, 0), mode: str = "interp"):
    """``gdaldem color-relief``: map band 1's values through an
    elevation->RGB ramp to a 3-band uint8 raster.

    ``ramp`` is a sorted list of ``(value, r, g, b)`` entries.  With
    ``mode='interp'`` (gdaldem's default) colors between entries are
    linearly interpolated channel-wise and rounded half-up as
    ``floor(lo_c + (v - lo) * (hi_c - lo_c) / (hi - lo) + 0.5)`` — the
    exact operation order the driver's SQL twin replays; values below
    the first / above the last entry clamp to the end colors.
    ``mode='nearest'`` (gdaldem ``-nearest_color_entry``) snaps to the
    entry with the smallest absolute distance, lower entry winning
    ties.  Nodata pixels emit ``nv_color`` (the ``nv`` ramp line);
    output nodata metadata is cleared (colors are data everywhere,
    GDAL's behavior without an alpha band)."""
    if len(ramp) < 1:
        raise ValueError("color_relief needs at least one ramp entry")
    vals = [float(e[0]) for e in ramp]
    if sorted(vals) != vals:
        raise ValueError("ramp entries must be sorted by value")
    if mode not in ("interp", "nearest"):
        raise ValueError(f"unknown color_relief mode {mode!r}")
    v_arr = np.asarray(vals)
    c_arr = np.asarray([[float(e[1 + k]) for e in ramp] for k in range(3)])
    nv = np.asarray(nv_color, dtype=np.float64)

    def t(arr: np.ndarray, meta: dict):
        nod = meta["nodata"]
        z = arr[0].astype(np.float64, copy=False)
        h, w = z.shape
        ok = np.ones(z.shape, dtype=bool) if nod is None else z != nod
        out = np.empty((3, h, w), dtype=np.float64)
        if mode == "nearest":
            # lower entry wins ties: searchsorted on midpoints, left side
            mids = (v_arr[:-1] + v_arr[1:]) / 2.0
            idx = np.searchsorted(mids, z, side="left")
            for k in range(3):
                out[k] = c_arr[k][idx]
        else:
            hi = np.clip(np.searchsorted(v_arr, z, side="left"), 1, len(vals) - 1)
            lo = hi - 1
            span = v_arr[hi] - v_arr[lo]
            ratio_num = z - v_arr[lo]
            for k in range(3):
                lo_c = c_arr[k][lo]
                dc = c_arr[k][hi] - c_arr[k][lo]
                with np.errstate(divide="ignore", invalid="ignore"):
                    interp = np.floor(
                        lo_c + ratio_num * dc / np.where(span == 0.0, 1.0, span)
                        + 0.5
                    )
                below = z <= v_arr[0]
                above = z >= v_arr[-1]
                out[k] = np.where(
                    below, c_arr[k][0], np.where(above, c_arr[k][-1], interp)
                )
        for k in range(3):
            out[k] = np.where(ok, out[k], nv[k])
        out8 = np.clip(out, 0.0, 255.0).astype(np.uint8)
        return out8, dict(meta, nodata=None)

    return t


def viewshed(
    obs,
    oh: float = 2.0,
    tz: float = 0.0,
    geo: bool = False,
    maxdist: int | None = None,
    visible: int = 255,
    invisible: int = 0,
    out_value: int = 0,
):
    """``gdal_viewshed`` analog: uint8 visibility mask of band 1 from
    an observer ``oh`` above the surface (R3 exact line-of-sight, the
    brute algorithm gdal_viewshed's Wang DP approximates).

    Semantics (replayed verbatim by the driver's SQL twin):

    - the ray to a target at Chebyshev distance ``d`` is sampled at
      the ``d - 1`` integer crossings of its MAJOR axis; the minor
      coordinate there is the exact rational ``offset * k / d``,
      interpolated between the two adjacent cells as
      ``z0 + (z1 - z0) * rem / d`` with integer ``rem = num - d *
      floor(num / d)`` — every engine computes the identical IEEE
      expression;
    - the target (+ ``tz``) is visible iff no crossing's slope beats
      its own: blocked when ``(zk - zo) * d > (zt + tz - zo) * k``
      (grazing sight lines count visible);
    - nodata crossings never block (``z0`` nodata, or ``z1`` nodata
      when the interpolation actually uses it); nodata targets emit 0;
      an observer on nodata yields an all-zero mask (gdal errors —
      a Spark stage must not);
    - ``maxdist`` bounds the Chebyshev radius (gdal ``-md``); beyond
      it cells emit ``out_value``.  Cost is O(pixels * min(diameter,
      maxdist)) — bound maxdist on large scenes, as with gdal.

    ``obs`` is (row, col) pixel coords, or (x, y) georeferenced when
    ``geo=True`` (inverse affine, floor to the containing pixel).
    Output: 1 band uint8, visible/invisible/out_value, nodata cleared.
    """

    def t(arr: np.ndarray, meta: dict):
        nod = meta["nodata"]
        z = arr[0].astype(np.float64, copy=False)
        h, w = z.shape
        if geo:
            a, bb, c_, dd, e, f_ = meta["transform"]
            ox, oy = float(obs[0]), float(obs[1])
            det = a * e - bb * dd
            colf = (e * (ox - c_) - bb * (oy - f_)) / det
            rowf = (-dd * (ox - c_) + a * (oy - f_)) / det
            orow, ocol = int(math.floor(rowf)), int(math.floor(colf))
        else:
            orow, ocol = int(obs[0]), int(obs[1])
        if not (0 <= orow < h and 0 <= ocol < w):
            raise ValueError(f"observer ({orow}, {ocol}) outside the {h}x{w} raster")
        out = np.zeros((1, h, w), dtype=np.uint8)
        if nod is not None and z[orow, ocol] == nod:
            return out, dict(meta, nodata=None)
        zo = z[orow, ocol] + oh
        rr = np.arange(h, dtype=np.int64)[:, None]
        cc = np.arange(w, dtype=np.int64)[None, :]
        drr = rr - orow
        dcc = cc - ocol
        d = np.maximum(np.abs(drr), np.abs(dcc))
        valid_t = np.ones(z.shape, dtype=bool) if nod is None else z != nod
        zt_num = z + tz - zo
        blocked = np.zeros(z.shape, dtype=bool)
        kmax = int(d.max()) if maxdist is None else min(int(d.max()), int(maxdist))
        # targets beyond maxdist emit out_value regardless of
        # visibility (the final np.where overwrites them), and each
        # target's LOS is independent — so they are excluded from the
        # ray loop outright.  On a maxdist-bounded scene this shrinks
        # the active set from O(h*w) to O(maxdist^2) with identical
        # output pixels.
        target_ok = (
            valid_t if maxdist is None else (valid_t & (d <= int(maxdist)))
        )
        for k in range(1, kmax):
            rs, cs = np.nonzero((d > k) & ~blocked & target_ok)
            if rs.size == 0:
                break
            dr_s = rs - orow
            dc_s = cs - ocol
            dsel = np.maximum(np.abs(dr_s), np.abs(dc_s))
            row_major = np.abs(dr_s) >= np.abs(dc_s)
            num = np.where(row_major, dc_s, dr_s) * k
            off0 = num // dsel  # floor division, matching SQL floor(num / d)
            rem = num - off0 * dsel
            maj = np.where(row_major, orow + np.sign(dr_s) * k,
                           ocol + np.sign(dc_s) * k)
            mino = np.where(row_major, ocol, orow) + off0
            r0 = np.where(row_major, maj, mino)
            c0 = np.where(row_major, mino, maj)
            r1 = np.where(row_major, r0, np.minimum(r0 + 1, h - 1))
            c1 = np.where(row_major, np.minimum(c0 + 1, w - 1), c0)
            z0 = z[r0, c0]
            z1 = z[r1, c1]
            zk = z0 + (z1 - z0) * rem / dsel
            if nod is None:
                skip = np.zeros(rs.shape, dtype=bool)
            else:
                skip = (z0 == nod) | ((rem != 0) & (z1 == nod))
            blk = ~skip & ((zk - zo) * dsel > zt_num[rs, cs] * k)
            blocked[rs[blk], cs[blk]] = True
        vis = np.where(blocked, invisible, visible)
        res = np.where(valid_t, vis, 0)
        if maxdist is not None:
            res = np.where(d > maxdist, out_value, res)
        out[0] = res.astype(np.uint8)
        return out, dict(meta, nodata=None)

    return t


# D8 neighbors in ESRI code order (E, SE, S, SW, W, NW, N, NE); the
# diagonal distance weight is the shared double literal both engines
# multiply by (see flow_dir)
_D8 = (
    ((0, 1), 1.0), ((1, 1), 2.0), ((1, 0), 4.0), ((1, -1), 8.0),
    ((0, -1), 16.0), ((-1, -1), 32.0), ((-1, 0), 64.0), ((-1, 1), 128.0),
)
_INV_DIAG = 1.0 / math.sqrt(2.0)


def flow_dir(out_nodata: float = -9999.0):
    """D8 flow direction (ESRI/ArcGIS ``FlowDirection`` convention):
    each cell flows to the neighbor with the steepest positive
    distance-weighted drop ``(z - z_n) * inv_dist`` (diagonals weighted
    by 1/sqrt(2)); codes are E=1, SE=2, S=4, SW=8, W=16, NW=32, N=64,
    NE=128.  Ties pick the SMALLEST code (scan order with a strict
    comparison — total and partitioning-independent); pits and flats
    (no positive drop) emit 0; nodata neighbors and cells beyond the
    edge never receive flow; nodata centers emit ``out_nodata``.
    Applies per band, edges included (computed from the neighbors that
    exist, the richdem convention — not the gdaldem nodata frame)."""

    def t(arr: np.ndarray, meta: dict):
        nod = meta["nodata"]
        z = arr.astype(np.float64, copy=False)
        valid = np.ones(z.shape, dtype=bool) if nod is None else z != nod
        code, _, _ = _d8_best(z, valid)
        out = np.where(valid, code, out_nodata)
        return out, dict(meta, nodata=out_nodata)

    return t


def _d8_best(z: np.ndarray, valid: np.ndarray):
    """Shared D8 steepest-descent scan over (bands, h, w): returns
    ``(code, dnr, dnc)`` — the winning ESRI code (0 for pits/flats)
    and the winning neighbor's row/col offsets (0 where code is 0).
    Tie rule: smallest code (strict > in ESRI scan order)."""
    _, h, w = z.shape
    best = np.full(z.shape, -np.inf)
    code = np.zeros(z.shape)
    dnr = np.zeros(z.shape, dtype=np.int64)
    dnc = np.zeros(z.shape, dtype=np.int64)

    def shifted(plane, dr, dc, fill):
        s = np.full(plane.shape, fill, dtype=plane.dtype)
        rs_dst = slice(max(-dr, 0), h - max(dr, 0))
        cs_dst = slice(max(-dc, 0), w - max(dc, 0))
        rs_src = slice(max(dr, 0), h - max(-dr, 0))
        cs_src = slice(max(dc, 0), w - max(-dc, 0))
        s[:, rs_dst, cs_dst] = plane[:, rs_src, cs_src]
        return s

    for (dr, dc), cd in _D8:
        zn = shifted(z, dr, dc, 0.0)
        vn = shifted(valid, dr, dc, False)
        inv = _INV_DIAG if dr != 0 and dc != 0 else 1.0
        score = (z - zn) * inv
        cand = vn & (score > best)
        best = np.where(cand, score, best)
        code = np.where(cand, cd, code)
        dnr = np.where(cand, dr, dnr)
        dnc = np.where(cand, dc, dnc)
    downhill = best > 0.0
    code = np.where(downhill, code, 0.0)
    dnr = np.where(downhill, dnr, 0)
    dnc = np.where(downhill, dnc, 0)
    return code, dnr, dnc


def basins(out_nodata: float = -1.0):
    """Drainage basins from D8 flow: every cell is labeled with the
    FLAT INDEX (r * w + c) of the pit/flat cell its steepest-descent
    path terminates at — a canonical, partitioning-independent basin
    id (the same min-flat-index idea as polygonize labels).  Paths are
    strictly downhill (a positive-drop D8 step always decreases z), so
    they are acyclic and finite; pointer doubling resolves every path
    in O(log(h*w)) vectorized passes.  Pits label themselves; nodata
    cells emit ``out_nodata``.  Applies per band."""

    def t(arr: np.ndarray, meta: dict):
        nod = meta["nodata"]
        z = arr.astype(np.float64, copy=False)
        nb, h, w = z.shape
        valid = np.ones(z.shape, dtype=bool) if nod is None else z != nod
        _, dnr, dnc = _d8_best(z, valid)
        flat = np.arange(h * w, dtype=np.int64).reshape(1, h, w)
        nxt = (flat + dnr * w + dnc).reshape(nb, h * w)
        steps = max(int(np.ceil(np.log2(max(h * w, 2)))) + 1, 1)
        for _ in range(steps):
            nxt = np.take_along_axis(nxt, nxt, axis=1)
        out = nxt.reshape(nb, h, w).astype(np.float64)
        out = np.where(valid, out, out_nodata)
        return out, dict(meta, nodata=out_nodata)

    return t


def flow_accum(out_nodata: float = -1.0):
    """D8 flow accumulation: for every cell, the number of cells whose
    steepest-descent path passes through it, the cell itself included
    (richdem's weight=1 convention; subtract 1 for ESRI's
    upstream-only count).  Flow edges come from the same ``_d8_best``
    scan as flow_dir/basins, so the three operators agree on every
    tie and nodata rule.

    The in-forest is resolved by vectorized Kahn peeling: cells with
    no remaining inflow push their (final) count into their receiver
    via ``np.add.at``; a receiver joins the frontier when its inflow
    degree hits zero.  Each cell is pushed exactly once, so total work
    is O(pixels) regardless of drainage-path length — no per-pixel
    Python, no O(longest path) full-plane sweeps.  Nodata cells emit
    ``out_nodata`` and never send or receive flow.  Applies per band."""

    def t(arr: np.ndarray, meta: dict):
        nod = meta["nodata"]
        z = arr.astype(np.float64, copy=False)
        nb, h, w = z.shape
        valid = np.ones(z.shape, dtype=bool) if nod is None else z != nod
        _, dnr, dnc = _d8_best(z, valid)
        flat = np.arange(h * w, dtype=np.int64)
        nxt = (flat.reshape(1, h, w) + dnr * w + dnc).reshape(nb, h * w)
        out = np.empty((nb, h * w))
        for b in range(nb):
            vb = valid[b].ravel()
            nx = nxt[b]
            move = vb & (nx != flat)
            acc = vb.astype(np.int64)
            indeg = np.bincount(nx[move], minlength=h * w)
            frontier = np.nonzero(move & (indeg == 0))[0]
            while frontier.size:
                recv = nx[frontier]
                np.add.at(acc, recv, acc[frontier])
                indeg -= np.bincount(recv, minlength=h * w)
                cand = np.unique(recv)
                frontier = cand[(indeg[cand] == 0) & move[cand]]
            out[b] = np.where(vb, acc, out_nodata)
        return out.reshape(nb, h, w), dict(meta, nodata=out_nodata)

    return t


def cost_distance(out_nodata: float = -1.0, max_rounds: int | None = None):
    """Accumulated-cost distance (GRASS ``r.cost`` / ArcGIS
    CostDistance): each valid cell's minimum total cost to reach a
    SOURCE cell, moving 8-connected with the standard step cost
    ``(cost_u + cost_v) / 2 * dist`` (dist = 1 orthogonal, sqrt(2)
    diagonal).  Sources are the band's minimum-valid-cost cells (the
    deterministic, engine-independent choice: "distance from the
    cheapest terrain"); their distance is 0.  Nodata cells are
    barriers (emit ``out_nodata``, never traversed).

    Resolved by synchronized Bellman-Ford rounds —

        d_{k+1}(v) = min(d_k(v), min_u d_k(u) + (c_u + c_v)/2 * dist)

    — each round eight shifted adds + mins, run to the exact fixpoint.
    Because every round applies the identical IEEE expression to the
    identical candidate set, the fixpoint is bit-reproducible in any
    engine that iterates the same recurrence (the driver's DuckDB twin
    replays it as a monotone recursive CTE).  Rounds needed = longest
    shortest-path hop count <= h*w; ``max_rounds`` caps it (None =
    exact fixpoint).  Applies per band; O(rounds * pixels) vectorized."""

    def t(arr: np.ndarray, meta: dict):
        nod = meta["nodata"]
        z = arr.astype(np.float64, copy=False)
        nb, h, w = z.shape
        valid = np.ones(z.shape, dtype=bool) if nod is None else z != nod

        def shifted(plane, dr, dc, fill):
            s = np.full(plane.shape, fill, dtype=plane.dtype)
            rs_dst = slice(max(-dr, 0), h - max(dr, 0))
            cs_dst = slice(max(-dc, 0), w - max(dc, 0))
            rs_src = slice(max(dr, 0), h - max(-dr, 0))
            cs_src = slice(max(dc, 0), w - max(-dc, 0))
            s[:, rs_dst, cs_dst] = plane[:, rs_src, cs_src]
            return s

        # sources: per-band minimum valid cost
        zmin = np.where(valid, z, np.inf).min(axis=(1, 2), keepdims=True)
        d = np.where(valid & (z == zmin), 0.0, np.inf)
        cap = max_rounds if max_rounds is not None else h * w + 1
        diag = math.sqrt(2.0)
        for _ in range(cap):
            nd = d
            for (dr, dc), _cd in _D8:
                du = shifted(d, dr, dc, np.inf)
                cu = shifted(z, dr, dc, 0.0)
                vu = shifted(valid, dr, dc, False)
                dist = diag if dr != 0 and dc != 0 else 1.0
                cand = du + (cu + z) / 2.0 * dist
                cand = np.where(vu & valid, cand, np.inf)
                nd = np.minimum(nd, cand)
            if np.array_equal(nd, d):
                break
            d = nd
        out = np.where(valid & np.isfinite(d), d, out_nodata)
        return out, dict(meta, nodata=out_nodata)

    return t


def stream_order(out_nodata: float = -1.0):
    """Strahler stream order over the D8 flow forest (the richdem /
    ArcGIS StreamOrder convention applied to every cell): cells with no
    inflow are order 1; a cell whose inflows' maximum order m is
    achieved by >= 2 inflows is m + 1, else m.  Flow edges come from
    the shared ``_d8_best`` scan, so orders agree with
    flow_dir/basins/flow_accum on every tie and nodata rule.

    Resolved by the same vectorized Kahn peel as :func:`flow_accum`,
    tracking per receiver the running inflow maximum and the count of
    inflows achieving it (reset when the maximum grows) — each cell is
    finalized and pushed exactly once, O(pixels) total work.  Nodata
    cells emit ``out_nodata``.  Applies per band."""

    def t(arr: np.ndarray, meta: dict):
        nod = meta["nodata"]
        z = arr.astype(np.float64, copy=False)
        nb, h, w = z.shape
        valid = np.ones(z.shape, dtype=bool) if nod is None else z != nod
        _, dnr, dnc = _d8_best(z, valid)
        flat = np.arange(h * w, dtype=np.int64)
        nxt = (flat.reshape(1, h, w) + dnr * w + dnc).reshape(nb, h * w)
        out = np.empty((nb, h * w))
        for b in range(nb):
            vb = valid[b].ravel()
            nx = nxt[b]
            move = vb & (nx != flat)
            indeg = np.bincount(nx[move], minlength=h * w)
            best1 = np.zeros(h * w, dtype=np.int64)
            cnt = np.zeros(h * w, dtype=np.int64)
            ordv = np.ones(h * w, dtype=np.int64)
            frontier = np.nonzero(move & (indeg == 0))[0]
            while frontier.size:
                o = np.where(
                    best1[frontier] == 0,
                    1,
                    best1[frontier] + (cnt[frontier] >= 2),
                )
                ordv[frontier] = o
                recv = nx[frontier]
                uniq = np.unique(recv)
                before = best1[uniq]
                np.maximum.at(best1, recv, o)
                grew = uniq[best1[uniq] > before]
                cnt[grew] = 0
                at_max = o == best1[recv]
                np.add.at(cnt, recv[at_max], 1)
                indeg -= np.bincount(recv, minlength=h * w)
                frontier = uniq[(indeg[uniq] == 0) & move[uniq]]
            # terminals (pits/flats) never enter the frontier: finalize
            pits = vb & ~move
            ordv = np.where(
                pits & (best1 > 0), best1 + (cnt >= 2), ordv
            )
            out[b] = np.where(vb, ordv, out_nodata)
        return out.reshape(nb, h, w), dict(meta, nodata=out_nodata)

    return t


def _box_sum(plane: np.ndarray, k: int) -> np.ndarray:
    """Separable k x k moving-window sum, window clipped at the edges.
    plane is (bands, h, w) float64; zeros stand in for excluded cells."""
    r = k // 2
    out = plane
    for axis in (1, 2):
        n = out.shape[axis]
        cs = np.cumsum(out, axis=axis)
        pad = [(0, 0)] * 3
        pad[axis] = (1, 0)
        cs = np.pad(cs, pad)  # prefix sums with a leading zero
        hi = np.minimum(np.arange(n) + r + 1, n)
        lo = np.maximum(np.arange(n) - r, 0)
        out = np.take(cs, hi, axis=axis) - np.take(cs, lo, axis=axis)
    return out


def _box_ext(plane: np.ndarray, k: int, neutral: float, op) -> np.ndarray:
    """Separable k x k moving min/max with edge clipping via neutral
    padding; O(k) elementwise passes per axis."""
    r = k // 2
    out = plane
    for axis in (1, 2):
        n = out.shape[axis]
        pad = [(0, 0)] * 3
        pad[axis] = (r, r)
        padded = np.pad(out, pad, constant_values=neutral)
        acc = None
        for d in range(k):
            sl = [slice(None)] * 3
            sl[axis] = slice(d, d + n)
            v = padded[tuple(sl)]
            acc = v if acc is None else op(acc, v)
        out = acc
    return out


def lbp(out_nodata: float = -1.0):
    """Local Binary Pattern texture codes (the classic 8-neighbor LBP
    image feature): for each valid center, bit k of the 0..255 code is
    set iff the k-th neighbor exists, is valid, and its value is >= the
    center value.  Bit order follows the engine-wide D8/ESRI scan
    (E=bit0, SE=1, S=2, SW=3, W=4, NW=5, N=6, NE=7 — a fixed
    permutation of the textbook clockwise-from-NW order).  Neighbors
    beyond the edge or nodata contribute 0; nodata centers emit
    ``out_nodata``.  Applies per band; pure shifted-plane compares,
    O(pixels)."""

    def t(arr: np.ndarray, meta: dict):
        nod = meta["nodata"]
        z = arr.astype(np.float64, copy=False)
        _, h, w = z.shape
        valid = np.ones(z.shape, dtype=bool) if nod is None else z != nod

        def shifted(plane, dr, dc, fill):
            s = np.full(plane.shape, fill, dtype=plane.dtype)
            rs_dst = slice(max(-dr, 0), h - max(dr, 0))
            cs_dst = slice(max(-dc, 0), w - max(dc, 0))
            rs_src = slice(max(dr, 0), h - max(-dr, 0))
            cs_src = slice(max(dc, 0), w - max(-dc, 0))
            s[:, rs_dst, cs_dst] = plane[:, rs_src, cs_src]
            return s

        code = np.zeros(z.shape)
        for k, ((dr, dc), _cd) in enumerate(_D8):
            zn = shifted(z, dr, dc, 0.0)
            vn = shifted(valid, dr, dc, False)
            code += float(1 << k) * (vn & (zn >= z))
        out = np.where(valid, code, out_nodata)
        return out, dict(meta, nodata=out_nodata)

    return t


def morphology(op: str, size: int = 3, out_nodata: float = -9999.0):
    """Grayscale morphology as focal min/max chains: ``erode`` (window
    min), ``dilate`` (window max), ``open`` (erode -> dilate), ``close``
    (dilate -> erode) — k x k square structuring element, window
    clipped at the edge, nodata excluded (the :func:`focal` contract;
    intermediate nodata propagates through the chain's meta).  Returns
    a LIST of TransformFns to splice into an ``apply_transforms``
    chain, so a two-step opening still runs in ONE Arrow stage."""
    seq = {
        "erode": ("min",),
        "dilate": ("max",),
        "open": ("min", "max"),
        "close": ("max", "min"),
    }.get(op)
    if seq is None:
        raise ValueError(f"unknown morphology op {op!r}")
    return [focal(s, size, out_nodata) for s in seq]


def focal(stat: str = "mean", size: int = 3, out_nodata: float = -9999.0):
    """k x k moving-window aggregate over VALID pixels, window clipped
    at the image edge (``r.neighbors``-style).  ``stat`` is one of
    sum / count / min / max / mean; windows with zero valid pixels emit
    ``out_nodata`` (count emits 0)."""
    if size < 1 or size % 2 == 0:
        raise ValueError("focal size must be a positive odd integer")
    if stat not in ("sum", "count", "min", "max", "mean"):
        raise ValueError(f"unknown focal stat {stat!r}")

    def t(arr: np.ndarray, meta: dict):
        nod = meta["nodata"]
        z = arr.astype(np.float64, copy=False)
        valid = np.ones(z.shape, dtype=bool) if nod is None else z != nod
        cnt = _box_sum(valid.astype(np.float64), size)
        if stat == "count":
            return cnt, dict(meta, nodata=out_nodata)
        if stat in ("sum", "mean"):
            s = _box_sum(np.where(valid, z, 0.0), size)
            vals = s if stat == "sum" else s / np.maximum(cnt, 1.0)
        elif stat == "min":
            vals = _box_ext(np.where(valid, z, np.inf), size, np.inf, np.minimum)
        else:
            vals = _box_ext(np.where(valid, z, -np.inf), size, -np.inf, np.maximum)
        out = np.where(cnt > 0.0, vals, out_nodata)
        return out, dict(meta, nodata=out_nodata)

    return t
