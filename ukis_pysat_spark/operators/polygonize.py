"""Polygonize: raster -> vector region extraction (GDAL polygonize
semantics: 4-connected components of equal pixel value).

The reference's raster->vector direction is limited to whole-image
footprints (ukis_pysat/raster.py:104-111 get_valid_data_bbox); GDAL
users reach for gdal.Polygonize for per-value regions.  Here it is a
single distributed Arrow stage: each image's selected band is labeled
with a pure-numpy connected-component pass (no scipy in the
environment) and one row per region leaves the stage — the payload
never crosses a shuffle.

Labeling algorithm: labels start as the flat pixel index; alternating
row-wise and column-wise SEGMENTED RUN MINIMA (np.minimum.reduceat
over same-value runs) propagate the minimum label across each run in
one vectorized step, iterated to fixpoint.  Convergence takes one
pass per "bend" of the most serpentine region (a handful for real
rasters), each pass O(h*w); the final label of every region is
provably the region's minimum flat pixel index — a canonical,
partitioning-independent region id that an independent oracle can
recompute.

Scale: rows out are O(regions), not O(pixels); the stage is
embarrassingly parallel over images.  nodata pixels produce no
region.  For tiled planet-scale grids (mosaic output), label each
tile here and stitch cross-tile runs with
operators/graph.connected_components on the tile-boundary adjacency
pairs — the per-tile labels are already canonical within the tile.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from ukis_pysat_spark import codec

POLYGONIZE_SCHEMA = (
    "image_id string, region_id long, value double, n_pixels long, "
    "r0 int, c0 int, r1 int, c1 int, "
    "left double, top double, right double, bottom double"
)

_PA_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("region_id", pa.int64()),
        ("value", pa.float64()),
        ("n_pixels", pa.int64()),
        ("r0", pa.int32()),
        ("c0", pa.int32()),
        ("r1", pa.int32()),
        ("c1", pa.int32()),
        ("left", pa.float64()),
        ("top", pa.float64()),
        ("right", pa.float64()),
        ("bottom", pa.float64()),
    ]
)


def _run_min(vals: np.ndarray, labels: np.ndarray, w: int) -> np.ndarray:
    """Flat row-major segmented min: every same-value run (runs never
    cross row boundaries) is replaced by its minimum label."""
    start = np.empty(vals.size, dtype=bool)
    start[0] = True
    np.not_equal(vals[1:], vals[:-1], out=start[1:])
    start[::w] = True  # runs reset at row starts
    starts_idx = np.flatnonzero(start)
    run_min = np.minimum.reduceat(labels, starts_idx)
    seg = np.cumsum(start) - 1
    return run_min[seg]


def label_regions(plane: np.ndarray) -> np.ndarray:
    """4-connected equal-value component labels; the label of each
    region is its minimum flat (row-major) pixel index."""
    h, w = plane.shape
    labels = np.arange(h * w, dtype=np.int64)
    flat_r = plane.ravel()
    # column-pass views: Fortran ravel = transposed row-major
    flat_c_v = np.ascontiguousarray(plane.T).ravel()
    while True:
        prev = labels
        labels = _run_min(flat_r, labels, w)
        lt = np.ascontiguousarray(labels.reshape(h, w).T).ravel()
        lt = _run_min(flat_c_v, lt, h)
        labels = np.ascontiguousarray(lt.reshape(w, h).T).ravel()
        if np.array_equal(labels, prev):
            return labels.reshape(h, w)


def _quantized(plane: np.ndarray, nod, quantize):
    """In-stage value binning; nodata bins with the same rule."""
    if quantize is not None:
        plane = np.floor(plane / quantize)
        nod = None if nod is None else float(np.floor(nod / quantize))
    return plane, nod


def _region_table(plane: np.ndarray, nod):
    """Label + per-region stats: (region_ids, vals, counts, r0, c0,
    r1, c1, keep-mask) with region_id = min flat row-major index."""
    h, w = plane.shape
    labels = label_regions(plane).ravel()
    flat_v = plane.ravel()
    order = np.argsort(labels, kind="stable")
    sl = labels[order]
    starts = np.flatnonzero(np.concatenate(([True], sl[1:] != sl[:-1])))
    region_ids = sl[starts]
    counts = np.diff(np.concatenate((starts, [sl.size])))
    rr = (order // w).astype(np.int64)
    cc = (order % w).astype(np.int64)
    r0 = np.minimum.reduceat(rr, starts)
    r1 = np.maximum.reduceat(rr, starts)
    c0 = np.minimum.reduceat(cc, starts)
    c1 = np.maximum.reduceat(cc, starts)
    vals = flat_v[region_ids]
    keep = np.ones(region_ids.size, dtype=bool)
    if nod is not None:
        keep = vals != nod
    return labels, region_ids, vals, counts, r0, c0, r1, c1, keep


def _region_batches(band: int, quantize: float | None):
    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        num_names = [n for n in _PA_SCHEMA.names if n != "image_id"]
        for batch in batches:
            ids = batch.column("image_id").to_pylist()
            payload = batch.column("bytes")
            transforms_col = batch.column("transform").to_pylist()
            nodatas = batch.column("nodata").to_pylist()
            # numpy chunk accumulation (regions-out is tens of millions
            # of rows at scale: per-element list extends were ~half the
            # stage); one concatenate per column per batch
            sid: list = []
            chunks: dict[str, list] = {n: [] for n in num_names}
            for ri in range(batch.num_rows):
                arr = codec.decode(payload[ri].as_buffer()).astype(np.float64)
                nb, h, w = arr.shape
                plane = arr[min(band, nb - 1)]
                a, _b, c, _d, e, f_ = transforms_col[ri]
                plane, nod = _quantized(plane, nodatas[ri], quantize)
                (_labels, region_ids, vals, counts,
                 r0, c0, r1, c1, keep) = _region_table(plane, nod)
                nk = int(keep.sum())
                if nk == 0:
                    continue
                sid.append([ids[ri]] * nk)
                kr0, kc0, kr1, kc1 = r0[keep], c0[keep], r1[keep], c1[keep]
                chunks["region_id"].append(region_ids[keep])
                chunks["value"].append(vals[keep])
                chunks["n_pixels"].append(counts[keep])
                chunks["r0"].append(kr0.astype(np.int32))
                chunks["c0"].append(kc0.astype(np.int32))
                chunks["r1"].append(kr1.astype(np.int32))
                chunks["c1"].append(kc1.astype(np.int32))
                chunks["left"].append(c + kc0 * a)
                chunks["top"].append(f_ + kr0 * e)
                chunks["right"].append(c + (kc1 + 1) * a)
                chunks["bottom"].append(f_ + (kr1 + 1) * e)
            if sid:
                arrays = [pa.array([v for ch in sid for v in ch], type=pa.string())]
                for n in num_names:
                    f = _PA_SCHEMA.field(n)
                    arrays.append(
                        pa.array(np.concatenate(chunks[n]), type=f.type)
                    )
                yield pa.RecordBatch.from_arrays(arrays, schema=_PA_SCHEMA)

    return run


def polygonize(
    images: DataFrame, band: int = 0, quantize: float | None = None
) -> DataFrame:
    """One row per 4-connected region of equal value in `band`:
    (image_id, region_id, value, n_pixels, pixel bbox r0/c0/r1/c1,
    geo bbox left/top/right/bottom).  region_id is the region's
    minimum flat pixel index (row-major) — canonical and
    partitioning-independent.  Regions of the image's nodata value
    are dropped.  `quantize` bins values to floor(v / quantize)
    INSIDE the stage — equivalent to a pixel_math hop before
    polygonize, minus the extra decode/encode payload crossing."""
    return images.select(
        "image_id", "bytes", "transform", "nodata"
    ).mapInArrow(_region_batches(band, quantize), schema=POLYGONIZE_SCHEMA)


def _sieve_plane(plane: np.ndarray, nod, threshold: int) -> np.ndarray:
    """Round-based sieve on one plane: each round, every valid region
    smaller than `threshold` merges into its largest current neighbor
    (ties: smaller root id absorbs into larger (size, id) — the merge
    graph is acyclic because (size, id) strictly increases along every
    edge).  Sizes, values, and adjacency are maintained through a
    union-find across rounds; regions with no valid neighbor are left
    alone.  Returns the plane with merged pixels rewritten to their
    absorbing region's value."""
    h, w = plane.shape
    labels = label_regions(plane)
    flat = labels.ravel()
    uniq, inv = np.unique(flat, return_inverse=True)
    sizes = np.bincount(inv).astype(np.int64)
    values = plane.ravel()[uniq]
    valid = np.ones(uniq.size, bool) if nod is None else values != nod

    inv2 = inv.reshape(h, w)
    eh = np.stack([inv2[:, :-1].ravel(), inv2[:, 1:].ravel()])
    ev = np.stack([inv2[:-1, :].ravel(), inv2[1:, :].ravel()])
    edges = np.concatenate([eh, ev], axis=1)
    edges = edges[:, edges[0] != edges[1]]
    # both directions, valid endpoints only (nodata never participates)
    edges = np.concatenate([edges, edges[::-1]], axis=1)
    edges = edges[:, valid[edges[0]] & valid[edges[1]]]
    edges = np.unique(edges.T, axis=0).T if edges.size else edges

    parent = np.arange(uniq.size, dtype=np.int64)

    def roots(x):
        while True:
            p2 = parent[parent[x]]
            if np.array_equal(p2, parent[x]):
                return p2
            parent[x] = p2

    changed = True
    while changed and edges.size:
        changed = False
        src = roots(edges[0])
        dst = roots(edges[1])
        keep = src != dst
        src, dst = src[keep], dst[keep]
        edges = edges[:, keep]
        small = valid & (sizes < threshold) & (parent == np.arange(uniq.size))
        cand = small[src]
        if cand.any():
            s, d = src[cand], dst[cand]
            # best neighbor per small src: max (size, id) — lexsort
            # ascending, last occurrence per src wins
            order = np.lexsort((d, sizes[d], s))
            s, d = s[order], d[order]
            last = np.concatenate([s[1:] != s[:-1], [True]])
            s, d = s[last], d[last]
            # orient strictly uphill in (size, id) so simultaneous
            # merges cannot form cycles
            up = (sizes[d] > sizes[s]) | ((sizes[d] == sizes[s]) & (d > s))
            s, d = s[up], d[up]
            if s.size:
                parent[s] = d
                changed = True
        if changed:
            # sizes live on roots: re-aggregate pixel counts by root
            final = roots(np.arange(uniq.size, dtype=np.int64))
            cnt = np.bincount(inv, minlength=uniq.size)
            sizes = np.bincount(final, weights=cnt, minlength=uniq.size).astype(np.int64)
    final = roots(np.arange(uniq.size, dtype=np.int64))
    return values[final][inv].reshape(h, w)


def sieve(threshold: int, band: int | None = None):
    """``gdal_sieve`` analog as a TransformFn for
    :func:`transforms.apply_transforms`: 4-connected regions smaller
    than `threshold` pixels are merged into their largest neighbor
    (see :func:`_sieve_plane` for the exact round/tie spec), per band
    (``band=k`` restricts to one band, leaving others untouched).
    nodata pixels are never merged into or out of.  Chains compose:
    two small neighbors can union above the threshold and survive."""
    if threshold < 1:
        raise ValueError("threshold must be >= 1")

    def t(arr: np.ndarray, meta: dict):
        out = arr.astype(np.float64, copy=True)
        nod = meta["nodata"]
        bs = range(arr.shape[0]) if band is None else [band]
        for b in bs:
            out[b] = _sieve_plane(out[b], nod, threshold)
        return out, meta

    return t


GRID_STAGE_SCHEMA = (
    "kind int, gid long, value double, n_pixels long, "
    "g_r0 long, g_c0 long, g_r1 long, g_c1 long, ekey long, pos long"
)

GRID_REGIONS_SCHEMA = (
    "region_id long, value double, n_pixels long, "
    "r0 long, c0 long, r1 long, c1 long, "
    "left double, top double, right double, bottom double"
)


def _grid_stage(grid_transform, grid_w, tile, band, quantize):
    """Per-tile labeling for polygonize_grid: emits region rows
    (kind=0, GLOBAL pixel coords, gid = min global flat index) and
    boundary-strip rows (kind=1) that pair same-value pixels across
    tile edges.  ekey identifies one shared boundary: the right edge
    of (tx, ty) and the left edge of (tx+1, ty) hash to the same key
    (likewise bottom/top), so a plain equi-join on (ekey, pos, value)
    yields exactly the cross-tile merge edges."""
    ga, gc0, ge, gf0 = grid_transform[0], grid_transform[2], grid_transform[4], grid_transform[5]

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        schema = pa.schema(
            [
                ("kind", pa.int32()),
                ("gid", pa.int64()),
                ("value", pa.float64()),
                ("n_pixels", pa.int64()),
                ("g_r0", pa.int64()),
                ("g_c0", pa.int64()),
                ("g_r1", pa.int64()),
                ("g_c1", pa.int64()),
                ("ekey", pa.int64()),
                ("pos", pa.int64()),
            ]
        )
        for batch in batches:
            payload = batch.column("bytes")
            transforms_col = batch.column("transform").to_pylist()
            nodatas = batch.column("nodata").to_pylist()
            cols: dict[str, list] = {n: [] for n in schema.names}

            def emit(kind, gid, value, n_pixels=0, g_r0=0, g_c0=0,
                     g_r1=0, g_c1=0, ekey=0, pos=0):
                cols["kind"].append(kind)
                cols["gid"].append(int(gid))
                cols["value"].append(float(value))
                cols["n_pixels"].append(int(n_pixels))
                cols["g_r0"].append(int(g_r0))
                cols["g_c0"].append(int(g_c0))
                cols["g_r1"].append(int(g_r1))
                cols["g_c1"].append(int(g_c1))
                cols["ekey"].append(int(ekey))
                cols["pos"].append(int(pos))

            for ri in range(batch.num_rows):
                arr = codec.decode(payload[ri].as_buffer()).astype(np.float64)
                nb, th, tw = arr.shape
                plane = arr[min(band, nb - 1)]
                a, _b, c, _d, e, f_ = transforms_col[ri]
                # tile indices from the tile's own affine vs the grid's
                tx = int(round((c - gc0) / (ga * tile)))
                ty = int(round((f_ - gf0) / (ge * tile)))
                gr0, gc_0 = ty * tile, tx * tile
                plane, nod = _quantized(plane, nodatas[ri], quantize)
                (labels, region_ids, vals, counts,
                 r0, c0, r1, c1, keep) = _region_table(plane, nod)
                # local min flat index -> global flat index (the local
                # row-major order agrees with the global one inside a
                # tile, so the min converts directly)
                def to_gid(lab):
                    return (gr0 + lab // tw) * grid_w + (gc_0 + lab % tw)
                for i in np.flatnonzero(keep):
                    emit(
                        0, to_gid(int(region_ids[i])), vals[i], counts[i],
                        gr0 + r0[i], gc_0 + c0[i], gr0 + r1[i], gc_0 + c1[i],
                    )
                lab2 = labels.reshape(th, tw)
                valid = (
                    np.ones_like(plane, dtype=bool)
                    if nod is None else plane != nod
                )
                # boundary strips: ekey packs (orientation, boundary x, y)
                def strip(lab_line, val_line, ok, ekey, gpos0):
                    for off in np.flatnonzero(ok):
                        emit(1, to_gid(int(lab_line[off])), val_line[off],
                             ekey=ekey, pos=gpos0 + off)
                vkey = lambda bx, by: ((by * (1 << 24) + bx) << 1)
                hkey = lambda bx, by: ((by * (1 << 24) + bx) << 1) | 1
                # right edge -> boundary v(tx, ty); left -> v(tx-1, ty)
                strip(lab2[:, -1], plane[:, -1], valid[:, -1], vkey(tx, ty), gr0)
                if tx > 0:
                    strip(lab2[:, 0], plane[:, 0], valid[:, 0], vkey(tx - 1, ty), gr0)
                # bottom edge -> boundary h(tx, ty); top -> h(tx, ty-1)
                strip(lab2[-1, :], plane[-1, :], valid[-1, :], hkey(tx, ty), gc_0)
                if ty > 0:
                    strip(lab2[0, :], plane[0, :], valid[0, :], hkey(tx, ty - 1), gc_0)
            if cols["kind"]:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(cols[n], type=schema.field(n).type) for n in schema.names],
                    schema=schema,
                )

    return run


def polygonize_grid(
    tiles: DataFrame,
    grid_transform: list[float],
    grid_w: int,
    tile: int = 256,
    band: int = 0,
    quantize: float | None = None,
) -> DataFrame:
    """Distributed polygonize over a TILED raster grid (mosaic /
    rasterize output): per-tile 4-connected labeling, then cross-tile
    stitching of same-value boundary runs through
    graph.connected_components on the (tiny, ids-only) merge-edge
    list.  Output is row-identical to ``polygonize`` over the
    assembled grid: region_id is the region's minimum global flat
    pixel index (row * grid_w + col — numerically identical to
    ``polygonize`` ids on the same grid), n_pixels and bboxes are
    merged across tiles.

    tiles: rows with bytes (1-band tile payload), transform (the
    tile's affine, aligned to `grid_transform`), nodata.  Pixels at
    the grid's nodata value produce no region.

    Scale: the labeling stage never shuffles payloads; only O(regions)
    stats rows and O(boundary pixels) strip rows leave it, and the CC
    iterations run on the merge edges alone."""
    from ukis_pysat_spark.operators import graph

    staged = tiles.select("bytes", "transform", "nodata").mapInArrow(
        _grid_stage(grid_transform, grid_w, tile, band, quantize),
        schema=GRID_STAGE_SCHEMA,
    ).localCheckpoint()  # one decode+label pass feeds both consumers
    regions = staged.where(F.col("kind") == 0)
    strips = staged.where(F.col("kind") == 1).select("ekey", "pos", "value", "gid")
    pairs = (
        strips.alias("a")
        .join(strips.alias("b"), ["ekey", "pos", "value"])
        .where(F.col("a.gid") < F.col("b.gid"))
        .select(F.col("a.gid").alias("id_a"), F.col("b.gid").alias("id_b"))
        .distinct()
    )
    comp = graph.connected_components(pairs)
    merged = (
        regions.join(comp, regions.gid == comp.node, "left")
        .withColumn("root", F.coalesce("comp", "gid"))
        .groupBy("root", "value")
        .agg(
            F.sum("n_pixels").alias("n_pixels"),
            F.min("g_r0").alias("r0"),
            F.min("g_c0").alias("c0"),
            F.max("g_r1").alias("r1"),
            F.max("g_c1").alias("c1"),
        )
    )
    ga, gc0, ge, gf0 = grid_transform[0], grid_transform[2], grid_transform[4], grid_transform[5]
    return merged.select(
        F.col("root").alias("region_id"),
        "value",
        "n_pixels",
        "r0", "c0", "r1", "c1",
        (F.lit(gc0) + F.col("c0") * ga).alias("left"),
        (F.lit(gf0) + F.col("r0") * ge).alias("top"),
        (F.lit(gc0) + (F.col("c1") + 1) * ga).alias("right"),
        (F.lit(gf0) + (F.col("r1") + 1) * ge).alias("bottom"),
    )
