"""Sliding-window tiling — the engine's flatMap/explode.

Reproduces the reference's ``Image.get_tiles``/``get_subset`` semantics
(ukis_pysat/raster.py:485-519) exactly:

- offsets enumerate ``product(range(0, cols, width), range(0, rows,
  height))`` — **columns outer, rows inner**, so
  ``tile_id = col_idx * ceil(rows/height) + row_idx``;
- each window is ``(col_off-overlap, row_off-overlap, width+2*overlap,
  height+2*overlap)`` intersected with the full-array window, i.e.
  negative offsets clamp to 0 and edge windows shrink;
- bounds follow rasterio.windows.bounds (raster.py:515):
  ``left = c + col_off*a; top = f + row_off*e; right = left + tw*a;
  bottom = top + th*e`` for the GDAL affine (a,b,c,d,e,f).

Two physical strategies, chosen by what the query needs:

``tile_windows``   pure relational (sequence + posexplode + greatest/
                   least).  Window geometry only — **no pixel decode, no
                   Python** — whole-stage-codegen'd JVM expressions, and
                   the ``bytes`` column is never read (column pruning
                   reaches the parquet scan).  Use for counting, geometry,
                   and joining tiles spatially.

``tile_pixels``    Arrow-batched ``mapInPandas`` that decodes each image
                   once, slices every window from the in-memory array and
                   emits encoded tile payloads.  One decode per image per
                   stage (the reference instead re-materializes a GTiff
                   after every op, raster.py:189-213).

Golden invariants (reference tests/test_raster.py:362-375): a 679x764
image at (5,5,1) yields 20,808 windows; window 2578 = (79,649,7,7) with
bounds (11.903960582768779, 51.45624717410995, 11.904589403469808,
51.45687599481152).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from ukis_pysat_spark import codec

TILE_PIXELS_SCHEMA = (
    "image_id string, tile_id long, col_off int, row_off int, "
    "tw int, th int, left double, bottom double, right double, top double, "
    "px binary, caption string"
)


def _clip(off0: Column, full: Column, size: int, overlap: int) -> tuple[Column, Column]:
    """Intersection with the bounding window (raster.py:497-505)."""
    start = F.greatest(off0 - F.lit(overlap), F.lit(0))
    end = F.least(off0 - F.lit(overlap) + F.lit(size + 2 * overlap), full)
    return start, end - start


def tile_windows(
    images: DataFrame, width: int = 256, height: int = 256, overlap: int = 0
) -> DataFrame:
    """Relational tile-window enumeration (no pixel decode).

    Input needs columns (image_id, w, h, transform); output one row per
    window with deterministic tile_id matching the reference enumeration.
    """
    n_row_tiles = F.ceil(F.col("h") / F.lit(height)).cast("long")
    df = (
        images.select("image_id", "w", "h", "transform")
        .select(
            "image_id",
            "w",
            "h",
            "transform",
            n_row_tiles.alias("_nrt"),
            F.posexplode(F.sequence(F.lit(0), F.col("w") - 1, F.lit(width))).alias(
                "col_idx", "col_off0"
            ),
        )
        .select(
            "*",
            F.posexplode(F.sequence(F.lit(0), F.col("h") - 1, F.lit(height))).alias(
                "row_idx", "row_off0"
            ),
        )
    )
    col_off, tw = _clip(F.col("col_off0"), F.col("w"), width, overlap)
    row_off, th = _clip(F.col("row_off0"), F.col("h"), height, overlap)
    a = F.element_at("transform", 1)
    c = F.element_at("transform", 3)
    e = F.element_at("transform", 5)
    f = F.element_at("transform", 6)
    left = c + col_off.cast("double") * a
    top = f + row_off.cast("double") * e
    return df.select(
        "image_id",
        (F.col("col_idx").cast("long") * F.col("_nrt") + F.col("row_idx")).alias("tile_id"),
        col_off.cast("int").alias("col_off"),
        row_off.cast("int").alias("row_off"),
        tw.cast("int").alias("tw"),
        th.cast("int").alias("th"),
        left.alias("left"),
        (top + th.cast("double") * e).alias("bottom"),
        (left + tw.cast("double") * a).alias("right"),
        top.alias("top"),
    )


def enumerate_windows(w: int, h: int, width: int, height: int, overlap: int) -> np.ndarray:
    """numpy mirror of the window enumeration: rows of
    (tile_id, col_off, row_off, tw, th).  Used by the pixel path and by
    test oracles; must stay in lockstep with tile_windows()."""
    col_offs = np.arange(0, w, width, dtype=np.int64)
    row_offs = np.arange(0, h, height, dtype=np.int64)
    gx, gy = np.meshgrid(col_offs, row_offs, indexing="ij")  # cols outer
    co = gx.ravel()
    ro = gy.ravel()
    tile_id = np.arange(co.size, dtype=np.int64)
    c0 = np.maximum(co - overlap, 0)
    r0 = np.maximum(ro - overlap, 0)
    c1 = np.minimum(co - overlap + width + 2 * overlap, w)
    r1 = np.minimum(ro - overlap + height + 2 * overlap, h)
    return np.column_stack([tile_id, c0, r0, c1 - c0, r1 - r0])


def tile_pixels(
    images: DataFrame,
    width: int = 256,
    height: int = 256,
    overlap: int = 0,
    band: int | None = None,
    out_fmt: str = "raw",
) -> DataFrame:
    """Pixel-emitting tiling: decode once per image, slice every window,
    emit encoded tile payloads (Arrow-batched mapInPandas).

    band=None keeps all bands; band=k extracts a single band like the
    reference's get_subset(tile, band) (raster.py:507-519).
    """

    # memory bound: yield accumulated tile rows once they exceed this
    # many payload bytes, independent of the Arrow input batch size
    FLUSH_BYTES = 32 << 20

    def bulk_encode(arr: np.ndarray, wins: np.ndarray) -> list[bytes]:
        """Encode every window of one image with ONE strided gather +
        ONE contiguous copy per distinct window shape (edge windows
        shrink, so tiles group into at most 4 shapes).  ~10-20x less
        per-tile Python overhead than slice-and-encode per window."""
        px: list[bytes | None] = [None] * wins.shape[0]
        bands = arr.shape[0]
        dt = arr.dtype.newbyteorder("<")
        shapes: dict[tuple[int, int], list[int]] = {}
        for i, (_, c0, r0, tw, th) in enumerate(wins):
            shapes.setdefault((int(th), int(tw)), []).append(i)
        for (th, tw), idxs in shapes.items():
            sub = wins[idxs]
            view = np.lib.stride_tricks.sliding_window_view(arr, (th, tw), axis=(1, 2))
            block = view[:, sub[:, 2], sub[:, 1]]  # (bands, n, th, tw)
            block = np.ascontiguousarray(block.transpose(1, 0, 2, 3)).astype(dt, copy=False)
            header = codec.make_header(out_fmt, str(arr.dtype.name), bands, th, tw)
            buf = block.tobytes()
            sz = bands * th * tw * arr.dtype.itemsize
            if out_fmt == "raw":
                for j, i in enumerate(idxs):
                    px[i] = header + buf[j * sz : (j + 1) * sz]
            else:
                for j, i in enumerate(idxs):
                    px[i] = codec.encode(block[j], out_fmt)
        return px  # type: ignore[return-value]

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[pd.DataFrame] = []
            out_bytes = 0
            for row in pdf.itertuples(index=False):
                arr = codec.decode(row.bytes)
                t = list(row.transform)
                a, _, c, _, e, f = t[0], t[1], t[2], t[3], t[4], t[5]
                wins = enumerate_windows(row.w, row.h, width, height, overlap)
                n = wins.shape[0]
                src = arr if band is None else arr[band : band + 1]
                px = bulk_encode(src, wins)
                left = c + wins[:, 1] * a
                top = f + wins[:, 2] * e
                out.append(
                    pd.DataFrame(
                        {
                            "image_id": np.repeat(row.image_id, n),
                            "tile_id": wins[:, 0],
                            "col_off": wins[:, 1].astype(np.int32),
                            "row_off": wins[:, 2].astype(np.int32),
                            "tw": wins[:, 3].astype(np.int32),
                            "th": wins[:, 4].astype(np.int32),
                            "left": left,
                            "bottom": top + wins[:, 4] * e,
                            "right": left + wins[:, 3] * a,
                            "top": top,
                            "px": px,
                            "caption": np.repeat(row.caption, n),
                        }
                    )
                )
                out_bytes += sum(len(p) for p in px)
                if out_bytes >= FLUSH_BYTES:
                    yield pd.concat(out, ignore_index=True)
                    out, out_bytes = [], 0
            if out:
                yield pd.concat(out, ignore_index=True)

    cols = ["image_id", "bytes", "w", "h", "transform", "caption"]
    return images.select(*cols).mapInPandas(emit, schema=TILE_PIXELS_SCHEMA)
