"""Raster write sinks (reference S4, write_to_file, raster.py:535-580).

The reference casts the in-memory array (including the ``'min'``
minimal-dtype choice, raster.py:555-556) and writes one GTiff with a
driver/compression profile.  The engine's sink is a table write: the
payload is cast + re-encoded per row in one Arrow stage, then the rows
land in Parquet (zstd) — or any table format the caller points at.
Payload-level compression maps to the codec's ``rawz`` format; columnar
compression is the Parquet codec.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from ukis_pysat_spark import codec
from ukis_pysat_spark.operators import arrowio
from ukis_pysat_spark.operators.arrowio import META_COLS as _META_COLS


def cast_images(images: DataFrame, dtype: str = "min", out_fmt: str | None = None) -> DataFrame:
    """Cast every payload to `dtype` ('min' = smallest dtype representing
    the values, per image — reference raster.py:555-556) and re-encode,
    updating the dtype/fmt metadata columns.  One decode+encode per row,
    emitted through the Arrow-native buffer (operators/arrowio.py).
    """

    def row_fn(row: dict) -> tuple[dict, np.ndarray, str]:
        arr = codec.decode(row["bytes"])
        dt = codec.minimum_dtype(arr) if dtype == "min" else dtype
        out = arr.astype(np.dtype(dt), copy=False)
        fmt = out_fmt or row["fmt"]
        d = {k: row[k] for k in _META_COLS if k != "bytes"}
        d["dtype"] = str(out.dtype)
        d["fmt"] = fmt
        return d, out, fmt

    return arrowio.map_image_rows(images, _META_COLS, row_fn)


def write_images(
    images: DataFrame,
    path: str,
    dtype: str = "min",
    out_fmt: str | None = None,
    mode: str = "overwrite",
    compression: str = "zstd",
    partition_by: list[str] | None = None,
) -> None:
    """Sink: cast (incl. 'min') + encode + Parquet write.

    On a catalog-backed cluster swap the final write for
    ``df.writeTo(table).append()`` — everything upstream is unchanged.
    """
    out = cast_images(images, dtype=dtype, out_fmt=out_fmt)
    writer = out.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
