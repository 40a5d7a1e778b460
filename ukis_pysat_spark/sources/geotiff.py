"""Minimal pure-numpy GeoTIFF reader (engine-side S1 ingest).

The reference opens rasters through rasterio/GDAL (ukis_pysat/
raster.py:33-53); neither ships in this environment, so the engine
carries a small baseline-TIFF decoder good for the classic GeoTIFF
profile the reference's fixtures (and most L1 scene quicklooks) use:

- little/big endian classic TIFF (magic 42; BigTIFF not supported);
- strip- AND tile-organized data;
- compression: none (1), zlib/deflate (8 and legacy 32946);
- PlanarConfiguration chunky (1) and separate (2);
- integer/float SampleFormat with 8/16/32/64 bits per sample;
- geo tags: ModelPixelScale + ModelTiepoint -> GDAL-style affine,
  GeoKeyDirectory -> EPSG code, GDAL_NODATA -> nodata.

The decoder is called per row inside Arrow-batched UDFs — a binaryFile
scan of scene files becomes an `images` table (ingest_geotiffs), each
payload re-encoded with the engine codec.  This is a data-format
reader, written from the public TIFF 6.0 / GeoTIFF specs — not a port
of any GDAL code.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ukis_pysat_spark import codec

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d"}


def _read_tag_values(data: bytes, bo: str, typ: int, cnt: int, raw: bytes):
    size = _TYPE_SIZES[typ] * cnt
    if size <= 4:
        buf = raw[:size]
    else:
        (off,) = struct.unpack(bo + "I", raw)
        buf = data[off : off + size]
    if typ == 2:  # ascii
        return buf.split(b"\x00")[0].decode("ascii", "replace")
    if typ in (5, 10):  # rational
        ints = struct.unpack(bo + ("I" if typ == 5 else "i") * 2 * cnt, buf)
        return [ints[2 * i] / (ints[2 * i + 1] or 1) for i in range(cnt)]
    vals = struct.unpack(bo + _TYPE_FMT[typ] * cnt, buf)
    return list(vals)


def parse_ifd(data: bytes) -> dict[int, list]:
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF")
    (magic,) = struct.unpack(bo + "H", data[2:4])
    if magic == 43:
        raise NotImplementedError("BigTIFF not supported")
    if magic != 42:
        raise ValueError("bad TIFF magic")
    (off,) = struct.unpack(bo + "I", data[4:8])
    (n,) = struct.unpack(bo + "H", data[off : off + 2])
    tags: dict[int, list] = {}
    for i in range(n):
        base = off + 2 + i * 12
        tag, typ, cnt = struct.unpack(bo + "HHI", data[base : base + 8])
        if typ not in _TYPE_SIZES:
            continue
        tags[tag] = _read_tag_values(data, bo, typ, cnt, data[base + 8 : base + 12])
    tags[-1] = [bo]  # stash byte order
    return tags


def _dtype_for(bits: int, sfmt: int, bo: str) -> np.dtype:
    kind = {1: "u", 2: "i", 3: "f"}.get(sfmt)
    if kind is None:
        raise ValueError(f"unsupported SampleFormat {sfmt}")
    return np.dtype(f"{bo}{kind}{bits // 8}")


def read_geotiff(data: bytes) -> tuple[np.ndarray, dict]:
    """bytes -> ((bands, rows, cols) array, meta dict).

    meta keys: transform (GDAL 6-affine), crs ('EPSG:xxxx' or None),
    nodata (float or None).
    """
    tags = parse_ifd(bytes(data))
    bo = tags[-1][0]
    w = int(tags[256][0])
    h = int(tags[257][0])
    spp = int(tags.get(277, [1])[0])
    comp = int(tags.get(259, [1])[0])
    planar = int(tags.get(284, [1])[0])
    bits = int(tags[258][0])
    sfmt = int(tags.get(339, [1])[0])
    dt = _dtype_for(bits, sfmt, bo)

    def decomp(o: int, c: int) -> bytes:
        raw = bytes(data[o : o + c])
        if comp == 1:
            return raw
        if comp in (8, 32946):
            return zlib.decompress(raw)
        raise NotImplementedError(f"TIFF compression {comp} not supported")

    if 324 in tags:  # tile-organized
        tw = int(tags[322][0])
        th = int(tags[323][0])
        tiles_across = -(-w // tw)
        tiles_down = -(-h // th)
        n_planes = spp if planar == 2 else 1
        plane_spp = 1 if planar == 2 else spp
        out = np.empty((h, w, spp), dtype=dt)
        idx = 0
        for plane in range(n_planes):
            for ty in range(tiles_down):
                for tx in range(tiles_across):
                    body = decomp(int(tags[324][idx]), int(tags[325][idx]))
                    tile = np.frombuffer(body, dtype=dt, count=tw * th * plane_spp)
                    tile = tile.reshape(th, tw, plane_spp)
                    y0, x0 = ty * th, tx * tw
                    ys, xs = min(th, h - y0), min(tw, w - x0)
                    if planar == 2:
                        out[y0 : y0 + ys, x0 : x0 + xs, plane] = tile[:ys, :xs, 0]
                    else:
                        out[y0 : y0 + ys, x0 : x0 + xs, :] = tile[:ys, :xs, :]
                    idx += 1
        arr = out.transpose(2, 0, 1)
    else:  # strip-organized
        body = b"".join(
            decomp(int(o), int(c)) for o, c in zip(tags[273], tags[279])
        )
        arr = np.frombuffer(body, dtype=dt, count=w * h * spp)
        if planar == 2:
            arr = arr.reshape(spp, h, w)
        else:
            arr = arr.reshape(h, w, spp).transpose(2, 0, 1)
    arr = np.ascontiguousarray(arr).astype(dt.newbyteorder("="), copy=False)

    meta: dict = {"transform": None, "crs": None, "nodata": None}
    if 33550 in tags and 33922 in tags:
        sx, sy = float(tags[33550][0]), float(tags[33550][1])
        tp = tags[33922]
        i, j, x, y = float(tp[0]), float(tp[1]), float(tp[3]), float(tp[4])
        meta["transform"] = [sx, 0.0, x - i * sx, 0.0, -sy, y + j * sy]
    if 34735 in tags:
        keys = tags[34735]
        # GeoKeyDirectory: header of 4 shorts then (key, loc, cnt, value)
        for k in range(4, len(keys) - 3, 4):
            key_id, loc, _cnt, val = keys[k : k + 4]
            if key_id in (3072, 2048) and loc == 0 and 0 < val < 65535:
                meta["crs"] = f"EPSG:{int(val)}"
                if key_id == 3072:
                    break
    if 42113 in tags:
        try:
            meta["nodata"] = float(str(tags[42113]).strip())
        except ValueError:
            pass
    return arr, meta


def ingest_geotiffs(files: DataFrame, fmt: str = "raw") -> DataFrame:
    """binaryFile scan rows -> engine `images` table rows.

    Payloads are decoded once and re-encoded with the engine codec;
    geo metadata land in plain columns (IMAGES_SCHEMA minus caption
    semantics: caption <- file name, platform <- name prefix)."""
    from ukis_pysat_spark.datagen import IMAGES_SCHEMA, phash64

    prefix_platform = {"LC08": "Landsat8", "LE07": "Landsat7", "LT05": "Landsat5"}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                name = r.path.rsplit("/", 1)[-1]
                try:
                    arr, meta = read_geotiff(r.content)
                except (ValueError, NotImplementedError, struct.error):
                    continue
                ident = name.rsplit(".", 1)[0]
                platform = prefix_platform.get(name[:4])
                if platform is None and name.startswith("S2"):
                    platform = "Sentinel2"
                t = meta["transform"] or [1.0, 0.0, 0.0, 0.0, -1.0, 0.0]
                lon0, lat0 = t[2], t[5]
                lon1 = lon0 + arr.shape[2] * t[0]
                lat1 = lat0 + arr.shape[1] * t[4]
                rows.append(
                    {
                        "image_id": ident,
                        "bytes": codec.encode(arr, fmt),
                        "w": int(arr.shape[2]),
                        "h": int(arr.shape[1]),
                        "fmt": fmt,
                        "caption": name,
                        "phash": phash64(arr),
                        "bands": int(arr.shape[0]),
                        "dtype": str(arr.dtype),
                        "crs": meta["crs"] or "EPSG:4326",
                        "transform": [float(v) for v in t],
                        "nodata": meta["nodata"] if meta["nodata"] is not None else 0.0,
                        "footprint_lon": [lon0, lon1, lon1, lon0, lon0],
                        "footprint_lat": [lat0, lat0, lat1, lat1, lat0],
                        "platform": platform or "",
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return files.select("path", "content").mapInPandas(run, schema=IMAGES_SCHEMA)
