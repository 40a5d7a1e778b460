"""PNG reader/writer on stdlib zlib — no external codec.

The reference opens "any GDAL format" through rasterio (raster.py:49);
the engine's second raster format after GeoTIFF is PNG, the common
interchange format for the image+caption corpus shape fixed by
BASELINE.json's input_hint (``fmt`` column).  Coverage:

- reader: bit depths 1/2/4/8/16; color types gray(0), RGB(2),
  palette(3, expanded to RGB/RGBA via PLTE/tRNS), gray+alpha(4),
  RGBA(6); all five row filters; interlace 0 AND Adam7(1); CRC
  verified per chunk (corrupt streams fail loudly, same policy as the
  LZW decoder, geotiff.py).
- writer: 8/16-bit gray/GA/RGB/RGBA, per-row filter choice in
  {none, sub, up} (whole-image setting), zlib level configurable.

Decode returns the engine's band-first (bands, rows, cols) array —
raw sample values, never rescaled (presentation scaling for sub-byte
depths is the caller's choice, like rasterio).  Filters none/up/sub
unfilter fully vectorized (sub via per-lane cumsum); average/paeth
fall back to a bytearray scalar loop, the measured faster choice for
serial recurrences (same finding as the LZW noisy path).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass layout: (x_start, y_start, x_step, y_step)
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse per-row filtering -> (h, stride) uint8 of recon bytes."""
    if h == 0 or stride == 0:
        return np.zeros((h, stride), dtype=np.uint8)
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = rows[:, 0]
    if ftypes.max(initial=0) > 4:
        raise ValueError(f"bad PNG filter type {int(ftypes.max())}")
    out = np.zeros((h, stride), dtype=np.uint8)
    data = rows[:, 1:]
    has_serial = bool(np.any((ftypes == 3) | (ftypes == 4)))
    if not has_serial:
        # vectorized path: none(0) copies, up(2) is a cumulative sum
        # down runs of consecutive up-rows, sub(1) is a per-lane
        # cumsum along x
        prev = np.zeros(stride, dtype=np.uint8)
        for y in range(h):
            f = ftypes[y]
            if f == 0:
                out[y] = data[y]
            elif f == 2:
                out[y] = data[y] + prev  # uint8 wraps mod 256
            else:  # f == 1 (sub)
                n = stride // bpp
                lanes = data[y, : n * bpp].reshape(n, bpp).astype(np.int64)
                rec = np.cumsum(lanes, axis=0) % 256
                row = out[y]
                row[: n * bpp] = rec.astype(np.uint8).reshape(-1)
                row[n * bpp:] = data[y, n * bpp:]  # stride % bpp == 0 always
            prev = out[y]
        return out
    # scalar fallback (average/paeth recurrences are serial in x)
    recon = bytearray(h * stride)
    prior = bytearray(stride)
    dataflat = data.tobytes()
    for y in range(h):
        f = ftypes[y]
        base = y * stride
        row = bytearray(dataflat[base : base + stride])
        if f == 0:
            pass
        elif f == 1:
            for x in range(bpp, stride):
                row[x] = (row[x] + row[x - bpp]) & 0xFF
        elif f == 2:
            for x in range(stride):
                row[x] = (row[x] + prior[x]) & 0xFF
        elif f == 3:
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + ((left + prior[x]) >> 1)) & 0xFF
        else:  # 4
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                ul = prior[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + _paeth(left, prior[x], ul)) & 0xFF
        recon[base : base + stride] = row
        prior = row
    return np.frombuffer(bytes(recon), dtype=np.uint8).reshape(h, stride)


def _unpack_samples(recon: np.ndarray, w: int, channels: int, depth: int) -> np.ndarray:
    """(h, stride) recon bytes -> (h, w, channels) samples (uint8/16)."""
    h = recon.shape[0]
    if depth == 8:
        return recon.reshape(h, -1)[:, : w * channels].reshape(h, w, channels)
    if depth == 16:
        flat = recon.reshape(h, -1)[:, : w * channels * 2]
        u16 = flat.reshape(h, w * channels, 2).astype(np.uint16)
        return ((u16[..., 0] << 8) | u16[..., 1]).reshape(h, w, channels)
    # sub-byte depths: only gray/palette (channels == 1) per the spec
    bits = np.unpackbits(recon, axis=1)
    spp = 8 // depth
    vals = bits.reshape(h, -1, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    samples = (vals * weights).sum(axis=2).astype(np.uint8)
    del spp
    return samples[:, :w].reshape(h, w, 1)


def read_png(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode a PNG byte stream -> ((bands, rows, cols) array, meta).

    meta: {"w", "h", "depth", "color_type", "interlace", "palette"
    (bool), "trns" (gray/RGB transparent sample tuple or None)}.
    """
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    plte: bytes | None = None
    trns: bytes | None = None
    idat = bytearray()
    seen_iend = False
    while pos + 8 <= len(data):
        length, ctype = struct.unpack(">I4s", data[pos : pos + 8])
        chunk = data[pos + 8 : pos + 8 + length]
        if len(chunk) != length:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + chunk) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG CRC mismatch in {ctype!r}")
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"PLTE":
            plte = chunk
        elif ctype == b"tRNS":
            trns = chunk
        elif ctype == b"IDAT":
            idat.extend(chunk)
        elif ctype == b"IEND":
            seen_iend = True
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    if not seen_iend:
        raise ValueError("PNG missing IEND")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError(f"bad PNG compression/filter method {comp}/{filt}")
    if color_type not in _CHANNELS:
        raise ValueError(f"bad PNG color type {color_type}")
    if depth not in (1, 2, 4, 8, 16) or (
        depth < 8 and color_type in (2, 4, 6)
    ) or (color_type == 3 and depth == 16):
        raise ValueError(f"bad PNG bit depth {depth} for color type {color_type}")
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace {interlace}")
    channels = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    bpp = max(1, channels * depth // 8)

    def stride_for(width: int) -> int:
        return (width * channels * depth + 7) // 8

    if interlace == 0:
        expect = h * (stride_for(w) + 1)
        if len(raw) != expect:
            raise ValueError(f"PNG pixel data length {len(raw)} != {expect}")
        recon = _unfilter(raw, h, stride_for(w), bpp)
        samples = _unpack_samples(recon, w, channels, depth)
    else:
        out_dtype = np.uint16 if depth == 16 else np.uint8
        samples = np.zeros((h, w, channels), dtype=out_dtype)
        off = 0
        for x0, y0, xs, ys in _ADAM7:
            pw = (w - x0 + xs - 1) // xs
            ph = (h - y0 + ys - 1) // ys
            if pw == 0 or ph == 0:
                continue
            stride = stride_for(pw)
            span = ph * (stride + 1)
            sub = _unfilter(raw[off : off + span], ph, stride, bpp)
            off += span
            samples[y0::ys, x0::xs] = _unpack_samples(sub, pw, channels, depth)
        if off != len(raw):
            raise ValueError("PNG Adam7 pixel data length mismatch")
    trns_vals = None
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = samples[..., 0]
        if idx.max(initial=0) >= len(pal):
            raise ValueError("palette index out of range")
        rgb = pal[idx]  # (h, w, 3)
        if trns is not None:
            alpha_lut = np.full(len(pal), 255, dtype=np.uint8)
            a = np.frombuffer(trns, dtype=np.uint8)
            alpha_lut[: len(a)] = a
            samples = np.concatenate([rgb, alpha_lut[idx][..., None]], axis=2)
        else:
            samples = rgb
    elif trns is not None and color_type in (0, 2):
        n = len(trns) // 2
        trns_vals = struct.unpack(f">{n}H", trns)
    arr = np.ascontiguousarray(samples.transpose(2, 0, 1))
    meta = {
        "w": int(w),
        "h": int(h),
        "depth": int(depth),
        "color_type": int(color_type),
        "interlace": int(interlace),
        "palette": color_type == 3,
        "trns": trns_vals,
    }
    return arr, meta


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def write_png(arr: np.ndarray, row_filter: str = "up", level: int = 6) -> bytes:
    """Encode (bands, rows, cols) or (rows, cols) uint8/uint16 -> PNG.

    bands: 1=gray, 2=gray+alpha, 3=RGB, 4=RGBA.  row_filter in
    {"none", "sub", "up"} applies to every row (all three unfilter on
    the reader's vectorized path)."""
    if arr.ndim == 2:
        arr = arr[None]
    if arr.ndim != 3 or arr.shape[0] not in (1, 2, 3, 4):
        raise ValueError(f"write_png needs (bands<=4, rows, cols), got {arr.shape}")
    if arr.dtype == np.uint8:
        depth = 8
    elif arr.dtype == np.uint16:
        depth = 16
    else:
        raise ValueError(f"write_png supports uint8/uint16, got {arr.dtype}")
    bands, h, w = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[bands]
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0)
    pix = arr.transpose(1, 2, 0)  # (h, w, bands)
    if depth == 16:
        rows = pix.astype(">u2").reshape(h, -1).view(np.uint8)
    else:
        rows = pix.reshape(h, -1)
    bpp = max(1, bands * depth // 8)
    fcode = {"none": 0, "sub": 1, "up": 2}[row_filter]
    if fcode == 0:
        filt = rows
    elif fcode == 1:
        filt = rows.copy()
        filt[:, bpp:] = rows[:, bpp:] - rows[:, :-bpp]
    else:
        filt = rows.copy()
        filt[1:] = rows[1:] - rows[:-1]
    stream = np.concatenate(
        [np.full((h, 1), fcode, dtype=np.uint8), filt], axis=1
    ).tobytes()
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(stream, level))
        + _chunk(b"IEND", b"")
    )


def sniff_format(data: bytes) -> str | None:
    """'png' | 'tif' | None from magic bytes."""
    if data[:8] == PNG_SIG:
        return "png"
    if data[:2] in (b"II", b"MM"):
        return "tif"
    return None


def read_image(data: bytes) -> tuple[np.ndarray, dict]:
    """Magic-sniffing decode: PNG or (Big)TIFF -> (array, meta).

    The ingest surface for mixed-format corpora (the input_hint's
    ``fmt`` column): geo metadata (transform/crs/nodata) comes back
    only for TIFF; PNG meta carries the raster shape/depth."""
    kind = sniff_format(data)
    if kind == "png":
        arr, meta = read_png(data)
        meta.setdefault("transform", None)
        meta.setdefault("crs", None)
        meta.setdefault("nodata", None)
        return arr, meta
    if kind == "tif":
        from ukis_pysat_spark.sources.geotiff import read_geotiff

        return read_geotiff(data)
    raise ValueError("unknown image format (expected PNG or TIFF magic)")
