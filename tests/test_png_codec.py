"""PNG codec: differential tests against (a) a spec-literal scalar
filterer/interlacer written here from the PNG spec (RFC 2083 §6), and
(b) the SYSTEM libpng16 via its simplified API (the decoder browsers/
GDAL build on) — both directions: libpng reads our writer's files,
our reader decodes libpng-written and hand-filtered files."""

import ctypes
import struct
import zlib

import numpy as np
import pytest

from ukis_pysat_spark.sources import png as P

# --- spec-literal helpers (independent of the engine implementation) --------


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_rows_scalar(rows: np.ndarray, bpp: int, ftypes) -> bytes:
    """Apply per-row filters 0..4 exactly as PNG spec §6.1 defines the
    FORWARD direction — the inverse pair of the engine's unfilter."""
    h, stride = rows.shape
    out = bytearray()
    prior = bytes(stride)
    for y in range(h):
        f = ftypes[y]
        raw = bytes(rows[y])
        filt = bytearray(stride)
        for x in range(stride):
            left = raw[x - bpp] if x >= bpp else 0
            up = prior[x]
            ul = prior[x - bpp] if x >= bpp else 0
            if f == 0:
                v = raw[x]
            elif f == 1:
                v = raw[x] - left
            elif f == 2:
                v = raw[x] - up
            elif f == 3:
                v = raw[x] - ((left + up) >> 1)
            else:
                v = raw[x] - _paeth(left, up, ul)
            filt[x] = v & 0xFF
        out.append(f)
        out.extend(filt)
        prior = raw
    return bytes(out)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _build_png(w, h, depth, color_type, idat_raw, plte=None, trns=None, interlace=0):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    parts = [P.PNG_SIG, _chunk(b"IHDR", ihdr)]
    if plte is not None:
        parts.append(_chunk(b"PLTE", plte))
    if trns is not None:
        parts.append(_chunk(b"tRNS", trns))
    parts.append(_chunk(b"IDAT", zlib.compress(idat_raw)))
    parts.append(_chunk(b"IEND", b""))
    return b"".join(parts)


# --- libpng16 simplified API --------------------------------------------------


class _PngImage(ctypes.Structure):
    _fields_ = [
        ("opaque", ctypes.c_void_p),
        ("version", ctypes.c_uint32),
        ("width", ctypes.c_uint32),
        ("height", ctypes.c_uint32),
        ("format", ctypes.c_uint32),
        ("flags", ctypes.c_uint32),
        ("colormap_entries", ctypes.c_uint32),
        ("warning_or_error", ctypes.c_uint32),
        ("message", ctypes.c_char * 64),
    ]


def _libpng():
    try:
        lp = ctypes.CDLL("libpng16.so.16")
    except OSError:
        return None
    lp.png_image_begin_read_from_memory.restype = ctypes.c_int
    lp.png_image_begin_read_from_memory.argtypes = [
        ctypes.POINTER(_PngImage), ctypes.c_char_p, ctypes.c_size_t]
    lp.png_image_finish_read.restype = ctypes.c_int
    lp.png_image_finish_read.argtypes = [
        ctypes.POINTER(_PngImage), ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int32, ctypes.c_void_p]
    lp.png_image_write_to_memory.restype = ctypes.c_int
    lp.png_image_write_to_memory.argtypes = [
        ctypes.POINTER(_PngImage), ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_size_t), ctypes.c_int, ctypes.c_void_p,
        ctypes.c_int32, ctypes.c_void_p]
    return lp


LP = _libpng()
needs_libpng = pytest.mark.skipif(LP is None, reason="libpng16 not present")


def _libpng_read(data: bytes, fmt: int) -> np.ndarray:
    """(h, w, ch) decode at the requested simplified-API format.
    fmt bits: 1=alpha, 2=color, 4=linear(16-bit)."""
    img = _PngImage()
    img.version = 1
    assert LP.png_image_begin_read_from_memory(ctypes.byref(img), data, len(data)), \
        img.message
    img.format = fmt
    ch = 1 + (fmt & 1) + 2 * ((fmt >> 1) & 1)
    dt = np.uint16 if fmt & 4 else np.uint8
    buf = np.zeros((img.height, img.width, ch), dtype=dt)
    assert LP.png_image_finish_read(
        ctypes.byref(img), None, buf.ctypes.data_as(ctypes.c_void_p), 0, None
    ), img.message
    return buf


def _libpng_write(pix: np.ndarray) -> bytes:
    """(h, w, ch) uint8/uint16 -> PNG bytes via png_image_write_to_memory."""
    h, w, ch = pix.shape
    fmt = {1: 0, 2: 1, 3: 2, 4: 3}[ch] | (4 if pix.dtype == np.uint16 else 0)
    img = _PngImage()
    img.version = 1
    img.width, img.height, img.format = w, h, fmt
    buf = np.ascontiguousarray(pix)
    size = ctypes.c_size_t(0)
    assert LP.png_image_write_to_memory(
        ctypes.byref(img), None, ctypes.byref(size), 0,
        buf.ctypes.data_as(ctypes.c_void_p), 0, None), img.message
    out = ctypes.create_string_buffer(size.value)
    assert LP.png_image_write_to_memory(
        ctypes.byref(img), out, ctypes.byref(size), 0,
        buf.ctypes.data_as(ctypes.c_void_p), 0, None), img.message
    return out.raw[: size.value]


_FMT_FOR = {(1, 8): 0, (2, 8): 1, (3, 8): 2, (4, 8): 3,
            (1, 16): 4, (2, 16): 5, (3, 16): 6, (4, 16): 7}


# --- tests -------------------------------------------------------------------


def test_roundtrip_all_bands_depths_filters():
    rng = np.random.default_rng(11)
    for bands in (1, 2, 3, 4):
        for dt, hi, depth in ((np.uint8, 256, 8), (np.uint16, 65536, 16)):
            for rf in ("none", "sub", "up"):
                a = rng.integers(0, hi, (bands, 21, 13)).astype(dt)
                data = P.write_png(a, row_filter=rf)
                arr, meta = P.read_png(data)
                assert np.array_equal(arr, a), (bands, depth, rf)
                assert (meta["w"], meta["h"], meta["depth"]) == (13, 21, depth)


def _libpng_expected(a: np.ndarray, depth: int) -> np.ndarray:
    """libpng's 16-bit linear formats carry ASSOCIATED (premultiplied)
    alpha: component' = round(c * a / 65535) exactly (verified against
    libpng16); 8-bit and opaque formats are pass-through."""
    bands = a.shape[0]
    if depth == 16 and bands in (2, 4):
        alpha = a[-1].astype(np.float64)
        out = a.copy()
        out[:-1] = np.round(a[:-1].astype(np.float64) * alpha / 65535.0).astype(np.uint16)
        return out
    return a


@needs_libpng
def test_libpng_reads_our_files_bit_exact():
    rng = np.random.default_rng(13)
    for bands in (1, 2, 3, 4):
        for dt, hi, depth in ((np.uint8, 256, 8), (np.uint16, 65536, 16)):
            for rf in ("none", "sub", "up"):
                a = rng.integers(0, hi, (bands, 17, 19)).astype(dt)
                got = _libpng_read(P.write_png(a, row_filter=rf), _FMT_FOR[(bands, depth)])
                assert np.array_equal(got.transpose(2, 0, 1), _libpng_expected(a, depth)), \
                    (bands, depth, rf)


@needs_libpng
def test_our_reader_decodes_libpng_written_files():
    rng = np.random.default_rng(17)
    for ch in (1, 2, 3, 4):
        for dt, hi in ((np.uint8, 256), (np.uint16, 65536)):
            pix = rng.integers(0, hi, (23, 9, ch)).astype(dt)
            if dt == np.uint16 and ch in (2, 4):
                # libpng treats 16-bit alpha input as PREMULTIPLIED and
                # un-premultiplies into the file; opaque alpha makes
                # that conversion the identity, keeping the comparison
                # bit-exact
                pix[..., -1] = 65535
            arr, meta = P.read_png(_libpng_write(pix))
            assert np.array_equal(arr, pix.transpose(2, 0, 1)), (ch, dt)


def test_all_five_filters_against_spec_literal_filterer():
    """Rows filtered FORWARD by the scalar spec-literal filterer (every
    type 0..4, cycling per row) must unfilter back to the original —
    covering average/paeth, which our writer never emits."""
    rng = np.random.default_rng(19)
    for ch, depth in ((1, 8), (3, 8), (4, 8), (1, 16), (3, 16)):
        w, h = 11, 15
        hi = 256 if depth == 8 else 65536
        dt = np.uint8 if depth == 8 else np.uint16
        pix = rng.integers(0, hi, (h, w, ch)).astype(dt)
        if depth == 16:
            rows = pix.astype(">u2").reshape(h, -1).view(np.uint8)
        else:
            rows = pix.reshape(h, -1)
        bpp = ch * depth // 8
        ftypes = [y % 5 for y in range(h)]
        raw = _filter_rows_scalar(rows, bpp, ftypes)
        ct = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
        data = _build_png(w, h, depth, ct, raw)
        arr, meta = P.read_png(data)
        assert np.array_equal(arr, pix.transpose(2, 0, 1)), (ch, depth)
        if LP is not None:
            got = _libpng_read(data, _FMT_FOR[(ch, depth)])
            assert np.array_equal(got, pix), (ch, depth, "libpng")


def test_subbyte_gray_depths():
    """Gray depths 1/2/4: raw (unscaled) samples from our reader; the
    libpng cross-check uses exact left-bit-replication upscaling
    (255/(2^d-1) is integral for d in 1/2/4)."""
    rng = np.random.default_rng(23)
    for depth in (1, 2, 4):
        w, h = 19, 7
        vals = rng.integers(0, 1 << depth, (h, w)).astype(np.uint8)
        # pack rows to bytes MSB-first per spec
        spp = 8 // depth
        padded_w = (w + spp - 1) // spp * spp
        padded = np.zeros((h, padded_w), dtype=np.uint8)
        padded[:, :w] = vals
        bits = (
            (padded[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1
        ).reshape(h, -1).astype(np.uint8)
        rows = np.packbits(bits, axis=1)
        raw = _filter_rows_scalar(rows, 1, [y % 5 for y in range(h)])
        data = _build_png(w, h, depth, 0, raw)
        arr, meta = P.read_png(data)
        assert arr.shape == (1, h, w)
        assert np.array_equal(arr[0], vals), depth
        if LP is not None:
            got = _libpng_read(data, 0)[..., 0]
            assert np.array_equal(got, vals * (255 // ((1 << depth) - 1))), depth


def test_palette_with_and_without_trns():
    rng = np.random.default_rng(29)
    w, h, n_pal = 14, 9, 11
    pal = rng.integers(0, 256, (n_pal, 3)).astype(np.uint8)
    idx = rng.integers(0, n_pal, (h, w)).astype(np.uint8)
    raw = _filter_rows_scalar(idx.copy(), 1, [y % 5 for y in range(h)])
    data = _build_png(w, h, 8, 3, raw, plte=pal.tobytes())
    arr, meta = P.read_png(data)
    assert meta["palette"] and arr.shape == (3, h, w)
    assert np.array_equal(arr, pal[idx].transpose(2, 0, 1))
    if LP is not None:
        got = _libpng_read(data, 2)  # expand to RGB
        assert np.array_equal(got, pal[idx])
    # tRNS: first 4 entries get explicit alpha
    alpha = np.array([0, 64, 128, 255], dtype=np.uint8)
    data = _build_png(w, h, 8, 3, raw, plte=pal.tobytes(), trns=alpha.tobytes())
    arr, meta = P.read_png(data)
    assert arr.shape == (4, h, w)
    full_alpha = np.full(n_pal, 255, dtype=np.uint8)
    full_alpha[:4] = alpha
    exp = np.concatenate([pal[idx], full_alpha[idx][..., None]], axis=2)
    assert np.array_equal(arr, exp.transpose(2, 0, 1))
    if LP is not None:
        got = _libpng_read(data, 3)  # expand to RGBA
        assert np.array_equal(got, exp)


def test_adam7_interlaced():
    """Adam7 built by a spec-literal scalar interlacer (pass layout of
    PNG spec §8.2); the deinterleaved image must equal the original,
    and libpng must agree."""
    rng = np.random.default_rng(31)
    for ch, depth, w, h in ((1, 8, 13, 11), (3, 8, 8, 5), (1, 16, 9, 10), (4, 8, 3, 2)):
        hi = 256 if depth == 8 else 65536
        dt = np.uint8 if depth == 8 else np.uint16
        pix = rng.integers(0, hi, (h, w, ch)).astype(dt)
        bpp = ch * depth // 8
        raw = bytearray()
        for (x0, y0, xs, ys) in [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
                                 (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2),
                                 (0, 1, 1, 2)]:
            sub = pix[y0::ys, x0::xs]
            ph, pw = sub.shape[:2]
            if ph == 0 or pw == 0:
                continue
            if depth == 16:
                rows = sub.astype(">u2").reshape(ph, -1).view(np.uint8)
            else:
                rows = sub.reshape(ph, -1)
            raw += _filter_rows_scalar(np.ascontiguousarray(rows), bpp,
                                       [y % 5 for y in range(ph)])
        ct = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
        data = _build_png(w, h, depth, ct, bytes(raw), interlace=1)
        arr, meta = P.read_png(data)
        assert meta["interlace"] == 1
        assert np.array_equal(arr, pix.transpose(2, 0, 1)), (ch, depth)
        if LP is not None:
            got = _libpng_read(data, _FMT_FOR[(ch, depth)])
            assert np.array_equal(got, pix), (ch, depth, "libpng")


def test_corrupt_streams_fail_loudly():
    a = np.arange(48, dtype=np.uint8).reshape(1, 6, 8)
    good = P.write_png(a)
    with pytest.raises(ValueError, match="signature"):
        P.read_png(b"\x89PNGxxxx" + good[8:])
    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF  # IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        P.read_png(bytes(bad_crc))
    # truncate inside IDAT
    with pytest.raises(ValueError):
        P.read_png(good[:40])
    # bad filter type: build raw with filter 7
    raw = b"\x07" + bytes(8 * 1)
    with pytest.raises(ValueError, match="filter"):
        P.read_png(_build_png(8, 1, 8, 0, raw))
    # pixel data length mismatch
    with pytest.raises(ValueError, match="length"):
        P.read_png(_build_png(8, 2, 8, 0, b"\x00" + bytes(8)))


def test_read_image_sniffs_png_and_tiff():
    from tests import tiffgen

    a = np.arange(40, dtype=np.uint8).reshape(1, 5, 8)
    arr, meta = P.read_image(P.write_png(a))
    assert np.array_equal(arr, a) and meta["transform"] is None
    tif = tiffgen.write_tiff(a)
    arr2, meta2 = P.read_image(tif)
    assert np.array_equal(arr2, a)
    with pytest.raises(ValueError, match="unknown image format"):
        P.read_image(b"\x00\x01\x02\x03garbage")


def test_ingest_mixed_png_and_tiff(spark, tmp_path):
    """binaryFile scan over a dir holding one PNG and one TIFF: both
    ingest into the images table through the magic-sniffing decode;
    the PNG lands on the default unit grid with its pixels intact."""
    from tests import tiffgen
    from ukis_pysat_spark import codec
    from ukis_pysat_spark.sources import geotiff

    rng = np.random.default_rng(37)
    png_px = rng.integers(0, 256, (3, 12, 10)).astype(np.uint8)
    (tmp_path / "scene_a.png").write_bytes(P.write_png(png_px))
    tif_px = rng.integers(0, 256, (2, 6, 7)).astype(np.uint8)
    (tmp_path / "scene_b.tif").write_bytes(tiffgen.write_tiff(tif_px))
    (tmp_path / "junk.bin").write_bytes(b"\x00\x01nota-raster")
    files = spark.read.format("binaryFile").load(str(tmp_path))
    rows = {r.image_id: r for r in geotiff.ingest_geotiffs(files).collect()}
    assert set(rows) == {"scene_a", "scene_b"}
    a = rows["scene_a"]
    assert (a.w, a.h, a.bands, a.dtype) == (10, 12, 3, "uint8")
    assert np.array_equal(codec.decode(a.bytes), png_px)
    assert a.crs == "EPSG:4326" and a.transform == [1.0, 0.0, 0.0, 0.0, -1.0, 0.0]
    assert np.array_equal(codec.decode(rows["scene_b"].bytes), tif_px)
