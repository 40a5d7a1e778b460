import numpy as np
import pytest

from ukis_pysat_spark import codec


@pytest.mark.parametrize("fmt", ["raw", "rawz"])
@pytest.mark.parametrize("dtype", ["uint8", "uint16", "int16", "float32"])
def test_lossless_roundtrip(fmt, dtype):
    rng = np.random.Generator(np.random.Philox(key=7))
    arr = rng.integers(0, 255, size=(3, 17, 23)).astype(dtype)
    out = codec.decode(codec.encode(arr, fmt))
    assert out.dtype == np.dtype(dtype)
    assert np.array_equal(out, arr)


def test_2d_promotes_to_3d():
    # reference promotes 2-D arrays to (1, rows, cols): raster.py:65-66
    arr = np.ones((385, 502), dtype=np.int16)
    out = codec.decode(codec.encode(arr, "raw"))
    assert out.shape == (1, 385, 502)


def test_q8_psnr_gate():
    rng = np.random.Generator(np.random.Philox(key=11))
    arr = (rng.random((2, 64, 64)) * 2000).astype(np.int16)
    out = codec.decode(codec.encode(arr, "q8"))
    assert out.dtype == np.float32
    assert codec.psnr(arr, out) >= 40.0  # BASELINE.json:15 lossy gate


def test_peek_shape():
    arr = np.zeros((4, 5, 6), dtype=np.uint16)
    assert codec.peek_shape(codec.encode(arr)) == (4, 5, 6)
