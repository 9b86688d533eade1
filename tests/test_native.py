"""Native depthio codec (native/depthio.cc via ctypes) against PIL ground
truth.  Skips cleanly when g++/zlib are unavailable."""

import io

import numpy as np
import pytest

from densereg_tpu.data import native, png16


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native depthio not built")


def _png16_bytes(arr):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr.astype(np.int32), mode="I").save(buf, format="PNG",
                                                         bits=16)
    return buf.getvalue()


def _nyu_bytes(depth):
    from PIL import Image
    rgb = np.zeros(depth.shape + (3,), np.uint8)
    rgb[..., 1] = depth >> 8
    rgb[..., 2] = depth & 0xFF
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="PNG")
    return buf.getvalue()


def test_gray16_roundtrip(rng):
    d = rng.integers(0, 60000, (240, 320)).astype(np.uint16)
    out = native.decode_png16(_png16_bytes(d), 240, 320)
    np.testing.assert_array_equal(out, d)


def test_nyu_packed_roundtrip(rng):
    d = rng.integers(0, 3000, (120, 160)).astype(np.uint16)
    out = native.decode_png16(_nyu_bytes(d), 120, 160, nyu_packed=True)
    np.testing.assert_array_equal(out, d)


def test_batch_decode_threads(rng):
    ds = [rng.integers(0, 60000, (48, 64)).astype(np.uint16)
          for _ in range(17)]
    blobs = [_png16_bytes(d) for d in ds]
    out = native.decode_png16_batch(blobs, 48, 64, num_threads=4)
    assert out.shape == (17, 48, 64)
    for i, d in enumerate(ds):
        np.testing.assert_array_equal(out[i], d)


def test_shape_mismatch_raises(rng):
    d = rng.integers(0, 100, (10, 12)).astype(np.uint16)
    with pytest.raises(ValueError):
        native.decode_png16(_png16_bytes(d), 11, 12)


def test_garbage_raises():
    with pytest.raises(ValueError):
        native.decode_png16(b"\x89PNG\r\n\x1a\n" + b"garbage" * 10, 4, 4)


def test_png16_module_uses_native(rng):
    """public decode path agrees with PIL regardless of backend"""
    d = rng.integers(0, 60000, (32, 32)).astype(np.uint16)
    data = _png16_bytes(d)
    np.testing.assert_array_equal(png16.decode_png16(data), d)
    assert png16.png_dims(data) == (32, 32)
