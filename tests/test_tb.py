"""TensorBoard event-file writer: wire-format round-trip and (slow) parse by
the real TensorFlow record reader.

Replaces the reference's TB summary channel
(/root/reference/model/train_single_gpu.py:54,91-95,160-162)."""

import glob
import os
import struct
import zlib

import numpy as np
import pytest

from densereg_tpu.utils.tb import (
    EventWriter,
    encode_png,
    histogram_proto,
    read_events,
)


def _decode_png(png: bytes) -> np.ndarray:
    """Minimal decoder for the filter-0 PNGs encode_png emits."""
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    i, idat, w = 8, b"", None
    while i < len(png):
        (ln,) = struct.unpack(">I", png[i:i + 4])
        tag = png[i + 4:i + 8]
        data = png[i + 8:i + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, color = struct.unpack(">IIBB", data[:10])
            c = {0: 1, 2: 3, 6: 4}[color]
            assert depth == 8
        elif tag == b"IDAT":
            idat += data
        i += 12 + ln
    raw = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(h, -1)
    assert (raw[:, 0] == 0).all(), "expected filter byte 0"
    return raw[:, 1:].reshape(h, w, c)


def test_scalar_histogram_image_roundtrip(tmp_path):
    wr = EventWriter(str(tmp_path))
    wr.add_scalar("loss/total", 1.25, step=3)
    wr.add_scalars({"lr": 1e-3, "loss/hm": 0.5}, step=4)
    values = np.concatenate([np.linspace(-2, 2, 101), [0.0, 1e-30]])
    wr.add_histogram("params/stem", values, step=5)
    img = (np.arange(24 * 32 * 3) % 256).astype(np.uint8).reshape(24, 32, 3)
    wr.add_image("val/skeleton", img, step=6)
    wr.add_image("val/gray_float", np.linspace(0, 1, 64).reshape(8, 8),
                 step=7)
    wr.close()

    events = list(read_events(wr.path))  # check_crc=True: validates framing
    assert events[0]["file_version"] == "brain.Event:2"
    tagged = {v["tag"]: (e, v) for e in events[1:] for v in e["values"]}

    e, v = tagged["loss/total"]
    assert e["step"] == 3 and abs(v["simple_value"] - 1.25) < 1e-6
    assert abs(tagged["lr"][1]["simple_value"] - 1e-3) < 1e-9

    h = tagged["params/stem"][1]["histo"]
    assert h["num"] == values.size
    assert abs(h["sum"] - values.sum()) < 1e-9
    assert abs(h["min"] - -2.0) < 1e-12 and abs(h["max"] - 2.0) < 1e-12
    assert h["bucket"].sum() == values.size
    assert len(h["bucket"]) == len(h["bucket_limit"])
    assert (np.diff(h["bucket_limit"]) > 0).all()

    im = tagged["val/skeleton"][1]["image"]
    assert (im["height"], im["width"], im["colorspace"]) == (24, 32, 3)
    np.testing.assert_array_equal(_decode_png(im["png"]), img)
    gray = tagged["val/gray_float"][1]["image"]
    assert gray["colorspace"] == 1
    decoded = _decode_png(gray["png"])[..., 0]
    assert decoded[0, 0] == 0 and decoded[-1, -1] == 255


def test_histogram_proto_extremes():
    for vals in ([0.0], [-1e30, 1e30], np.zeros(10), [np.nan, 1.0, np.inf]):
        h = read_hist(histogram_proto(vals))
        assert h["bucket"].sum() == h["num"] > 0


def read_hist(buf):
    from densereg_tpu.utils.tb import _iter_fields

    out = {}
    for f, _, v in _iter_fields(buf):
        name = {1: "min", 2: "max", 3: "num", 4: "sum", 5: "sum_squares",
                6: "bucket_limit", 7: "bucket"}[f]
        out[name] = np.frombuffer(v, "<f8") if f in (6, 7) else v
    return out


@pytest.mark.slow
def test_stock_tensorflow_reads_our_events(tmp_path):
    """The real tooling contract: TF's own record reader + Summary proto
    parse the file (same code path TensorBoard uses)."""
    tf = pytest.importorskip("tensorflow")

    wr = EventWriter(str(tmp_path))
    wr.add_scalar("loss", 2.5, step=10)
    wr.add_histogram("w", np.linspace(-1, 1, 50), step=10)
    wr.add_image("img", np.zeros((4, 4, 3), np.uint8), step=10)
    wr.close()

    paths = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
    assert paths == [wr.path]
    seen = {}
    for rec in tf.compat.v1.train.summary_iterator(wr.path):
        for v in rec.summary.value:
            seen[v.tag] = (rec.step, v)
    assert not seen or set(seen) == {"loss", "w", "img"}
    step, v = seen["loss"]
    assert step == 10 and abs(v.simple_value - 2.5) < 1e-6
    hist = seen["w"][1].histo
    assert hist.num == 50 and abs(hist.sum) < 1e-9
    img = seen["img"][1].image
    assert (img.height, img.width, img.colorspace) == (4, 4, 3)
    decoded = tf.io.decode_png(img.encoded_image_string)
    assert tuple(decoded.shape) == (4, 4, 3)
    assert int(tf.reduce_sum(tf.cast(decoded, tf.int32))) == 0
