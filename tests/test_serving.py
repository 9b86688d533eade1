import jax
import jax.numpy as jnp
import numpy as np

from densereg_tpu.config import CameraConfig, NetConfig
from densereg_tpu.models import DenseRegNet
from densereg_tpu.serving import Predictor

ICVL = CameraConfig(fx=241.42, fy=241.42, cx=160, cy=120, w=320, h=240)
NET = NetConfig(num_stack=1, num_fea=8, num_joint=4, input_hw=(32, 32))


def _variables():
    net = DenseRegNet(NET)
    return net.init({"params": jax.random.key(0)},
                    jnp.zeros((1, 32, 32, 1)), train=False)


def test_predictor_shapes_padding_and_chunking(rng):
    pred = Predictor(_variables(), NET, ICVL, max_batch=4)
    frames = rng.uniform(300, 500, (3, 240, 320)).astype(np.float32)
    bbxs = np.tile(np.array([60, 80, 200, 260, 600], np.float32), (3, 1))
    xyz = pred(frames, bbxs)
    assert xyz.shape == (3, 12)
    assert np.isfinite(xyz).all()

    # chunking: batch larger than max_batch gives identical per-frame results
    frames9 = np.concatenate([frames, frames, frames])
    bbxs9 = np.concatenate([bbxs, bbxs, bbxs])
    xyz9 = pred(frames9, bbxs9)
    assert xyz9.shape == (9, 12)
    np.testing.assert_allclose(xyz9[:3], xyz, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(xyz9[3:6], xyz, rtol=1e-5, atol=1e-5)


def test_export_roundtrip_matches_live_predictor(rng, tmp_path):
    """jax.export artifact: baked-in weights + full serving program must
    reproduce the live Predictor bit-for-bit, without model code."""
    from densereg_tpu.export import export_predictor, load_exported

    pred = Predictor(_variables(), NET, ICVL, max_batch=4)
    path = str(tmp_path / "model.drexpt")
    export_predictor(pred, path, platforms=("cpu",))

    loaded = load_exported(path)
    assert loaded.max_batch == 4
    assert loaded.frame_hw == (240, 320)
    assert loaded.num_joint == 4

    frames = rng.uniform(300, 500, (3, 240, 320)).astype(np.float32)
    bbxs = np.tile(np.array([60, 80, 200, 260, 600], np.float32), (3, 1))
    np.testing.assert_array_equal(pred(frames, bbxs), loaded(frames, bbxs))

    # chunked request through the exported program
    frames9 = np.concatenate([frames] * 3)
    bbxs9 = np.concatenate([bbxs] * 3)
    np.testing.assert_array_equal(pred(frames9, bbxs9),
                                  loaded(frames9, bbxs9))

    # header validation
    import pytest
    bad = tmp_path / "bad.drexpt"
    bad.write_bytes(b"NOTDREXP" + b"\0" * 16)
    with pytest.raises(ValueError, match="not a densereg export"):
        load_exported(str(bad))

    # integrity: a flipped byte in the blob is caught by the sha256 check
    raw = bytearray(open(path, "rb").read())
    raw[-10] ^= 0xFF
    corrupt = tmp_path / "corrupt.drexpt"
    corrupt.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="corrupted"):
        load_exported(str(corrupt))


def test_export_u16_entry_matches_live_and_f32(rng, tmp_path):
    """Dual-entry artifact: the uint16 entry point must reproduce the f32
    entry point AND the live predictor exactly (integer-mm depth is exactly
    representable in both dtypes), so exported-artifact servers keep the
    u16 wire's transfer win.  f32-only artifacts (pre-u16 layout, or
    ``u16=False``) still load and serve u16 requests via a host-side
    cast."""
    from densereg_tpu.export import export_predictor, load_exported

    pred = Predictor(_variables(), NET, ICVL, max_batch=4)
    path = str(tmp_path / "m.drexpt")
    export_predictor(pred, path, platforms=("cpu",))
    loaded = load_exported(path)
    assert loaded.accepts_u16

    frames = np.round(rng.uniform(300, 500, (3, 240, 320)))
    bbxs = np.tile(np.array([60, 80, 200, 260, 600], np.float32), (3, 1))
    f32, u16 = frames.astype(np.float32), frames.astype(np.uint16)
    want = pred(f32, bbxs)
    np.testing.assert_array_equal(pred(u16, bbxs), want)
    np.testing.assert_array_equal(loaded(f32, bbxs), want)
    np.testing.assert_array_equal(loaded(u16, bbxs), want)

    path32 = str(tmp_path / "m32.drexpt")
    export_predictor(pred, path32, platforms=("cpu",), u16=False)
    old = load_exported(path32)
    assert not old.accepts_u16
    np.testing.assert_array_equal(old(u16, bbxs), want)
    # the dual-entry artifact costs ~2x (weights baked into each program)
    import os
    assert os.path.getsize(path) > 1.5 * os.path.getsize(path32)


def test_export_batch_bucket_ladder(rng, tmp_path):
    """A bucketed Predictor exports one program per (bucket, dtype); the
    loaded artifact dispatches lone requests at the 1-bucket (result rows <
    max_batch) and reproduces the live predictor on every path (f32/u16,
    lone/chunked)."""
    import os

    from densereg_tpu.export import export_predictor, load_exported

    pred = Predictor(_variables(), NET, ICVL, max_batch=4,
                     batch_buckets=(1,))
    path = str(tmp_path / "ladder.drexpt")
    export_predictor(pred, path, platforms=("cpu",))
    loaded = load_exported(path)
    assert loaded.batch_buckets == (1, 4)  # predictor ladder carried over
    assert loaded.accepts_u16

    # lone request rides the 1-bucket program, not max_batch padding
    frames = np.round(rng.uniform(300, 500, (3, 240, 320)))
    bbxs = np.tile(np.array([60, 80, 200, 260, 600], np.float32), (3, 1))
    f32 = frames.astype(np.float32)
    assert np.asarray(
        loaded._dispatch(f32[:1][..., None], bbxs[:1])).shape[0] == 1
    assert np.asarray(
        loaded._dispatch(f32[..., None], bbxs)).shape[0] == 4

    want = pred(f32, bbxs)
    np.testing.assert_array_equal(loaded(f32, bbxs), want)
    np.testing.assert_array_equal(loaded(f32[:1], bbxs[:1]), want[:1])
    np.testing.assert_array_equal(
        loaded(frames.astype(np.uint16), bbxs), want)
    # chunked request > max_batch through the embedded ladder
    np.testing.assert_array_equal(
        loaded(np.concatenate([f32] * 3), np.concatenate([bbxs] * 3)),
        np.concatenate([want] * 3))

    # warmup touches every embedded program and returns
    loaded.warmup()

    # ladder can also be requested at export time without a bucketed
    # predictor, and each rung costs ~one weights-worth of bytes
    flat = Predictor(_variables(), NET, ICVL, max_batch=4)
    base = str(tmp_path / "flat.drexpt")
    export_predictor(flat, base, platforms=("cpu",), u16=False)
    path2 = str(tmp_path / "ladder2.drexpt")
    export_predictor(flat, path2, platforms=("cpu",), u16=False,
                     batch_buckets=(1, 2))
    l2 = load_exported(path2)
    assert l2.batch_buckets == (1, 2, 4) and not l2.accepts_u16
    np.testing.assert_array_equal(l2(f32, bbxs), flat(f32, bbxs))
    assert os.path.getsize(path2) > 2.2 * os.path.getsize(base)

    # a corrupted bucket blob (past the legacy region) is still caught
    import pytest
    raw = bytearray(open(path2, "rb").read())
    raw[-10] ^= 0xFF
    corrupt = tmp_path / "corrupt_ladder.drexpt"
    corrupt.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="corrupted"):
        load_exported(str(corrupt))


def test_predictor_batch_buckets(rng):
    """batch_buckets ladder: each dispatch pads to the SMALLEST bucket that
    fits (lone requests pay batch-1 device time, not max_batch's), results
    match the single-bucket predictor, and max_batch is always a bucket so
    chunking still works."""
    import pytest

    variables = _variables()
    pred = Predictor(variables, NET, ICVL, max_batch=8,
                     batch_buckets=(1, 4))
    assert pred.batch_buckets == (1, 4, 8)  # max_batch auto-included

    frames = rng.uniform(300, 500, (3, 240, 320)).astype(np.float32)
    bbxs = np.tile(np.array([60, 80, 200, 260, 600], np.float32), (3, 1))
    # the dispatch result has bucket rows: 3 requests ride the 4-bucket,
    # a lone request rides the 1-bucket
    assert np.asarray(
        pred._dispatch(frames[..., None], bbxs)).shape[0] == 4
    assert np.asarray(
        pred._dispatch(frames[:1][..., None], bbxs[:1])).shape[0] == 1

    ref = Predictor(variables, NET, ICVL, max_batch=8)
    np.testing.assert_allclose(pred(frames, bbxs), ref(frames, bbxs),
                               rtol=1e-5, atol=1e-5)
    # chunked request > max_batch still round-trips through the ladder
    frames9 = np.concatenate([frames] * 3)
    bbxs9 = np.concatenate([bbxs] * 3)
    np.testing.assert_allclose(pred(frames9, bbxs9), ref(frames9, bbxs9),
                               rtol=1e-5, atol=1e-5)

    # warmup compiles every remaining (bucket, dtype) program and returns
    pred.warmup(with_u16=False)

    # buckets outside [1, max_batch] are rejected up front
    with pytest.raises(ValueError, match="batch_buckets"):
        Predictor(variables, NET, ICVL, max_batch=4, batch_buckets=(6,))
    # default stays single-bucket
    assert ref.batch_buckets == (8,)


def test_predictor_uint16_request_matches_float32(rng):
    """Serving accepts uint16 depth frames (half the transfer bytes); the
    on-device cast must reproduce the float32 request exactly."""
    pred = Predictor(_variables(), NET, ICVL, max_batch=4)
    frames = np.round(rng.uniform(300, 500, (3, 240, 320)))
    bbxs = np.tile(np.array([60, 80, 200, 260, 600], np.float32), (3, 1))
    xyz_f32 = pred(frames.astype(np.float32), bbxs)
    xyz_u16 = pred(frames.astype(np.uint16), bbxs)
    np.testing.assert_array_equal(xyz_f32, xyz_u16)


def test_predictor_folds_bn_by_default():
    pred = Predictor(_variables(), NET, ICVL, max_batch=2)
    assert pred.net_cfg.fold_bn
    # folded tree: convs have biases, no bn params
    p = pred.variables["params"]
    assert "bias" in p["stem_conv"]["conv"]
    assert "bn" not in p["stem_conv"]


def test_compare_results_tool(tmp_path):
    import sys
    sys.path.insert(0, "/root/repo")
    from tools.compare_results import compare
    from densereg_tpu.eval.writer import ResultWriter

    a, b = str(tmp_path / "a.txt"), str(tmp_path / "b.txt")
    with ResultWriter(a) as w:
        w.write("f1", np.zeros(6))
        w.write("f2", np.zeros(6))
    with ResultWriter(b) as w:
        w.write("f2", np.full(6, 3.0))   # shuffled order, +3mm on each axis
        w.write("f1", np.zeros(6))
    rep = compare(a, b)
    assert rep["frames"] == 2
    np.testing.assert_allclose(rep["mean_joint_error_mm"],
                               np.sqrt(27) / 2, rtol=1e-5)


def test_predictor_on_mesh(rng):
    """batch-parallel serving across the 8-device mesh"""
    from densereg_tpu.parallel import make_mesh

    mesh = make_mesh()
    pred = Predictor(_variables(), NET, ICVL, max_batch=8, mesh=mesh)
    frames = rng.uniform(300, 500, (8, 240, 320)).astype(np.float32)
    bbxs = np.tile(np.array([60, 80, 200, 260, 600], np.float32), (8, 1))
    xyz = pred(frames, bbxs)
    assert xyz.shape == (8, 12) and np.isfinite(xyz).all()
    # same results as the unsharded predictor
    ref = Predictor(_variables(), NET, ICVL, max_batch=8)(frames, bbxs)
    np.testing.assert_allclose(xyz, ref, rtol=1e-4, atol=1e-4)


def test_predictor_int8_calibrated(rng):
    """quantize=True + a (frames, bbxs) calibration set: int8 params, static
    activation scales recorded through the predictor's own crop/normalize
    path.  On the calibration requests themselves the static scales equal
    the dynamic per-batch ones, so the two quantized predictors must agree;
    the decoded poses stay finite and shaped."""
    variables = _variables()
    frames = rng.uniform(300, 500, (3, 240, 320)).astype(np.float32)
    bbxs = np.tile(np.array([60, 80, 200, 260, 600], np.float32), (3, 1))

    dyn = Predictor(variables, NET, ICVL, max_batch=4, quantize=True)
    assert "act_stats" not in dyn.variables
    q = Predictor(variables, NET, ICVL, max_batch=4, quantize=True,
                  calibration=(frames, bbxs))
    assert q.net_cfg.quantize
    assert q.variables["params"]["stem_conv"]["kernel_q"].dtype == jnp.int8
    amax = jax.tree_util.tree_leaves(q.variables["act_stats"])
    assert amax and all(float(a) > 0 for a in amax)

    xd, xq = dyn(frames, bbxs), q(frames, bbxs)
    assert xq.shape == (3, 12) and np.isfinite(xq).all()
    np.testing.assert_allclose(xq, xd, rtol=1e-4, atol=1e-3)
