"""uint16 wire codec: error bounds, pipeline integration, end-to-end eval.

The codec (densereg_tpu.wire) halves the host->device bytes of the
host-preprocessed crop feed; these tests pin its contract: background
zeros bit-exact, quantization <= max/131070, and the full eval path
agreeing with the float32 wire to well under the 0.05 mm parity budget.
"""

import numpy as np
import pytest

from densereg_tpu.wire import WIRE_DTYPES, decode_dm_u16, encode_dm_u16


def test_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    dm = rng.uniform(80.0, 620.0, (4, 32, 32, 1)).astype(np.float32)
    dm[:, :8] = 0.0  # crop background
    q, scale = encode_dm_u16(dm)
    assert q.dtype == np.uint16
    assert scale.shape == (1, 1, 1, 1)
    out = decode_dm_u16(q, scale)
    # zeros are preserved EXACTLY (scale-only encoding, no offset) — the
    # `d > 0` validity masks downstream must not change
    np.testing.assert_array_equal(out[:, :8], 0.0)
    # half a quantization step, plus a hair for the float32 divide/multiply
    # in encode/decode (the codec itself computes in f32)
    bound = float(dm.max()) / 65535 * 0.502
    assert float(np.abs(out - dm).max()) <= bound


def test_zero_and_negative_inputs():
    q, scale = encode_dm_u16(np.zeros((1, 4, 4, 1), np.float32))
    np.testing.assert_array_equal(decode_dm_u16(q, scale), 0.0)
    # negatives (never produced by the crop) clamp to 0 instead of wrapping
    q, scale = encode_dm_u16(
        np.asarray([[-5.0, 100.0]], np.float32).reshape(1, 1, 2, 1))
    assert q.reshape(-1)[0] == 0


def test_wire_dtype_validation(tmp_path):
    from densereg_tpu.data.base import get_dataset
    from densereg_tpu.data.pipeline import InputPipeline, TestPipeline

    spec = get_dataset("synthetic", "training", directory=str(tmp_path),
                       num_shards=1, samples_per_shard=4)
    with pytest.raises(ValueError, match="requires host_preprocess"):
        InputPipeline(spec, batch_size=2, wire_dtype="uint16")
    with pytest.raises(ValueError, match="wire_dtype"):
        TestPipeline(spec, batch_size=2, host_preprocess=True,
                     wire_dtype="float16")
    assert "uint16" in WIRE_DTYPES


def test_infer_fn_u16_matches_f32():
    """Passing (uint16 dm, dm_scale) to make_infer_fn's jitted program must
    reproduce the float32-fed decode to far under the 0.05 mm budget."""
    import jax
    import jax.numpy as jnp

    from densereg_tpu.config import EvalConfig, NetConfig
    from densereg_tpu.eval.loop import make_infer_fn
    from densereg_tpu.models import DenseRegNet

    net_cfg = NetConfig(num_stack=1, num_fea=8, num_joint=3,
                        input_hw=(32, 32), compute_dtype="float32")
    net = DenseRegNet(net_cfg)
    variables = net.init({"params": jax.random.key(0)},
                         jnp.zeros((1, 32, 32, 1)), train=False)
    rng = np.random.default_rng(1)
    dm = rng.uniform(300.0, 500.0, (2, 32, 32, 1)).astype(np.float32)
    dm[:, :6] = 0.0
    cfgs = np.tile(np.asarray([[60., 60., 16., 12., 32., 32.]], np.float32),
                   (2, 1))
    coms = np.tile(np.asarray([[0., 0., 400.]], np.float32), (2, 1))
    infer = make_infer_fn(net_cfg, EvalConfig(batch_size=2))
    ref = np.asarray(infer(variables, jnp.asarray(dm), cfgs, coms))
    q, scale = encode_dm_u16(dm)
    got = np.asarray(infer(variables, jnp.asarray(q), cfgs, coms,
                           jnp.asarray(scale)))
    assert float(np.abs(got - ref).max()) < 0.05


def _eval_batches(tmp_path, wire):
    from densereg_tpu.data.base import get_dataset
    from densereg_tpu.data.pipeline import TestPipeline

    spec = get_dataset("synthetic", "testing", directory=str(tmp_path),
                       num_shards=1, samples_per_shard=6)
    pipe = TestPipeline(spec, batch_size=3, input_hw=(32, 32),
                        host_preprocess=True, wire_dtype=wire)
    return spec, list(pipe)


def test_test_pipeline_u16_wire_end_to_end(tmp_path):
    """TestPipeline(wire_dtype="uint16") + evaluate_stream agree with the
    float32 wire on every decoded pose to <0.05 mm."""
    import jax
    import jax.numpy as jnp

    from densereg_tpu import decode as decode_mod, geometry, targets
    from densereg_tpu.config import EvalConfig
    from densereg_tpu.eval.loop import evaluate_stream
    from densereg_tpu.preprocess import norm_dm

    spec, batches_q = _eval_batches(tmp_path, "uint16")
    _, batches_f = _eval_batches(tmp_path, "float32")
    assert batches_q[0]["dm"].dtype == jnp.uint16
    assert "dm_scale" in batches_q[0]
    assert batches_f[0]["dm"].dtype == jnp.float32

    # Oracle "network": sharp GT-shaped heads synthesized from a pose
    # placed deterministically around each frame's center of mass.  A
    # random-init conv net produces flat heatmaps whose top-k/vote-grid
    # selections sit on near-ties, so the wire's <=0.005 mm quantization
    # can flip candidates and decode a wholly different (garbage) pose —
    # that is decode sensitivity on ties, not a wire defect.  Sharp maps
    # pin what the test actually claims: the u16 feed path (host encode ->
    # device dequant -> normalize -> z-clamp/backproject against the
    # quantized dm -> vote decode) reproduces the f32 wire.  The conv
    # net's own u16-vs-f32 stability on smooth inputs is covered by
    # test_infer_fn_u16_matches_f32 above.
    j = spec.jnt_num
    rj = np.random.default_rng(7)
    offsets = jnp.asarray(np.concatenate(
        [rj.uniform(-25, 25, (j, 2)), rj.uniform(-15, 15, (j, 1))],
        axis=1).astype(np.float32).reshape(1, 3 * j))
    ecfg = EvalConfig(batch_size=3)

    def oracle_infer(_variables, dms, cfgs, coms, dm_scale=None):
        dms = dms.astype(jnp.float32)
        if dm_scale is not None:
            dms = dms * dm_scale
        normed = norm_dm(dms, coms)
        pose = coms.reshape(-1, 1, 3).repeat(j, 1).reshape(-1, 3 * j) \
            + offsets
        gt = targets.synthesize(pose, cfgs, coms, normed, 32, 32)
        res = decode_mod.decode_poses(gt["hm2"], gt["hm3"], gt["um"],
                                      gt["tiny_dm"], cfgs, coms, ecfg)
        return res["xyz"]

    infer = jax.jit(oracle_infer)
    outs = {}
    for tag, batches in (("u16", batches_q), ("f32", batches_f)):
        rep = evaluate_stream(infer, None, iter(batches),
                              exact_num=spec.exact_num, log_every=0)
        outs[tag] = rep
    assert outs["u16"]["num_frames"] == outs["f32"]["num_frames"]
    e_q, e_f = outs["u16"]["max_errors"], outs["f32"]["max_errors"]
    np.testing.assert_allclose(e_q, e_f, atol=0.05)


def test_test_pipeline_u16_wire_on_mesh(tmp_path):
    """Under a device mesh the uint16 dm shards over the data axis while
    dm_scale stays an (unsharded) broadcast scalar; the sharded infer
    matches the single-device result."""
    import jax
    import jax.numpy as jnp

    from densereg_tpu.config import EvalConfig, NetConfig
    from densereg_tpu.data.base import get_dataset
    from densereg_tpu.data.pipeline import TestPipeline
    from densereg_tpu.eval.loop import make_infer_fn
    from densereg_tpu.models import DenseRegNet
    from densereg_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    spec = get_dataset("synthetic", "testing", directory=str(tmp_path),
                       num_shards=1, samples_per_shard=8)
    pipe = TestPipeline(spec, batch_size=8, input_hw=(32, 32), mesh=mesh,
                        host_preprocess=True, wire_dtype="uint16")
    batch = next(iter(pipe))
    assert batch["dm"].dtype == jnp.uint16
    assert len(batch["dm"].sharding.device_set) == len(jax.devices())

    net_cfg = NetConfig(num_stack=1, num_fea=8, num_joint=spec.jnt_num,
                        input_hw=(32, 32), compute_dtype="float32")
    net = DenseRegNet(net_cfg)
    variables = net.init({"params": jax.random.key(0)},
                         jnp.zeros((1, 32, 32, 1)), train=False)
    sharded = make_infer_fn(net_cfg, EvalConfig(batch_size=8), mesh=mesh)
    single = make_infer_fn(net_cfg, EvalConfig(batch_size=8))
    got = np.asarray(sharded(variables, batch["dm"], batch["cfg"],
                             batch["com"], batch["dm_scale"]))
    ref = np.asarray(single(
        variables, jnp.asarray(np.asarray(batch["dm"])),
        jnp.asarray(np.asarray(batch["cfg"])),
        jnp.asarray(np.asarray(batch["com"])),
        jnp.asarray(np.asarray(batch["dm_scale"]))))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_test_pipeline_u16_wire_bbx_path(tmp_path):
    """The NYU-style bbx crop route through host_preprocess + uint16 wire:
    the quantized batch must match the float32-wire batch to the codec
    bound (same boxes, same frames)."""
    from densereg_tpu.config import CameraConfig
    from densereg_tpu.data.base import DatasetSpec, ShardWriter
    from densereg_tpu.data.pipeline import TestPipeline

    rng = np.random.default_rng(3)
    path = str(tmp_path / "bbx-0-of-1.npz")
    with ShardWriter(path) as w:
        for i in range(4):
            depth = np.full((120, 160), 900, np.uint16)
            depth[40:80, 60:110] = rng.integers(380, 460, (40, 50))
            pose = rng.uniform(-30, 30, (14, 3)).astype(np.float32)
            pose[:, 2] = rng.uniform(380, 460, 14)
            w.add(depth, pose, f"f{i}", np.asarray([30, 50, 90, 120, 600],
                                                   np.float32))
    cam = CameraConfig(fx=120., fy=120., cx=80., cy=60., w=160, h=120)
    spec = DatasetSpec(name="fake_nyu", subset="testing", cfg=cam,
                       jnt_num=14, max_depth=600.0, directory=str(tmp_path),
                       filenames=[path], exact_num=4, approximate_num=4,
                       uses_bbx=True)

    batches = {}
    for wire in ("float32", "uint16"):
        pipe = TestPipeline(spec, batch_size=4, input_hw=(32, 32),
                            host_preprocess=True, wire_dtype=wire)
        batches[wire] = next(iter(pipe))
    f, q = batches["float32"], batches["uint16"]
    assert q["dm"].dtype == np.uint16 and "dm_scale" in q
    dm_q = np.asarray(q["dm"], np.float32) * np.asarray(q["dm_scale"])
    np.testing.assert_allclose(dm_q, np.asarray(f["dm"]), atol=0.01)
    np.testing.assert_array_equal(np.asarray(q["com"]), np.asarray(f["com"]))


def test_train_pipeline_u16_wire_matches_f32(tmp_path):
    """InputPipeline's consumer-side dequantize reproduces the float32-wire
    batches (same seed, single worker => identical order)."""
    from densereg_tpu.data.base import get_dataset
    from densereg_tpu.data.pipeline import InputPipeline

    spec = get_dataset("synthetic", "training", directory=str(tmp_path),
                       num_shards=1, samples_per_shard=8)
    batches = {}
    for wire in ("float32", "uint16"):
        pipe = InputPipeline(spec, batch_size=2, sub_batch=1,
                             input_hw=(32, 32), seed=7, num_workers=1,
                             host_preprocess=True, wire_dtype=wire)
        try:
            batches[wire] = next(iter(pipe))
        finally:
            pipe.close()
    f, q = batches["float32"], batches["uint16"]
    assert q["dm"].dtype == np.float32  # dequantized on device
    np.testing.assert_allclose(np.asarray(q["dm"]), np.asarray(f["dm"]),
                               atol=0.01)
    np.testing.assert_array_equal(np.asarray(q["pose"]),
                                  np.asarray(f["pose"]))
