import jax
import jax.numpy as jnp
import numpy as np

from densereg_tpu.config import NetConfig
from densereg_tpu.models import DenseRegNet, BatchRenorm, renorm_clip_schedule


def _tiny_cfg(**kw):
    base = dict(num_stack=2, num_fea=16, num_joint=4, input_hw=(128, 128))
    base.update(kw)
    return NetConfig(**base)


def test_forward_shapes_and_stacks():
    cfg = _tiny_cfg()
    net = DenseRegNet(cfg)
    x = jnp.zeros((2, 128, 128, 1))
    variables = net.init({"params": jax.random.key(0)}, x, train=False)
    out = net.apply(variables, x, train=False)
    assert len(out["hm"]) == 2 and len(out["hm3"]) == 2 and len(out["um"]) == 2
    assert out["hm"][0].shape == (2, 32, 32, 4)
    assert out["hm3"][1].shape == (2, 32, 32, 4)
    assert out["um"][1].shape == (2, 32, 32, 12)


def test_train_mode_updates_batch_stats():
    cfg = _tiny_cfg(num_stack=1)
    net = DenseRegNet(cfg)
    x = jax.random.normal(jax.random.key(1), (2, 128, 128, 1))
    variables = net.init({"params": jax.random.key(0)}, x, train=False)
    r_max, d_max = renorm_clip_schedule(0.0)
    out, mutated = net.apply(
        variables, x, train=True, r_max=r_max, d_max=d_max,
        mutable=["batch_stats"], rngs={"dropout": jax.random.key(2)})
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    changed = any(not np.allclose(a, b) for a, b in zip(old, new))
    assert changed, "moving statistics must move in train mode"


def test_renorm_schedule_limits():
    r0, d0 = renorm_clip_schedule(0.0)
    np.testing.assert_allclose(float(r0), 1.0, rtol=1e-6)   # 3/(1+2)
    np.testing.assert_allclose(float(d0), 1e-3, rtol=1e-6)
    r_inf, _ = renorm_clip_schedule(20.0)
    np.testing.assert_allclose(float(r_inf), 3.0, rtol=1e-4)


def test_batch_renorm_r1_d0_equals_batchnorm():
    """With r_max=1 (=> r==1, d in [-1e-3,1e-3]~0) train-mode renorm reduces
    to plain batch norm."""
    x = jax.random.normal(jax.random.key(0), (8, 4, 4, 3)) * 2.0 + 1.0
    bn = BatchRenorm()
    variables = bn.init(jax.random.key(1), x, train=False)
    y, _ = bn.apply(variables, x, train=True, r_max=jnp.float32(1.0),
                    d_max=jnp.float32(0.0), mutable=["batch_stats"])
    y = np.asarray(y)
    np.testing.assert_allclose(y.mean(axis=(0, 1, 2)), 0.0, atol=1e-4)
    np.testing.assert_allclose(y.std(axis=(0, 1, 2)), 1.0, atol=2e-2)


def test_eval_uses_moving_stats():
    x = jax.random.normal(jax.random.key(0), (4, 4, 4, 3)) * 3.0
    bn = BatchRenorm(decay=0.0)  # moving stats = last batch
    variables = bn.init(jax.random.key(1), x, train=False)
    _, mutated = bn.apply(variables, x, train=True, mutable=["batch_stats"])
    variables = {**variables, "batch_stats": mutated["batch_stats"]}
    y = np.asarray(bn.apply(variables, x, train=False))
    np.testing.assert_allclose(y.mean(axis=(0, 1, 2)), 0.0, atol=1e-4)


def test_bfloat16_compute_path():
    cfg = _tiny_cfg(num_stack=1, compute_dtype="bfloat16")
    net = DenseRegNet(cfg)
    x = jnp.zeros((1, 128, 128, 1))
    variables = net.init({"params": jax.random.key(0)}, x, train=False)
    out = net.apply(variables, x, train=False)
    # params stay f32, outputs come back f32
    leaf = jax.tree_util.tree_leaves(variables["params"])[0]
    assert leaf.dtype == jnp.float32
    assert out["hm"][0].dtype == jnp.float32


def test_param_count_topology():
    """Spot-check the widths of the reference topology
    (/root/reference/network/um_v1.py): stem conv is 7x7x1x32, um head fc
    width 512, heads emit J / J / 3J channels."""
    cfg = _tiny_cfg()
    net = DenseRegNet(cfg)
    x = jnp.zeros((1, 128, 128, 1))
    variables = net.init({"params": jax.random.key(0)}, x, train=False)
    p = variables["params"]
    assert p["stem_conv"]["conv"]["kernel"].shape == (7, 7, 1, 32)
    assert p["um_fc1_s0"]["conv"]["kernel"].shape[-1] == 512
    assert p["um_fc2_s0"]["conv"]["kernel"].shape == (1, 1, 512, 512)
    assert p["hm_head_s0"]["conv"]["kernel"].shape[-1] == cfg.num_joint
    assert p["um_head_s0"]["conv"]["kernel"].shape[-1] == 3 * cfg.num_joint
    # heads have biases (no BN), BN convs don't
    assert "bias" in p["hm_head_s0"]["conv"]
    assert "bias" not in p["stem_conv"]["conv"]


def test_lite_variant_smaller_and_runs():
    """um_v1_lite: depthwise-separable residual bottlenecks; same heads and
    output contract, substantially fewer parameters."""
    ref = _tiny_cfg(num_stack=1)
    lite = _tiny_cfg(num_stack=1, net_module="um_v1_lite")
    x = jnp.zeros((1, 128, 128, 1))
    pr = DenseRegNet(ref).init({"params": jax.random.key(0)}, x, train=False)
    pl = DenseRegNet(lite).init({"params": jax.random.key(0)}, x, train=False)
    n_ref = sum(p.size for p in jax.tree_util.tree_leaves(pr["params"]))
    n_lite = sum(p.size for p in jax.tree_util.tree_leaves(pl["params"]))
    assert n_lite < n_ref
    out = DenseRegNet(lite).apply(pl, x, train=False)
    assert out["hm"][0].shape == (1, 32, 32, 4)
    assert out["um"][0].shape == (1, 32, 32, 12)
    # the middle conv of a residual is depthwise: kernel (k,k,1,half)
    k = pl["params"]["stem_res2"]["conv2"]["conv"]["kernel"]
    assert k.shape[2] == 1


def test_deconv_variant_learned_upsampling_runs():
    """um_v1_deconv: the hourglass upsamples with a learned stride-2
    transposed conv (models/ops.Deconv — the slim `deconv` op the reference
    ships but never wires into a network,
    /root/reference/network/slim/ops.py:480-545) instead of nearest; same
    heads and output contract, extra deconv parameters at every level."""
    ref = _tiny_cfg(num_stack=1)
    dec = _tiny_cfg(num_stack=1, net_module="um_v1_deconv")
    x = jnp.zeros((1, 128, 128, 1))
    pr = DenseRegNet(ref).init({"params": jax.random.key(0)}, x, train=False)
    pd = DenseRegNet(dec).init({"params": jax.random.key(0)}, x, train=False)
    n_ref = sum(p.size for p in jax.tree_util.tree_leaves(pr["params"]))
    n_dec = sum(p.size for p in jax.tree_util.tree_leaves(pd["params"]))
    assert n_dec > n_ref  # learned upsampling adds parameters
    # one deconv per hourglass level (recursive): depth 4 at 128 input
    hg = pd["params"]["hg_s0"]
    levels = 0
    while True:
        assert "deconv_up" in hg, sorted(hg)
        k = hg["deconv_up"]["ConvTranspose_0"]["kernel"]
        assert k.shape[:2] == (dec.kernel_size, dec.kernel_size)
        levels += 1
        if "inner" not in hg:
            break
        hg = hg["inner"]
    assert levels == dec.hourglass_depth
    out = DenseRegNet(dec).apply(pd, x, train=False)
    assert out["hm"][0].shape == (1, 32, 32, 4)
    assert out["um"][0].shape == (1, 32, 32, 12)
    assert all(np.isfinite(np.asarray(v)).all()
               for k in out for v in out[k])


def test_max_pool_same_matches_reduce_window(rng):
    from densereg_tpu.models.layers import max_pool_same
    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(2, 33, 47, 5)).astype(np.float32))
    for window, stride in ((3, 2), (2, 2), (3, 1)):
        got = max_pool_same(x, window, stride)
        h, w = 33, 47
        out_h, out_w = -(-h // stride), -(-w // stride)
        pad_h = max((out_h - 1) * stride + window - h, 0)
        pad_w = max((out_w - 1) * stride + window - w, 0)
        ref = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            (1, window, window, 1), (1, stride, stride, 1),
            [(0, 0), (pad_h // 2, pad_h - pad_h // 2),
             (pad_w // 2, pad_w - pad_w // 2), (0, 0)])
        assert got.shape == ref.shape, (window, stride)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
