import jax
import jax.numpy as jnp
import numpy as np

from densereg_tpu import geometry
from densereg_tpu.config import CameraConfig, NetConfig, TrainConfig
from densereg_tpu.train import (
    create_train_state,
    loss_fn,
    make_train_step,
    weight_decay_loss,
)

ICVL = CameraConfig(fx=241.42, fy=241.42, cx=160, cy=120, w=320, h=240)

NET = NetConfig(num_stack=1, num_fea=8, num_joint=3, input_hw=(32, 32))
TCFG = TrainConfig(batch_size=2, sub_batch=2, augment=False)


def make_batch(rng, sub, b, j=3, hw=32):
    cfg = np.asarray(geometry.scale_cfg(ICVL.as_array(), hw, hw))
    poses = np.zeros((sub, b, j, 3), np.float32)
    poses[..., 0] = rng.uniform(-30, 30, (sub, b, j))
    poses[..., 1] = rng.uniform(-30, 30, (sub, b, j))
    poses[..., 2] = rng.uniform(380, 420, (sub, b, j))
    coms = poses.mean(axis=2)
    dms = rng.uniform(350, 450, (sub, b, hw, hw, 1)).astype(np.float32)
    return {
        "dm": jnp.asarray(dms),
        "pose": jnp.asarray(poses.reshape(sub, b, -1)),
        "cfg": jnp.asarray(np.tile(cfg, (sub, b, 1)).astype(np.float32)),
        "com": jnp.asarray(coms),
    }


def micro_batch(batch, i):
    return jax.tree.map(lambda x: x[i], batch)


def test_loss_components_finite(rng):
    state = create_train_state(jax.random.key(0), NET, TCFG, 100.0)
    batch = make_batch(rng, 1, 2)
    loss, (stats, metrics) = loss_fn(
        state.params, state.batch_stats, state.apply_fn, micro_batch(batch, 0),
        net_cfg=NET, tcfg=TCFG, renorm_t=jnp.float32(0.0),
        dropout_rng=jax.random.key(1))
    assert np.isfinite(float(loss))
    for k in ("hm_loss", "hm3_loss", "um_loss", "reg_loss"):
        v = float(metrics[k])
        assert np.isfinite(v) and v >= 0.0
    assert float(metrics["reg_loss"]) > 0.0


def test_loss_type_l1_vs_l2(rng):
    """--loss_type selects the data-term loss from the slim loss vocabulary
    (densereg_tpu/train/losses.py): default l2 is tf.nn.l2_loss semantics
    (sum of squares / 2), l1 is sum(|x|); the regularizer term is
    unaffected."""
    import dataclasses

    state = create_train_state(jax.random.key(0), NET, TCFG, 100.0)
    batch = make_batch(rng, 1, 2)
    kw = dict(net_cfg=NET, renorm_t=jnp.float32(0.0),
              dropout_rng=jax.random.key(1))
    _, (_, m2) = loss_fn(state.params, state.batch_stats, state.apply_fn,
                         micro_batch(batch, 0), tcfg=TCFG, **kw)
    tcfg_l1 = dataclasses.replace(TCFG, loss_type="l1")
    _, (_, m1) = loss_fn(state.params, state.batch_stats, state.apply_fn,
                         micro_batch(batch, 0), tcfg=tcfg_l1, **kw)
    for k in ("hm_loss", "hm3_loss", "um_loss"):
        assert np.isfinite(float(m1[k])) and float(m1[k]) > 0.0
        assert not np.isclose(float(m1[k]), float(m2[k]))
    np.testing.assert_allclose(float(m1["reg_loss"]), float(m2["reg_loss"]))


def test_weight_decay_only_kernels():
    params = {
        "conv": {"kernel": jnp.ones((1, 1, 2, 2)), "bias": jnp.ones((2,)) * 100},
        "bn": {"beta": jnp.ones((2,)) * 100, "gamma": jnp.ones((2,)) * 100},
    }
    wd = float(weight_decay_loss(params, 0.0005))
    np.testing.assert_allclose(wd, 0.5 * 0.0005 * 4.0, rtol=1e-6)


def test_train_step_advances_state(rng):
    state = create_train_state(jax.random.key(0), NET, TCFG, 100.0)
    step_fn = make_train_step(NET, TCFG, donate=False)
    batch = make_batch(rng, TCFG.sub_batch, TCFG.batch_size)
    new_state, metrics = step_fn(state, batch, jax.random.key(1))
    assert int(new_state.step) == 1
    np.testing.assert_allclose(
        float(new_state.renorm_t), TCFG.sub_batch * NET.renorm_t_delta,
        rtol=1e-5)
    # params changed
    diff = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        state.params, new_state.params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0.0
    assert np.isfinite(float(metrics["loss"]))
    # clipped Adam with lr 1e-3: per-step param delta bounded by ~lr
    assert max(jax.tree_util.tree_leaves(diff)) < 2 * TCFG.init_lr + 1e-6


def test_overfit_tiny_batch(rng):
    """The correctness gate from SURVEY.md §7 step 5 in miniature: loss on a
    fixed batch must drop substantially after a few dozen steps."""
    tcfg = TrainConfig(batch_size=2, sub_batch=1, augment=False, init_lr=3e-3)
    state = create_train_state(jax.random.key(0), NET, tcfg, 1e6)
    step_fn = make_train_step(NET, tcfg, donate=False)
    batch = make_batch(rng, 1, 2)
    losses = []
    for i in range(30):
        state, metrics = step_fn(state, batch, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < 0.5 * losses[0], losses[::6]


def test_lr_schedule_staircase():
    from densereg_tpu.train.lr import staircase_exponential_decay
    sched = staircase_exponential_decay(1e-3, 100, 0.1)
    np.testing.assert_allclose(float(sched(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(99)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(250)), 1e-5, rtol=1e-5)


def test_weight_decay_excludes_inter_convs():
    """the reference's inter-stack re-injection convs carry no weight decay
    (/root/reference/network/um_v1.py:176-181)"""
    params = {
        "hm_head_s0": {"conv": {"kernel": jnp.ones((1, 1, 2, 2))}},
        "inter_out_s0": {"conv": {"kernel": jnp.ones((1, 1, 2, 2)) * 100}},
        "inter_ll_s0": {"conv": {"kernel": jnp.ones((1, 1, 2, 2)) * 100}},
    }
    wd = float(weight_decay_loss(params, 0.0005))
    np.testing.assert_allclose(wd, 0.5 * 0.0005 * 4.0, rtol=1e-6)


def test_remat_matches_no_remat(rng):
    """NetConfig.remat must change memory behavior only: identical loss and
    gradients (jax.checkpoint recomputes the forward on the backward)."""
    import dataclasses

    net_r = dataclasses.replace(NET, remat=True, dropout_rate=0.0)
    net_p = dataclasses.replace(NET, remat=False, dropout_rate=0.0)
    tcfg = TrainConfig(batch_size=2, sub_batch=1, augment=False)
    state = create_train_state(jax.random.key(0), net_p, tcfg, 100.0)
    batch = make_batch(rng, 1, 2)

    def vg(net):
        def f(p):
            loss, _ = loss_fn(p, state.batch_stats, state.apply_fn,
                              micro_batch(batch, 0), net_cfg=net, tcfg=tcfg,
                              renorm_t=jnp.float32(0.01),
                              dropout_rng=jax.random.key(1))
            return loss
        return jax.value_and_grad(f)(state.params)

    lp, gp = vg(net_p)
    lr_, gr = vg(net_r)
    np.testing.assert_allclose(float(lp), float(lr_), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_fused_dispatch_matches_two_dispatch(rng):
    """make_fused_train_step (raw frames -> preprocess -> scan step in ONE
    jitted program) is semantically identical to preprocess_batch_from_pose
    followed by the plain train step (VERDICT r2 item 5)."""
    from densereg_tpu.preprocess import preprocess_batch_from_pose
    from densereg_tpu.train import make_fused_train_step

    tcfg = TrainConfig(batch_size=2, sub_batch=2, augment=False)
    n = tcfg.batch_size * tcfg.sub_batch
    # raw uint16 full frames with the hand at a known depth
    frames = np.full((n, 240, 320, 1), 900, np.uint16)
    frames[:, 100:160, 130:200, 0] = 420
    poses = np.zeros((n, 3, 3), np.float32)
    poses[..., 0] = rng.uniform(-20, 20, (n, 3))
    poses[..., 1] = rng.uniform(-20, 20, (n, 3))
    poses[..., 2] = rng.uniform(400, 440, (n, 3))
    poses = poses.reshape(n, -1)
    cam = np.asarray(ICVL.as_array(), np.float32)

    # SGD instead of Adam: the fused program's different XLA fusion
    # boundaries give benign reduction-order float noise on near-zero
    # gradients, which Adam's first step would amplify to +-lr sign flips
    # (same rationale as tests/test_parallel.py)
    import optax

    state = create_train_state(jax.random.key(0), NET, tcfg, 100.0)
    tx = optax.sgd(1.0)
    state = state.replace(tx=tx, opt_state=tx.init(state.params))

    # reference path: two dispatches
    dm, pose, cfgs, coms = preprocess_batch_from_pose(
        jnp.asarray(frames), jnp.asarray(poses), jnp.asarray(cam), 32, 32)
    sub, b = tcfg.sub_batch, tcfg.batch_size
    batch = {"dm": dm.reshape(sub, b, 32, 32, 1),
             "pose": pose.reshape(sub, b, -1),
             "cfg": cfgs.reshape(sub, b, 6),
             "com": coms.reshape(sub, b, 3)}
    two = make_train_step(NET, tcfg, donate=False)
    s_two, m_two = two(state, batch, jax.random.key(7))

    fused = make_fused_train_step(NET, tcfg, cam, donate=False)
    s_f, m_f = fused(state, jnp.asarray(frames), jnp.asarray(poses),
                     jax.random.key(7))

    np.testing.assert_allclose(float(m_f["loss"]), float(m_two["loss"]),
                               rtol=1e-6)
    # params moved by the exact accumulated gradient -> norm-wise comparison
    # against the float32 reduction-order noise floor
    for (path, a), (_, b_) in zip(
            jax.tree_util.tree_leaves_with_path(s_two.params),
            jax.tree_util.tree_leaves_with_path(s_f.params)):
        a64 = np.asarray(a, np.float64)
        b64 = np.asarray(b_, np.float64)
        rel = np.linalg.norm(a64 - b64) / (np.linalg.norm(a64) + 1e-12)
        assert rel < 1e-4, (jax.tree_util.keystr(path), rel)
    for a, b_ in zip(jax.tree_util.tree_leaves(s_two.batch_stats),
                     jax.tree_util.tree_leaves(s_f.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-6)


def test_training_is_deterministic_given_seed():
    """Two independent runs of the same jitted step sequence (same seed,
    same batches, augmentation ON so the dropout/warp PRNG paths are
    included) produce bit-identical parameters — the reproducibility
    contract a production trainer owes its users (the reference makes no
    such guarantee: TF queue runners interleave nondeterministically)."""
    tcfg = TrainConfig(batch_size=2, sub_batch=2, augment=True)
    batch = make_batch(np.random.default_rng(11), tcfg.sub_batch,
                       tcfg.batch_size)
    step = make_train_step(NET, tcfg, donate=False)

    def run():
        state = create_train_state(jax.random.key(3), NET, tcfg, 100.0)
        for i in range(3):
            state, _ = step(state, batch, jax.random.key(100 + i))
        return state

    s1, s2 = run(), run()
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(s1.params),
            jax.tree_util.tree_leaves_with_path(s2.params)):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=jax.tree_util.keystr(path))
    for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                    jax.tree_util.tree_leaves(s2.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
