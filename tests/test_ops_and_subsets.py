"""Coverage for the slim-parity op vocabulary (models/ops.py) and the
dataset subset/shard-list logic that needs no data on disk."""

import jax
import jax.numpy as jnp
import numpy as np

from densereg_tpu.models import ops as slim_ops


def test_fc_deconv_depthwise_run(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))

    fc = slim_ops.Fc(16)
    v = fc.init(jax.random.key(0), x.reshape(2, -1))
    y = fc.apply(v, x.reshape(2, -1))
    assert y.shape == (2, 16) and float(jnp.min(y)) >= 0.0  # relu

    dc = slim_ops.Deconv(6, stride=2)
    v = dc.init(jax.random.key(0), x)
    y = dc.apply(v, x)
    assert y.shape == (2, 16, 16, 6)

    dw = slim_ops.DepthwiseConv(channel_multiplier=2)
    v = dw.init(jax.random.key(0), x)
    y = dw.apply(v, x)
    assert y.shape == (2, 8, 8, 8)
    # depthwise kernel: (k, k, 1, in*mult)
    assert v["params"]["Conv_0"]["kernel"].shape[2] == 1


def test_stateless_ops(rng):
    x = jnp.asarray(rng.normal(size=(2, 9, 9, 3)).astype(np.float32))
    assert slim_ops.max_pool(x, 2, 2).shape == (2, 5, 5, 3)
    ap = slim_ops.avg_pool(jnp.ones((1, 4, 4, 1)), 2, 2)
    np.testing.assert_allclose(np.asarray(ap), 1.0)  # count-corrected mean
    up = slim_ops.upsampling_nearest(x, 2)
    assert up.shape == (2, 18, 18, 3)
    assert slim_ops.flatten(x).shape == (2, 243)
    oh = slim_ops.one_hot_encoding(jnp.asarray([1, 2]), 4)
    np.testing.assert_allclose(np.asarray(oh).sum(-1), 1.0)
    rep = slim_ops.repeat_op(3, jnp.asarray(1.0), lambda v: v * 2)
    assert float(rep) == 8.0

    key = jax.random.key(0)
    dropped = slim_ops.dropout(jnp.ones((1000,)), key, rate=0.5)
    kept = float(jnp.mean(dropped > 0))
    assert 0.4 < kept < 0.6
    np.testing.assert_allclose(
        np.asarray(slim_ops.dropout(x, key, deterministic=True)),
        np.asarray(x))


def test_losses_vocabulary(rng):
    from densereg_tpu.train import losses

    x = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))
    np.testing.assert_allclose(float(losses.l2_loss(x)),
                               0.5 * float(jnp.sum(x * x)), rtol=1e-6)
    np.testing.assert_allclose(float(losses.l1_loss(x, 2.0)),
                               2.0 * float(jnp.sum(jnp.abs(x))), rtol=1e-6)
    np.testing.assert_allclose(float(losses.l1_l2_regularizer(1.0, 1.0)(x)),
                               float(losses.l1_loss(x) + losses.l2_loss(x)),
                               rtol=1e-6)
    logits = jnp.asarray([[10.0, 0.0, 0.0]])
    onehot = jnp.asarray([[1.0, 0.0, 0.0]])
    ce = float(losses.cross_entropy_loss(logits, onehot))
    assert ce < 0.01
    ce_s = float(losses.cross_entropy_loss(logits, onehot,
                                           label_smoothing=0.1))
    assert ce_s > ce  # smoothing penalizes confident predictions


def test_icvl_subset_strides():
    """training dups the last shard; training_small takes every 10th of the
    first 10; validation every 21st (/root/reference/data/icvl.py:53-74)"""
    from densereg_tpu.data.icvl import _shard_paths

    tr = _shard_paths("/d", "training")
    assert len(tr) == 101 and tr[-1] == tr[-2]
    small = _shard_paths("/d", "training_small")
    assert len(small) == 1 and "training-0-of-100" in small[0]
    val = _shard_paths("/d", "validation")
    assert len(val) == 1
    te = _shard_paths("/d", "testing")
    assert len(te) == 5 and te[-1] == te[-2]


def test_msra_leave_one_out_lists():
    """training must reference every OTHER subject's shards — the reference
    has a latent bug here (re-uses the held-out pid in every filename,
    data/msra.py:55); DEVIATIONS.md #3"""
    from densereg_tpu.data.msra import _shard_paths

    tr = _shard_paths("/d", "training", pid=3)
    assert len(tr) == 8 * 100 + 1
    assert not any("/P3-" in f for f in tr)
    for p in (0, 1, 2, 4, 5, 6, 7, 8):
        assert sum(f"/P{p}-" in f for f in tr[:-1]) == 100
    te = _shard_paths("/d", "testing", pid=3)
    assert all("/P3-" in f for f in te)


def test_nyu_subset_lists():
    from densereg_tpu.data.nyu import _shard_paths

    tr = _shard_paths("/d", "training")
    assert len(tr) == 101 and "training-0-of-300" in tr[0]
    te = _shard_paths("/d", "testing")
    assert len(te) == 17
