"""Multi-device tests on the 8-device virtual CPU mesh: the sharded train
step must compile, execute, and produce results identical to the single-device
run on the same global batch (the parity gate from SURVEY.md §4/§7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from densereg_tpu.config import NetConfig, TrainConfig
from densereg_tpu.parallel import make_mesh, shard_batch
from densereg_tpu.train import create_train_state, make_train_step
from tests.test_train import make_batch

NET = NetConfig(num_stack=1, num_fea=8, num_joint=3, input_hw=(32, 32))
TCFG = TrainConfig(batch_size=8, sub_batch=2, augment=False)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_step_matches_single_device(rng):
    """Same global batch on 1 device vs the 8-device mesh must produce the
    same loss, gradients and moving statistics.  The optimizer for this test
    is plain SGD: Adam's first step amplifies the SIGN of near-zero
    gradients to +-lr, so benign reduction-order float noise on a ~1e-9
    gradient element would show up as a 2*lr param difference."""
    import optax

    state = create_train_state(jax.random.key(0), NET, TCFG, 100.0)
    tx = optax.sgd(1.0)  # params -= accumulated-mean grad, exactly
    state = state.replace(tx=tx, opt_state=tx.init(state.params))
    batch = make_batch(rng, TCFG.sub_batch, TCFG.batch_size)

    single = make_train_step(NET, TCFG, donate=False)
    s1, m1 = single(state, batch, jax.random.key(7))

    mesh = make_mesh()
    sharded = make_train_step(NET, TCFG, mesh=mesh, donate=False)
    dbatch = shard_batch(batch, mesh, batch_dim=1)
    s8, m8 = sharded(state, dbatch, jax.random.key(7))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=2e-4)
    # params moved by the (accumulated, averaged) gradient -> comparing them
    # compares the gradients themselves.  Tolerance calibration (measured on
    # this exact setup): recompiling the same program on the same device
    # gives rel-norm diff == 0.0; PERMUTING the batch on one device gives up
    # to ~6e-3 (float32 reduction-order noise through the batch-norm
    # backward); the 8-device run sits at ~1.4e-2 — the same noise floor.  A
    # semantic bug (missing gradient psum, desynced replicas) shifts whole
    # tensors by O(1).  5e-2 cleanly separates the two regimes.
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(s1.params),
            jax.tree_util.tree_leaves_with_path(s8.params)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = np.linalg.norm(a) + 1e-12
        rel = np.linalg.norm(a - b) / denom
        assert rel < 5e-2, (jax.tree_util.keystr(path), rel)
    # batch stats must also agree (synchronized BN moments)
    for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                    jax.tree_util.tree_leaves(s8.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


def test_multislice_mesh_matches_single_device(rng):
    """The multi-slice story (docs/SCALING.md): a 2-D ``(replica, data)``
    mesh — DCN across slices x ICI within a slice — runs the SAME GSPMD
    train step with the batch split over both axes, and must agree with the
    single-device run to the same noise floor as the 1-D mesh (VERDICT r1
    next-round #8)."""
    import optax

    state = create_train_state(jax.random.key(0), NET, TCFG, 100.0)
    tx = optax.sgd(1.0)
    state = state.replace(tx=tx, opt_state=tx.init(state.params))
    batch = make_batch(rng, TCFG.sub_batch, TCFG.batch_size)

    single = make_train_step(NET, TCFG, donate=False)
    s1, m1 = single(state, batch, jax.random.key(7))

    mesh = make_mesh((2, 4), ("replica", "data"))
    assert mesh.shape == {"replica": 2, "data": 4}
    sharded = make_train_step(NET, TCFG, mesh=mesh, donate=False)
    dbatch = shard_batch(batch, mesh, batch_dim=1)   # split over BOTH axes
    shapes = {s.data.shape for s in dbatch["dm"].addressable_shards}
    assert shapes == {(TCFG.sub_batch, 1, 32, 32, 1)}
    s8, m8 = sharded(state, dbatch, jax.random.key(7))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=2e-4)
    # same tolerance rationale as test_sharded_step_matches_single_device
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(s1.params),
            jax.tree_util.tree_leaves_with_path(s8.params)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12)
        assert rel < 5e-2, (jax.tree_util.keystr(path), rel)
    for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                    jax.tree_util.tree_leaves(s8.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


def test_explicit_path_rejects_multiaxis_mesh():
    mesh = make_mesh((2, 4), ("replica", "data"))
    with pytest.raises(ValueError, match="explicit shard_map"):
        make_train_step(NET, TCFG, mesh=mesh, explicit=True)


def test_batch_sharding_layout(rng):
    mesh = make_mesh()
    batch = make_batch(rng, 2, 8)
    sharded = shard_batch(batch, mesh, batch_dim=1)
    shard_shapes = {s.data.shape for s in sharded["dm"].addressable_shards}
    assert shard_shapes == {(2, 1, 32, 32, 1)}


def test_shard_map_explicit_matches_single_device(rng):
    """The explicit shard_map formulation (lax.psum gradients + pmean BN
    moments via axis_name) must agree with the single-device step — the same
    contract as the GSPMD test above.  Dropout is disabled: shard_map draws
    each device's mask from the same key over local shapes, which is
    statistically equivalent but not bit-identical to the global draw."""
    import dataclasses

    import optax

    net = dataclasses.replace(NET, dropout_rate=0.0)
    tcfg = TrainConfig(batch_size=8, sub_batch=2, augment=False)
    state = create_train_state(jax.random.key(0), net, tcfg, 100.0)
    tx = optax.sgd(1.0)
    state = state.replace(tx=tx, opt_state=tx.init(state.params))
    batch = make_batch(rng, tcfg.sub_batch, tcfg.batch_size)

    single = make_train_step(net, tcfg, donate=False)
    s1, m1 = single(state, batch, jax.random.key(7))

    mesh = make_mesh()
    # the explicit path needs the model built with the mesh axis name so
    # batch-norm moments pmean inside shard_map
    state_x = create_train_state(jax.random.key(0), net, tcfg, 100.0,
                                 axis_name=tcfg.data_axis)
    state_x = state_x.replace(tx=tx, opt_state=tx.init(state_x.params))
    explicit = make_train_step(net, tcfg, mesh=mesh, donate=False,
                               explicit=True)
    dbatch = shard_batch(batch, mesh, batch_dim=1)
    s8, m8 = explicit(state_x, dbatch, jax.random.key(7))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=2e-4)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(s1.params),
            jax.tree_util.tree_leaves_with_path(s8.params)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12)
        assert rel < 5e-2, (jax.tree_util.keystr(path), rel)
    for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                    jax.tree_util.tree_leaves(s8.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)
