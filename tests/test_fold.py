"""Batch-norm folding: the fold_bn serving graph with folded params must
reproduce the eval-mode renorm graph exactly."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from densereg_tpu.config import NetConfig
from densereg_tpu.models import DenseRegNet, fold_batch_norm

CFG = NetConfig(num_stack=1, num_fea=8, num_joint=3, input_hw=(32, 32))


def _trained_like_variables(rng_key, x):
    """init then run one train-mode apply so moving stats differ from init"""
    net = DenseRegNet(CFG)
    variables = net.init({"params": rng_key}, x, train=False)
    _, mutated = net.apply(variables, x, train=True, mutable=["batch_stats"],
                           rngs={"dropout": jax.random.key(9)})
    return {"params": variables["params"],
            "batch_stats": mutated["batch_stats"]}


def test_folded_matches_eval(rng):
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 1)).astype(np.float32))
    variables = _trained_like_variables(jax.random.key(0), x)

    ref = DenseRegNet(CFG).apply(variables, x, train=False)

    folded_cfg = dataclasses.replace(CFG, fold_bn=True)
    folded_net = DenseRegNet(folded_cfg)
    folded_vars = fold_batch_norm(variables, eps=CFG.bn_epsilon)
    got = folded_net.apply(folded_vars, x, train=False)

    for key in ("hm", "hm3", "um"):
        np.testing.assert_allclose(np.asarray(got[key][-1]),
                                   np.asarray(ref[key][-1]),
                                   rtol=1e-4, atol=1e-5)


def test_folded_param_tree_matches_model(rng):
    x = jnp.zeros((1, 32, 32, 1))
    variables = _trained_like_variables(jax.random.key(0), x)
    folded_vars = fold_batch_norm(variables)

    folded_cfg = dataclasses.replace(CFG, fold_bn=True)
    expect = DenseRegNet(folded_cfg).init({"params": jax.random.key(1)}, x,
                                          train=False)
    got_paths = jax.tree_util.tree_structure(folded_vars["params"])
    exp_paths = jax.tree_util.tree_structure(expect["params"])
    assert got_paths == exp_paths
    assert "batch_stats" not in expect or not expect["batch_stats"]


def test_fold_lite_variant(rng):
    """depthwise kernels fold identically (per-out-channel scale broadcasts
    over the (k,k,1,c) layout)"""
    lite = dataclasses.replace(CFG, net_module="um_v1_lite")
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 1)).astype(np.float32))
    net = DenseRegNet(lite)
    variables = net.init({"params": jax.random.key(0)}, x, train=False)
    _, mutated = net.apply(variables, x, train=True, mutable=["batch_stats"],
                           rngs={"dropout": jax.random.key(9)})
    variables = {"params": variables["params"],
                 "batch_stats": mutated["batch_stats"]}
    ref = net.apply(variables, x, train=False)

    folded_cfg = dataclasses.replace(lite, fold_bn=True)
    folded = DenseRegNet(folded_cfg).apply(
        fold_batch_norm(variables, eps=lite.bn_epsilon), x, train=False)
    for key in ("hm", "hm3", "um"):
        np.testing.assert_allclose(np.asarray(folded[key][-1]),
                                   np.asarray(ref[key][-1]),
                                   rtol=1e-4, atol=1e-5)
