"""The TF-checkpoint migration tool's creation-order walk must exactly match
the real model's parameter tree (every conv covered, has_renorm flags right).
Actual TF-name fidelity can only be validated against a real reference
checkpoint (license-gated download); this pins our side of the mapping."""

import jax
import jax.numpy as jnp

from densereg_tpu.config import NetConfig
from densereg_tpu.convert import model_conv_order
from densereg_tpu.models import DenseRegNet


def _paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def test_conv_order_covers_model_params():
    cfg = NetConfig(num_stack=2, num_fea=16, num_joint=4, input_hw=(32, 32))
    net = DenseRegNet(cfg)
    variables = net.init({"params": jax.random.key(0)},
                         jnp.zeros((1, 32, 32, 1)), train=False)
    params = jax.tree_util.tree_map(lambda x: x, variables["params"])

    order = model_conv_order(cfg.num_stack, cfg.num_fea, cfg.num_joint,
                             hg_depth=cfg.hourglass_depth)

    expected = {}
    for module, has_bn in order:
        path = tuple(module.split("/"))
        expected[path + ("conv", "kernel")] = True
        if has_bn:
            expected[path + ("bn", "beta")] = True
            expected[path + ("bn", "gamma")] = True
        else:
            expected[path + ("conv", "bias")] = True

    actual = _paths(params)
    missing = set(actual) - set(expected)
    extra = set(expected) - set(actual)
    assert not missing, f"converter misses model params: {sorted(missing)[:5]}"
    assert not extra, f"converter expects nonexistent params: {sorted(extra)[:5]}"

    # batch_stats coverage: every renorm conv has mean/var
    stats = _paths(variables["batch_stats"])
    bn_mods = {tuple(m.split("/")) for m, has in order if has}
    assert {p[:-2] for p in stats} == bn_mods


def test_conv_order_flagship_count():
    # flagship s2/f128/J16: 146 convs (stem 12 + 2 stacks x 66 + 1 set of
    # inter-stack convs); pinned to catch silent drift between the model
    # definition and the converter walk
    order = model_conv_order(2, 128, 16, hg_depth=4)
    assert len(order) == 146, len(order)
    # stem first, in hg_imgproc creation order
    assert order[0] == ("stem_conv", True)
    assert order[-1][0] == "um_head_s1"
