"""Migrate reference TF-1.x checkpoints into densereg_tpu parameter trees.

The reference distributes pretrained models as TF1 checkpoints
(exp/scripts/fetch_*_model.sh -> exp/train_cache/<name>/model.ckpt-*); its
variables are auto-named by creation order (`Conv`, `Conv_1`, ... at the root
scope plus `hg_imgproc/Conv_k` for the stem, each with a nested
`BatchReNorm/{beta,gamma,moving_mean,moving_variance,r_max,d_max,curr_t}`),
because `network/um_v1.py` never opens named scopes per layer.  Our flax
modules are created in the SAME order (the model definition follows the
reference's call sequence), so the mapping is: walk our module tree in
creation order <-> walk the TF variables in numeric-suffix order.

Usage:
    python -m densereg_tpu.convert \
        --ckpt exp/train_cache/icvl_..._um_v1/model.ckpt-219999 \
        --num_stack 2 --num_fea 128 --num_joint 16 \
        --out icvl_params.msgpack
    (``tools/convert_tf_checkpoint.py`` is a compatibility shim for the same
    CLI.)

The output is a flax-serialized {params, batch_stats, renorm_t} payload
loadable via ``load_converted`` below.  Requires tensorflow (for the
checkpoint reader) — only needed for this offline tool, never at runtime.
"""

from __future__ import annotations

import argparse
import re
from typing import Dict, List, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# creation-order walk of our model (must mirror DenseRegNet.__call__)
# ---------------------------------------------------------------------------

def residual_convs(name: str, num_in: int, num_out: int) -> List[Tuple[str, bool]]:
    """Conv sub-modules of a Residual in creation order: conv1/conv2/conv3
    (+ shortcut when channels change), all with renorm."""
    mods = [(f"{name}/conv1", True), (f"{name}/conv2", True),
            (f"{name}/conv3", True)]
    if num_in != num_out:
        mods.append((f"{name}/shortcut", True))
    return mods


def hourglass_convs(name: str, depth: int, fea: int) -> List[Tuple[str, bool]]:
    """upper -> lower_in -> inner... -> lower_out (um_v1.py:51-69)."""
    mods = residual_convs(f"{name}/upper", fea, fea)
    mods += residual_convs(f"{name}/lower_in", fea, fea)
    if depth > 1:
        mods += hourglass_convs(f"{name}/inner", depth - 1, fea)
    mods += residual_convs(f"{name}/lower_out", fea, fea)
    return mods


def model_conv_order(num_stack: int, num_fea: int, num_joint: int,
                     hg_depth: int = 4) -> List[Tuple[str, bool]]:
    """(our module path, has_renorm) for every conv, in creation order ==
    the reference's TF-variable numbering order."""
    mods: List[Tuple[str, bool]] = [("stem_conv", True)]
    mods += residual_convs("stem_res1", 32, 64)
    mods += residual_convs("stem_res2", 64, 64)
    mods += residual_convs("stem_res3", 64, num_fea)
    j = num_joint
    for i in range(num_stack):
        s = f"_s{i}"
        mods += hourglass_convs("hg" + s, hg_depth, num_fea)
        mods += residual_convs("ll_res" + s, num_fea, num_fea)
        mods += [("ll_conv" + s, True), ("hm_head" + s, False)]
        mods += residual_convs("hm3_res" + s, num_fea + 3, 128)
        mods += [("hm3_head" + s, False)]
        cat = num_fea + 2 * j
        mods += residual_convs("um_resA" + s, cat, 256)
        mods += residual_convs("um_resB" + s, 256, 256)
        mods += residual_convs("umm_resA" + s, cat, 256)
        mods += residual_convs("umm_resB" + s, 256, 256)
        mods += residual_convs("um_comb" + s, 512, 512)
        mods += [("um_fc1" + s, False), ("um_fc2" + s, False),
                 ("um_head" + s, False)]
        if i < num_stack - 1:
            mods += [("inter_out" + s, False), ("inter_ll" + s, False)]
    return mods


# ---------------------------------------------------------------------------
# TF checkpoint side
# ---------------------------------------------------------------------------

def tf_conv_scopes(var_names) -> List[str]:
    """Conv scopes of the reference graph sorted in creation order: the stem
    lives under hg_imgproc/ (created first), the rest at root; auto-suffix
    `_N` encodes creation order within each scope."""
    def order_key(scope):
        m = re.match(r"(.*?)Conv(?:_(\d+))?$", scope)
        idx = int(m.group(2)) if m.group(2) else 0
        return idx

    scopes = sorted({m.group(1) for name in var_names
                     for m in [re.match(r"((?:hg_imgproc/)?Conv(?:_\d+)?)/",
                                        name)] if m})
    stem = sorted([s for s in scopes if s.startswith("hg_imgproc/")],
                  key=order_key)
    root = sorted([s for s in scopes if not s.startswith("hg_imgproc/")],
                  key=order_key)
    return stem + root


def convert(ckpt_path: str, num_stack: int, num_fea: int, num_joint: int,
            hg_depth: int = 4):
    import tensorflow as tf

    reader = tf.train.load_checkpoint(ckpt_path)
    shape_map = reader.get_variable_to_shape_map()
    names = list(shape_map)

    order = model_conv_order(num_stack, num_fea, num_joint, hg_depth)
    scopes = tf_conv_scopes(names)
    if len(scopes) != len(order):
        raise ValueError(
            f"checkpoint has {len(scopes)} conv scopes but the model "
            f"expects {len(order)} — wrong --num_stack/--num_fea/--num_joint?")

    params: Dict = {}
    batch_stats: Dict = {}
    renorm_t = 0.0

    def put(tree, path, leaf):
        node = tree
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = leaf

    for (module, has_bn), scope in zip(order, scopes):
        mpath = module.split("/")
        w = reader.get_tensor(scope + "/weights")
        put(params, mpath + ["conv", "kernel"], np.asarray(w, np.float32))
        if has_bn:
            bn = scope + "/BatchReNorm/"
            put(params, mpath + ["bn", "beta"],
                np.asarray(reader.get_tensor(bn + "beta"), np.float32))
            gname = bn + "gamma"
            gamma = (np.asarray(reader.get_tensor(gname), np.float32)
                     if gname in shape_map
                     else np.ones(w.shape[-1], np.float32))
            put(params, mpath + ["bn", "gamma"], gamma)
            put(batch_stats, mpath + ["bn", "mean"],
                np.asarray(reader.get_tensor(bn + "moving_mean"), np.float32))
            put(batch_stats, mpath + ["bn", "var"],
                np.asarray(reader.get_tensor(bn + "moving_variance"),
                           np.float32))
            tname = bn + "curr_t"
            if tname in shape_map:
                renorm_t = float(np.asarray(reader.get_tensor(tname))
                                 .reshape(-1)[0])
        else:
            put(params, mpath + ["conv", "bias"],
                np.asarray(reader.get_tensor(scope + "/biases"), np.float32))

    return {"params": params, "batch_stats": batch_stats,
            "renorm_t": renorm_t}


def save_converted(payload, out_path: str) -> None:
    from flax import serialization

    with open(out_path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


def load_converted(path: str):
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--num_stack", type=int, default=2)
    ap.add_argument("--num_fea", type=int, default=128)
    ap.add_argument("--num_joint", type=int, default=16)
    ap.add_argument("--hg_depth", type=int, default=4,
                    help="hourglass depth (4 for the 128x128 flagship)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    payload = convert(args.ckpt, args.num_stack, args.num_fea, args.num_joint,
                      args.hg_depth)
    save_converted(payload, args.out)
    n = sum(x.size for x in
            __import__("jax").tree_util.tree_leaves(payload["params"]))
    print(f"converted {n} parameters -> {args.out}")


if __name__ == "__main__":
    main()
