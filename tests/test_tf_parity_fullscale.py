"""Full-scale TF1 forward-parity harness (VERDICT r2 item 1).

The strongest offline proxy for mm-level parity with the released models
(the real datasets/weights are license-gated and this image has no egress):
emulate the COMPLETE production reference graph — stack=2, fea=128, J=16,
128x128 input, hourglass depth 4, i.e. the `icvl_training_s2_f128_daug_
um_v1` topology (/root/reference/network/um_v1.py:84-183; depth rule
:99-107) — as a genuine ``tf.compat.v1`` checkpoint with the reference's
creation-order variable names, convert it with ``densereg_tpu.convert``,
run ``DenseRegNet``, and pin all three head outputs of BOTH stacks against
an independent float64 numpy evaluation of the same checkpoint.

A failure here means some layer wiring, resize method, concat order, mask
threshold, or eval-mode renorm detail diverges from the reference at
production scale — exactly the class of bug the unverifiable golden dumps
would have caught.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from densereg_tpu.config import NetConfig
from densereg_tpu.convert import convert

from tests.ref_tf_graph import GraphSpec, RefGraphEmulator, np_forward

# the released-model configuration: readme.md:19,36-38 (s2 f128),
# data/icvl.py:16 (J=16), hourglass_um_crop_tiny.py:82-87 (128 -> 32),
# um_v1.py:99-107 (input 128 -> hourglass depth 4)
SPEC = GraphSpec(j=16, fea=128, stack=2, k=3, in_hw=128, hg_depth=4)


@pytest.mark.slow
def test_fullscale_s2_f128_forward_parity(tmp_path, rng):
    em = RefGraphEmulator(rng, SPEC, tf)
    graph = tf.Graph()
    with graph.as_default():
        em.build()
        saver = tf.compat.v1.train.Saver()
        with tf.compat.v1.Session() as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            ckpt = saver.save(sess, str(tmp_path / "model.ckpt"),
                              global_step=219999)

    # the production s2/f128 graph has 146 conv layers (the same count the
    # converter-walk test pins): stem 12 + 66 per stack + 2 re-injection
    assert len(em.layers) == 146

    payload = convert(ckpt, num_stack=SPEC.stack, num_fea=SPEC.fea,
                      num_joint=SPEC.j, hg_depth=SPEC.hg_depth)

    import jax

    from densereg_tpu.models import DenseRegNet

    cfg = NetConfig(num_stack=SPEC.stack, num_fea=SPEC.fea,
                    num_joint=SPEC.j, input_hw=(SPEC.in_hw, SPEC.in_hw),
                    compute_dtype="float32")
    net = DenseRegNet(cfg)
    dms = rng.uniform(-1, 1, (1, SPEC.in_hw, SPEC.in_hw, 1)).astype(
        np.float32)
    dms[0, :40, :40] = -1.0   # exercise the tiny_dm < -0.9 masked branch

    outs = net.apply({"params": payload["params"],
                      "batch_stats": payload["batch_stats"]},
                     jax.numpy.asarray(dms), train=False)

    # float64 oracle: its own rounding error is negligible, so the
    # tolerance below measures OUR forward's deviation from the reference
    # graph semantics, not oracle noise
    expect = np_forward(em.layers, dms, SPEC, dtype=np.float64)

    for key in ("hm", "hm3", "um"):
        for s in range(SPEC.stack):
            got = np.asarray(outs[key][s], np.float64)
            want = expect[key][s]
            scale = max(np.abs(want).max(), 1.0)
            err = np.abs(got - want).max() / scale
            assert err <= 1e-4, (
                f"{key} stack {s}: max relative error {err:.2e} > 1e-4 "
                f"(output scale {scale:.3g})")
