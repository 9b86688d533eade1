"""End-to-end validation of the TF-checkpoint migration on a REAL checkpoint.

Round 1 only pinned the converter's creation-order walk against our own
module tree; this writes a genuine ``tf.compat.v1`` checkpoint whose
variables are created in the REFERENCE graph's creation order with the
reference's auto-generated names (tests/ref_tf_graph.py documents the
scheme — /root/reference/network/um_v1.py:18-185, /root/reference/network/
slim/ops.py:85-185,266-299), converts it with ``densereg_tpu.convert``,
loads the result into ``DenseRegNet``, and asserts forward parity against
an INDEPENDENT numpy evaluation that consumes the checkpoint's raw values
in creation order.  If the converter mapped any module to the wrong TF
scope, the two forwards diverge (same-shape mix-ups included: the weights
are random, so any permutation changes the output).

Toy scale (J=3, fea=8, 32x32) for speed; the full s2/f128 topology gets
the same treatment in test_tf_parity_fullscale.py.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from densereg_tpu.config import NetConfig
from densereg_tpu.convert import convert, load_converted, save_converted

from tests.ref_tf_graph import GraphSpec, RefGraphEmulator, np_forward

SPEC = GraphSpec(j=3, fea=8, stack=2, k=3, in_hw=32, hg_depth=2)


@pytest.mark.slow
def test_real_tf_checkpoint_roundtrip(tmp_path, rng):
    em = RefGraphEmulator(rng, SPEC, tf)
    graph = tf.Graph()
    with graph.as_default():
        em.build()
        saver = tf.compat.v1.train.Saver()
        with tf.compat.v1.Session() as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            ckpt = saver.save(sess, str(tmp_path / "model.ckpt"),
                              global_step=219999)

    payload = convert(ckpt, num_stack=SPEC.stack, num_fea=SPEC.fea,
                      num_joint=SPEC.j, hg_depth=SPEC.hg_depth)
    assert payload["renorm_t"] == pytest.approx(SPEC.curr_t)

    # msgpack round trip (what serving.Predictor.from_converted reads)
    save_converted(payload, str(tmp_path / "params.msgpack"))
    payload = load_converted(str(tmp_path / "params.msgpack"))

    # spot-check leaf placement at both ends of the walk
    np.testing.assert_array_equal(
        payload["params"]["stem_conv"]["conv"]["kernel"], em.layers[0]["w"])
    np.testing.assert_array_equal(
        payload["params"]["um_head_s1"]["conv"]["kernel"],
        em.layers[-1]["w"])

    # forward parity: converted flax model vs the independent numpy oracle
    import jax

    from densereg_tpu.models import DenseRegNet

    cfg = NetConfig(num_stack=SPEC.stack, num_fea=SPEC.fea, num_joint=SPEC.j,
                    input_hw=(SPEC.in_hw, SPEC.in_hw),
                    compute_dtype="float32")
    net = DenseRegNet(cfg)
    dms = rng.uniform(-1, 1, (2, SPEC.in_hw, SPEC.in_hw, 1)).astype(
        np.float32)
    dms[0, :8, :8] = -1.0  # exercise the depth-mask branch

    ref_init = net.init({"params": jax.random.key(0)}, dms, train=False)
    # the converted tree must be structurally identical to a fresh init
    assert (jax.tree_util.tree_structure(
        jax.tree_util.tree_map(np.shape, payload["params"]))
        == jax.tree_util.tree_structure(
            jax.tree_util.tree_map(np.shape, ref_init["params"])))

    outs = net.apply({"params": payload["params"],
                      "batch_stats": payload["batch_stats"]},
                     dms, train=False)
    expect = np_forward(em.layers, dms, SPEC)
    for key in ("hm", "hm3", "um"):
        for s in range(SPEC.stack):
            np.testing.assert_allclose(
                np.asarray(outs[key][s]), expect[key][s],
                rtol=2e-3, atol=2e-3,
                err_msg=f"{key} stack {s}")
