"""Subprocess worker: run the ACTUAL reference ``detect_net`` as an oracle.

ADVICE r3 #4: the full-scale parity test pins DenseRegNet against
``tests/ref_tf_graph.np_forward`` — a numpy re-reading of the reference
written in this repo, so a shared misreading of um_v1.py would pass on both
sides.  This worker instead imports the reference's own graph code
(/root/reference/network/um_v1.py + its vendored slim fork) under
``tf.compat.v1``, builds ``detect_net`` with randomly initialized variables,
runs one forward pass, and saves BOTH the checkpoint and the head outputs.
The parent test converts that checkpoint with ``densereg_tpu.convert`` and
compares our forward against the reference graph's own numbers.

Runs in a subprocess because ``tf.compat.v1.disable_v2_behavior()`` is
global and irreversible (it would poison every other test in the pytest
process).  Prints ``IMPORT_FAILED: <reason>`` (rc=3) when the reference
code cannot run under this TF build — the parent skips in that case.

No reference code is copied here: the reference modules are imported from
/root/reference read-only and executed as-is.
"""

import os
import sys
import types

import numpy as np


def main() -> int:
    outdir = sys.argv[1]
    stack, fea, j, k, in_hw = (int(a) for a in sys.argv[2:7])

    sys.path.insert(0, "/root/reference")
    # the reference's env shim (gpu_config.py) parses an SGE lock file and
    # mutates CUDA env vars at import; stub it out (we run CPU TF anyway)
    stub = types.ModuleType("gpu_config")
    stub.gpu_list = []
    stub.num_gpus = 0
    sys.modules["gpu_config"] = stub

    try:
        import tensorflow as tf_real
        # cache the real submodules BEFORE aliasing sys.modules["tensorflow"]
        # so the reference's `from tensorflow.python.training import
        # moving_averages` resolves from sys.modules, not our alias
        from tensorflow.python.training import moving_averages  # noqa: F401

        tf1 = tf_real.compat.v1
        # the reference reads TensorShape dims as `.value` (TF1 style) and
        # builds graph-mode sessions
        tf1.disable_v2_behavior()
        sys.modules["tensorflow"] = tf1

        from network import um_v1  # the reference's own network code
    except Exception as e:  # pragma: no cover - depends on the TF build
        print(f"IMPORT_FAILED: {e!r}")
        return 3

    flags = tf1.app.flags
    flags.DEFINE_integer("num_fea", fea, "")
    flags.DEFINE_integer("num_stack", stack, "")
    flags.DEFINE_integer("kernel_size", k, "")
    flags.FLAGS.mark_as_parsed()

    graph = tf1.Graph()
    with graph.as_default():
        tf1.set_random_seed(20260818)
        dms = tf1.placeholder(tf1.float32, (None, in_hw, in_hw, 1))
        end_points = um_v1.detect_net(dms, None, None, j, is_training=False)
        saver = tf1.train.Saver()
        with tf1.Session() as sess:
            sess.run(tf1.global_variables_initializer())
            rng = np.random.default_rng(7)
            x = rng.uniform(-1.0, 1.0, (2, in_hw, in_hw, 1)).astype(np.float32)
            x[0, : in_hw // 3, : in_hw // 3] = -1.0  # tiny_dm < -0.9 branch
            outs = sess.run(
                {
                    "hm": end_points["hm_outs"],
                    "hm3": end_points["hm3_outs"],
                    "um": end_points["um_outs"],
                },
                {dms: x},
            )
            n_convs = len([v for v in tf1.global_variables()
                           if v.op.name.endswith("/weights")])
            ckpt = saver.save(sess, os.path.join(outdir, "model.ckpt"),
                              global_step=1)

    payload = {"input": x, "n_convs": np.int64(n_convs)}
    for key, vals in outs.items():
        for s, arr in enumerate(vals):
            payload[f"{key}_{s}"] = arr
    np.savez(os.path.join(outdir, "oracle.npz"), **payload)
    print(f"ORACLE_OK {ckpt} n_convs={n_convs}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
