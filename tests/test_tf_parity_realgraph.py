"""Forward parity against the reference's OWN graph code (ADVICE r3 #4).

``tests/test_tf_parity_fullscale.py`` pins DenseRegNet against
``tests/ref_tf_graph.np_forward`` — a numpy re-reading of um_v1.py written
in this repo, so a shared misreading would pass on both sides (exactly what
happened with ``resize_images(..., 2)``: both sides implemented AREA until
this harness caught that TF1's method 2 is BICUBIC == exact subsample at
integer ratios).  Here the oracle is the reference itself:
``tests/real_tf_oracle_worker.py`` imports /root/reference/network/um_v1.py
(and its vendored slim fork) under ``tf.compat.v1`` in a subprocess, builds
``detect_net`` with random init, saves a checkpoint plus the head outputs;
we convert that checkpoint with ``densereg_tpu.convert`` and compare our
``DenseRegNet`` forward element-for-element.

Config: s2/f64/J16/in128 (hourglass depth 4) — identical TOPOLOGY to the
released s2/f128 models (/root/reference/network/um_v1.py:84-183) at half
the width so the 1-core oracle pass stays fast.  fea=64 also exercises the
equal-channel shortcut ELISION in the stem (`_residual(conv_3, num_fea)`
with 64 -> 64 creates no projection conv, um_v1.py:44-48): the real graph
has 145 conv layers here vs 146 at f128, so the converter walk is checked
against a variable set the emulator-based tests never produce.

Observed max relative error after the method-2 fix: 1.4e-9 (float32 both
sides); the 1e-6 gate below is pure headroom for BLAS reassociation.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

pytest.importorskip("tensorflow")

WORKER = os.path.join(os.path.dirname(__file__), "real_tf_oracle_worker.py")

# Second spec: 256-input — the reference's own depth rule (um_v1.py:99-107)
# builds a depth-5 hourglass there, so the REAL graph pins our
# NetConfig.hourglass_depth + converter walk at depth 5 (VERDICT r3 item 8;
# only shape tests exercised that rule before).  n_convs expected: the
# depth-5 s1 topology with the f32-elided stem shortcut.
SPECS = {
    "s2_f64_in128": dict(stack=2, fea=64, j=16, k=3, in_hw=128, hg_depth=4,
                         n_convs=145),
    "s1_f32_in256": dict(stack=1, fea=32, j=16, k=3, in_hw=256, hg_depth=5,
                         n_convs=None),
    # 512-input: the last rung of the reference's depth rule (512 -> 6,
    # um_v1.py:99-107) — exercised nowhere else (VERDICT r4 #5).  fea=16
    # keeps the 1-core oracle pass tractable (the um head's fixed 256/512
    # widths at 128x128 output spatial dominate regardless of fea).
    "s1_f16_in512": dict(stack=1, fea=16, j=16, k=3, in_hw=512, hg_depth=6,
                         n_convs=None),
}


@pytest.mark.slow
@pytest.mark.parametrize("spec_name", list(SPECS), ids=list(SPECS))
def test_realgraph_forward_parity(tmp_path, spec_name):
    SPEC = SPECS[spec_name]
    proc = subprocess.run(
        [sys.executable, WORKER, str(tmp_path)]
        + [str(SPEC[key]) for key in ("stack", "fea", "j", "k", "in_hw")],
        capture_output=True, text=True, timeout=540,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if proc.returncode == 3 or "IMPORT_FAILED" in proc.stdout:
        pytest.skip(f"reference graph not runnable under this TF build: "
                    f"{proc.stdout.strip().splitlines()[-1:]}" )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ORACLE_OK" in proc.stdout, proc.stdout[-2000:]

    d = np.load(tmp_path / "oracle.npz")

    import jax

    from densereg_tpu.config import NetConfig
    from densereg_tpu.convert import convert
    from densereg_tpu.models import DenseRegNet

    payload = convert(str(tmp_path / "model.ckpt-1"), num_stack=SPEC["stack"],
                      num_fea=SPEC["fea"], num_joint=SPEC["j"],
                      hg_depth=SPEC["hg_depth"])

    # the converter's creation-order walk consumed every conv the REAL graph
    # created (at 128: depth-4 s2 topology with one elided stem shortcut)
    kernels = [p for p in jax.tree_util.tree_leaves_with_path(
                   payload["params"])
               if p[0][-1].key == "kernel"]
    assert len(kernels) == int(d["n_convs"])
    if SPEC["n_convs"] is not None:
        assert len(kernels) == SPEC["n_convs"]

    cfg = NetConfig(num_stack=SPEC["stack"], num_fea=SPEC["fea"],
                    num_joint=SPEC["j"],
                    input_hw=(SPEC["in_hw"], SPEC["in_hw"]),
                    compute_dtype="float32")
    assert cfg.hourglass_depth == SPEC["hg_depth"]
    outs = DenseRegNet(cfg).apply(
        {"params": payload["params"], "batch_stats": payload["batch_stats"]},
        jax.numpy.asarray(d["input"]), train=False)

    for key in ("hm", "hm3", "um"):
        for s in range(SPEC["stack"]):
            got = np.asarray(outs[key][s], np.float64)
            want = d[f"{key}_{s}"].astype(np.float64)
            scale = max(np.abs(want).max(), 1.0)
            err = np.abs(got - want).max() / scale
            assert err <= 1e-6, (
                f"{key} stack {s}: max relative error {err:.2e} vs the "
                f"reference's own detect_net (scale {scale:.3g})")
