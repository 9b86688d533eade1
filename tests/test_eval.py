import os

import numpy as np

from densereg_tpu.eval import (
    ResultWriter,
    max_joint_error,
    mean_joint_error,
    summarize_percentages,
    threshold_curve,
    write_error_curve,
)
from densereg_tpu.eval.writer import read_result_file


def test_max_mean_joint_error():
    a = np.zeros((2, 6), np.float32)
    b = np.zeros((2, 6), np.float32)
    b[0, 0] = 3.0  # joint0 err 3
    b[0, 4] = 4.0  # joint1 err 4
    me = np.asarray(max_joint_error(a, b))
    np.testing.assert_allclose(me, [4.0, 0.0])
    np.testing.assert_allclose(np.asarray(mean_joint_error(a, b)), [3.5, 0.0])


def test_threshold_curve_and_percentages():
    scores = [5.0, 15.0, 25.0, 100.0]
    t, f = threshold_curve(scores)
    assert t[0] == 0.5 and t[-1] == 80.5 and len(t) == 17
    np.testing.assert_allclose(f[2], 0.25)  # tau=10.5: only 5.0
    p = summarize_percentages(scores)
    np.testing.assert_allclose(p["10mm"], 0.25)
    np.testing.assert_allclose(p["40mm"], 0.75)


def test_result_writer_reference_format(tmp_path):
    """Line format must match the golden dumps
    (/root/reference/exp/result/icvl.txt): name TAB tab-separated %.4f, with
    '/' mangled to '\\'."""
    p = str(tmp_path / "res.txt")
    with ResultWriter(p) as w:
        w.write("test_seq_1/image_0000.png", np.array([1.0, -2.25, 3.33333]))
    line = open(p).read()
    assert line == "test_seq_1\\image_0000.png\t1.0000\t-2.2500\t3.3333\n"

    names, xyz = read_result_file(p)
    assert names == ["test_seq_1\\image_0000.png"]
    np.testing.assert_allclose(xyz[0], [1.0, -2.25, 3.3333])


def test_golden_file_parses():
    names, xyz = read_result_file("/root/reference/exp/result/icvl.txt")
    assert len(names) == 1596
    assert xyz.shape == (1596, 48)
    assert names[0].startswith("test_seq_1\\")


def test_error_curve_format(tmp_path):
    p = str(tmp_path / "err.txt")
    write_error_curve([5.0, 15.0], p)
    lines = open(p).read().strip().split("\n")
    assert len(lines) == 17
    t0, p0 = lines[0].split()
    assert float(t0) == 0.5 and float(p0) == 0.0
    t2, p2 = lines[2].split()
    assert float(t2) == 10.5 and float(p2) == 50.0


def test_evaluate_stream_end_to_end(tmp_path):
    """Tiny end-to-end: identity 'model' that returns GT -> zero error, exact
    truncation, reference-format dump."""
    from densereg_tpu.eval import evaluate_stream

    def fake_infer(variables, dm, cfg, com):
        return variables["gt"]

    batches = [
        {"dm": None, "cfg": None, "com": None,
         "pose": np.ones((3, 6), np.float32),
         "name": [f"n{i}" for i in range(3)]}
        for _ in range(3)
    ]
    res_path = str(tmp_path / "r.txt")
    report = evaluate_stream(
        fake_infer, {"gt": np.ones((3, 6), np.float32)}, iter(batches),
        exact_num=7, result_path=res_path, log_fn=lambda *_: None)
    assert report["num_frames"] == 7
    names, xyz = read_result_file(res_path)
    assert len(names) == 7
    assert report["percentages"]["10mm"] == 1.0
