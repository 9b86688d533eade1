import os

import numpy as np

from densereg_tpu.eval.visualization import (
    SKELETONS,
    SummaryImageWriter,
    figure_candidate_pairs,
    figure_heatmap,
    figure_joint_skeleton,
)


def test_skeleton_topologies_cover_joint_counts():
    joints, bones = SKELETONS["icvl"]()
    assert max(joints) == 15 and len(joints) == 16
    joints, bones = SKELETONS["msra"]()
    assert max(joints) == 20 and len(joints) == 21
    joints, bones = SKELETONS["nyu"]()
    assert max(joints) == 13
    for a, b, _ in bones:
        assert 0 <= a < 14 and 0 <= b < 14


def test_figures_render(tmp_path, rng):
    hm = rng.uniform(0, 1, (32, 32))
    fig = figure_heatmap(hm)
    dm = rng.uniform(0, 1, (128, 128))
    uvd = rng.uniform(0, 128, (16, 3))
    fig2 = figure_joint_skeleton(dm, uvd, "icvl")
    fig3 = figure_candidate_pairs(dm, uvd[:5, :2], uvd[5:10, :2])

    w = SummaryImageWriter(str(tmp_path), debug_level=2)
    assert w.save("hm", fig, 0, level=1)
    assert w.save("skel", fig2, 0, level=2)
    assert w.save("cands", fig3, 0, level=1)
    assert w.save("hidden", fig, 0, level=3) is None  # gated by debug level
    assert len(os.listdir(tmp_path)) == 3


def test_batch_skeletons(tmp_path, rng):
    w = SummaryImageWriter(str(tmp_path))
    dms = rng.uniform(0, 1, (5, 32, 32, 1))
    uvds = rng.uniform(0, 32, (5, 21, 3))
    paths = w.save_batch_skeletons("val", dms, uvds, "msra_P0", 7)
    assert len(paths) == 3  # capped at max_n
    assert all(os.path.exists(p) for p in paths)


def test_cv2_depth_helpers(rng):
    from densereg_tpu.eval.visualization import annotate_depth, colorize_depth

    dm = rng.uniform(0, 900, (60, 80)).astype(np.float32)
    img = colorize_depth(dm, thresh=750)
    assert img.shape == (60, 80, 3) and img.dtype == np.uint8
    assert img[dm > 750].max() == 0  # beyond threshold zeroed

    uvd = np.array([[10.0, 20.0, 400.0], [70.0, 50.0, 300.0]])
    ann = annotate_depth(dm, uvd)
    # red circles drawn at the joints (BGR)
    assert ann[20, 10, 2] == 255 and ann[50, 70, 2] == 255
