"""Source-layout fixture tests: build miniature ICVL / NYU / MSRA source
trees in their REAL on-disk formats (labels.txt with uvd poses, MATLAB
joint_data.mat with the y-flip, packed/16-bit PNGs, proprietary .bin), run
the actual converters, and stream the result through the pipelines."""

import os
import pickle

import numpy as np
import pytest
from PIL import Image

from densereg_tpu.data import icvl as icvl_mod
from densereg_tpu.data import msra as msra_mod
from densereg_tpu.data import nyu as nyu_mod
from densereg_tpu.data.base import ShardReader
from densereg_tpu.data.pipeline import InputPipeline, TestPipeline


def _save_png16(path, depth):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(depth.astype(np.int32), mode="I").save(path, format="PNG",
                                                           bits=16)


def _scene(rng, h, w, depth_mm=400):
    d = np.zeros((h, w), np.uint16)
    d[h // 4:3 * h // 4, w // 4:3 * w // 4] = rng.integers(
        depth_mm - 50, depth_mm + 50, (h // 2, w // 2))
    return d


# --------------------------------------------------------------------- ICVL

def _make_icvl_source(root, rng, n_train=24, n_test=8):
    for subset, prefix, n in (("Training", "2014", n_train),
                              ("Testing", "test_seq_1", n_test)):
        src = os.path.join(root, subset)
        lines = []
        for i in range(n):
            name = f"{prefix}/image_{i:04d}.png"
            _save_png16(os.path.join(src, "Depth", name),
                        _scene(rng, 240, 320))
            # labels.txt carries uvd (converted to xyz at load,
            # /root/reference/data/icvl.py:104-110)
            uvd = np.zeros((16, 3), np.float32)
            uvd[:, 0] = rng.uniform(120, 200, 16)
            uvd[:, 1] = rng.uniform(80, 160, 16)
            uvd[:, 2] = rng.uniform(350, 450, 16)
            lines.append(name + " " + " ".join(f"{v:.4f}"
                                               for v in uvd.reshape(-1)))
        with open(os.path.join(src, "labels.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")


@pytest.mark.slow
def test_icvl_convert_and_stream(tmp_path, rng):
    root = str(tmp_path / "icvl")
    _make_icvl_source(root, rng)
    icvl_mod.convert(root, "training", num_threads=2)
    icvl_mod.convert(root, "testing", num_threads=1)

    spec = icvl_mod.make_spec("training", directory=root)
    total = sum(len(r) for r in
                {r.path: r for r in spec.readers()}.values())
    assert total == 24
    # uvd -> xyz happened at load: z preserved, x centered around 0
    nonempty = next(r for r in spec.readers() if len(r))
    pose = nonempty["pose"][0].reshape(16, 3)
    assert 300 < pose[:, 2].mean() < 500
    assert abs(pose[:, 0]).max() < 200

    pipe = InputPipeline(spec, batch_size=2, sub_batch=1, input_hw=(32, 32))
    try:
        batch = next(iter(pipe))
        assert batch["dm"].shape == (1, 2, 32, 32, 1)
    finally:
        pipe.close()

    test_spec = icvl_mod.make_spec("testing", directory=root)
    batches = list(TestPipeline(test_spec, batch_size=4, input_hw=(32, 32)))
    names = [n for b in batches for n in b["name"]]
    assert sum(1 for n in set(names)) == 8


# ---------------------------------------------------------------------- NYU

def _make_nyu_source(root, rng, n=20):
    import scipy.io as sio

    src = os.path.join(root, "dataset", "test")
    os.makedirs(src, exist_ok=True)
    joints = rng.uniform(-100, 100, (1, n, 36, 3)).astype(np.float64)
    joints[..., 2] = rng.uniform(700, 900, (1, n, 36))
    sio.savemat(os.path.join(src, "joint_data.mat"), {"joint_xyz": joints})
    for i in range(n):
        depth = _scene(rng, 480, 640, 800)
        rgb = np.zeros((480, 640, 3), np.uint8)
        rgb[..., 1] = depth >> 8
        rgb[..., 2] = depth & 0xFF
        Image.fromarray(rgb).save(
            os.path.join(src, f"depth_1_{i + 1:07d}.png"))
    bbxes = [(100.0, 150.0, 380.0, 480.0, 1000.0)] * n
    with open(os.path.join(src, "nyu_bbx.pkl"), "wb") as f:
        pickle.dump(bbxes, f)
    return joints


@pytest.mark.slow
def test_nyu_convert_and_stream(tmp_path, rng):
    root = str(tmp_path / "nyu")
    joints = _make_nyu_source(root, rng)
    nyu_mod.convert(root, "testing", num_threads=2)

    spec = nyu_mod.make_spec("testing", directory=root)
    readers = {r.path: r for r in spec.readers()}
    total = sum(len(r) for r in readers.values())
    assert total == 20
    nonempty = next(r for r in readers.values() if len(r))
    assert nonempty.has_bbx
    # y axis flipped at load (/root/reference/data/nyu.py:118)
    pose = nonempty["pose"][0].reshape(36, 3)
    name = str(nonempty["name"][0])
    idx = int(name.split("_")[-1].split(".")[0]) - 1
    np.testing.assert_allclose(pose[:, 1], -joints[0, idx, :, 1], rtol=1e-5)
    # stored poses are 108-dim; the pipeline gathers 14 joints
    assert pose.size == 108
    pipe_batches = list(TestPipeline(spec, batch_size=4, input_hw=(32, 32)))
    assert pipe_batches[0]["pose"].shape == (4, 42)
    assert pipe_batches[0]["dm"].shape == (4, 32, 32, 1)


# --------------------------------------------------------------------- MSRA

def _make_msra_source(root, rng, frames_per_gesture=2):
    src = os.path.join(root, "P0")
    for gesture in msra_mod.POSE_LIST:
        gdir = os.path.join(src, gesture)
        os.makedirs(gdir, exist_ok=True)
        lines = [str(frames_per_gesture)]
        for i in range(frames_per_gesture):
            pose = np.zeros((21, 3), np.float32)
            pose[:, 0] = rng.uniform(-50, 50, 21)
            pose[:, 1] = rng.uniform(-50, 50, 21)
            pose[:, 2] = rng.uniform(-450, -350, 21)  # negated in file
            lines.append(" ".join(f"{v:.3f}" for v in pose.reshape(-1)))
            # .bin: 6 int32 header + float32 crop payload
            with open(os.path.join(gdir, f"{i:06d}_depth.bin"), "wb") as f:
                np.asarray([320, 240, 100, 80, 220, 160], np.int32).tofile(f)
                crop = rng.uniform(350, 450, (80, 120)).astype(np.float32)
                crop.tofile(f)
        with open(os.path.join(gdir, "joint.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")


@pytest.mark.slow
def test_msra_convert_and_stream(tmp_path, rng):
    root = str(tmp_path / "msra")
    _make_msra_source(root, rng)
    msra_mod.convert(root, pid=0, num_threads=2, do_bin_conversion=True)

    spec = msra_mod.make_spec("testing", pid=0, directory=root)
    readers = {r.path: r for r in spec.readers()}
    total = sum(len(r) for r in readers.values())
    assert total == 34  # 17 gestures x 2 frames
    nonempty = next(r for r in readers.values() if len(r))
    pose = nonempty["pose"][0].reshape(21, 3)
    assert (pose[:, 2] > 0).all()  # y,z negation applied at load
    batches = list(TestPipeline(spec, batch_size=4, input_hw=(32, 32)))
    assert batches[0]["dm"].shape == (4, 32, 32, 1)
    assert batches[0]["pose"].shape == (4, 63)


def _make_nyu_train_source(root, rng, n_per_cam=4):
    import scipy.io as sio

    src = os.path.join(root, "dataset", "train")
    os.makedirs(src, exist_ok=True)
    joints = rng.uniform(-100, 100, (3, n_per_cam, 36, 3)).astype(np.float64)
    joints[..., 2] = rng.uniform(700, 900, (3, n_per_cam, 36))
    sio.savemat(os.path.join(src, "joint_data.mat"), {"joint_xyz": joints})
    for c in range(3):
        for i in range(n_per_cam):
            depth = _scene(rng, 480, 640, 800)
            rgb = np.zeros((480, 640, 3), np.uint8)
            rgb[..., 1] = depth >> 8
            rgb[..., 2] = depth & 0xFF
            Image.fromarray(rgb).save(
                os.path.join(src, f"depth_{c + 1}_{i + 1:07d}.png"))
    return joints


@pytest.mark.slow
def test_nyu_train_convert_and_stream(tmp_path, rng):
    """training path: 3 cameras, no bbx, crop from GT pose, 14-joint gather"""
    root = str(tmp_path / "nyu")
    _make_nyu_train_source(root, rng)
    nyu_mod.convert(root, "training", num_threads=2)

    spec = nyu_mod.make_spec("training", directory=root)
    readers = {r.path: r for r in spec.readers()}
    total = sum(len(r) for r in readers.values())
    # the training spec reads the first 100 of 300 shards (the reference's
    # convention, data/nyu.py:63) -> the first third of the 12 samples
    assert total == 4
    nonempty = next(r for r in readers.values() if len(r))
    assert not nonempty.has_bbx
    assert not spec.uses_bbx  # bbx crop is test-only

    pipe = InputPipeline(spec, batch_size=2, sub_batch=1, input_hw=(32, 32))
    try:
        batch = next(iter(pipe))
        assert batch["pose"].shape == (1, 2, 42)  # 14-joint gather applied
        assert batch["dm"].shape == (1, 2, 32, 32, 1)
        assert np.isfinite(np.asarray(batch["com"])).all()
    finally:
        pipe.close()


# ------------------------------------------------------------------ BigHand

def _make_bighand_source(root, rng, n_train=12, n_test=5):
    """Miniature BigHand 2.2M tree: images/ of 640x480-style 16-bit PNGs
    (shrunk) + '<frame> <63 floats>' annotation lines, camera-space xyz mm."""
    from densereg_tpu.data import bighand as bh

    img_dir = os.path.join(root, "images")
    for subset, annot, n in (("training", "Training_Annotation.txt", n_train),
                             ("testing", "Test_Annotation.txt", n_test)):
        lines = []
        for i in range(n):
            name = f"{subset}/image_D{i:08d}.png"
            _save_png16(os.path.join(img_dir, name), _scene(rng, 48, 64))
            xyz = np.zeros((21, 3), np.float32)
            xyz[:, 0] = rng.uniform(-60, 60, 21)
            xyz[:, 1] = rng.uniform(-60, 60, 21)
            xyz[:, 2] = rng.uniform(350, 450, 21)
            lines.append(name + "\t" + " ".join(
                "%.6f" % v for v in xyz.reshape(-1)))
        with open(os.path.join(root, annot), "w") as f:
            f.write("\n".join(lines) + "\n")


def test_bighand_convert_and_stream(tmp_path, rng):
    from densereg_tpu.data import bighand as bh

    root = str(tmp_path / "bighand")
    # spec without shards: actionable error, not a silent empty dataset
    os.makedirs(root, exist_ok=True)
    with pytest.raises(FileNotFoundError, match="convert"):
        bh.make_spec("training", directory=root)

    _make_bighand_source(root, np.random.default_rng(5))
    bh.convert(root, "training", num_threads=2)
    bh.convert(root, "testing", num_threads=1)

    spec = bh.make_spec("training", directory=root)
    assert spec.jnt_num == 21 and spec.pose_dim == 63
    total = sum(len(r) for r in {r.path: r for r in spec.readers()}.values())
    assert total == 12
    assert spec.approximate_num == 12  # meta json count, not a guess
    r = next(r for r in spec.readers() if len(r))
    pose = r["pose"][0].reshape(21, 3)
    assert 350 <= pose[:, 2].min() and pose[:, 2].max() <= 450

    pipe = InputPipeline(spec, batch_size=2, sub_batch=1, input_hw=(32, 32))
    try:
        batch = next(iter(pipe))
        assert batch["dm"].shape == (1, 2, 32, 32, 1)
        assert batch["pose"].shape == (1, 2, 63)
    finally:
        pipe.close()

    test_spec = bh.make_spec("testing", directory=root)
    assert test_spec.exact_num == 5
    batches = list(TestPipeline(test_spec, batch_size=4, input_hw=(32, 32)))
    names = [n for b in batches for n in b["name"]]
    assert len(set(names)) == 5
