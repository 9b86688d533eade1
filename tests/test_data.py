import os

import numpy as np
import pytest

from densereg_tpu.data.base import ShardReader, ShardWriter, get_dataset, write_shards
from densereg_tpu.data.pipeline import InputPipeline, TestPipeline


def test_shard_roundtrip(tmp_path):
    p = str(tmp_path / "s0.npz")
    with ShardWriter(p) as w:
        w.add(np.full((4, 6), 7, np.uint16), np.arange(9, dtype=np.float32),
              "a/b.png")
        w.add(np.zeros((4, 6), np.uint16), np.ones(9, np.float32), "c.png",
              bbx=np.arange(5, dtype=np.float32))
    r = ShardReader(p)
    assert len(r) == 2
    assert r["depth"].shape == (2, 4, 6)
    assert r["pose"].shape == (2, 9)
    assert list(r["name"]) == ["a/b.png", "c.png"]
    assert r.has_bbx


def test_write_shards_multithread(tmp_path):
    class Src:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return (np.full((2, 2), i, np.uint16),
                    np.full(6, i, np.float32), f"f{i}")

    paths = [str(tmp_path / f"t-{i}.npz") for i in range(3)]
    write_shards(Src(), paths, num_threads=2, log_fn=lambda *_: None)
    total = sum(len(ShardReader(p)) for p in paths)
    assert total == 10
    # deterministic partition: all samples present exactly once
    seen = sorted(int(ShardReader(p)["depth"][k, 0, 0])
                  for p in paths for k in range(len(ShardReader(p))))
    assert seen == list(range(10))


def test_synthetic_dataset_registry(tmp_path):
    spec = get_dataset("synthetic", "training", directory=str(tmp_path),
                       num_shards=2, samples_per_shard=8)
    assert spec.jnt_num == 16 and spec.exact_num == 16
    r = spec.readers()[0]
    assert r["depth"].shape[1:] == (240, 320)
    # depth values plausible mm
    d = r["depth"][0]
    assert d.max() > 250 and d.max() < 600
    # determinism
    spec2 = get_dataset("synthetic", "training", directory=str(tmp_path),
                        num_shards=2, samples_per_shard=8)
    np.testing.assert_array_equal(r["depth"], spec2.readers()[0]["depth"])


def test_train_pipeline_shapes(tmp_path):
    spec = get_dataset("synthetic", "training", directory=str(tmp_path),
                       num_shards=2, samples_per_shard=8)
    pipe = InputPipeline(spec, batch_size=2, sub_batch=2, input_hw=(32, 32))
    try:
        batch = next(iter(pipe))
        assert batch["dm"].shape == (2, 2, 32, 32, 1)
        assert batch["pose"].shape == (2, 2, 48)
        assert batch["cfg"].shape == (2, 2, 6)
        assert batch["com"].shape == (2, 2, 3)
        assert np.asarray(batch["com"])[..., 2].min() >= 200.0
    finally:
        pipe.close()


def test_test_pipeline_order_names_and_padding(tmp_path):
    spec = get_dataset("synthetic", "testing", directory=str(tmp_path),
                       num_shards=1, samples_per_shard=5)
    pipe = TestPipeline(spec, batch_size=3, input_hw=(32, 32))
    batches = list(pipe)
    assert len(batches) == 2  # 5 -> 3 + padded 3
    names = [n for b in batches for n in b["name"]]
    assert len(names) == 6 and names[-1] == names[-2]  # padded by repetition
    assert names[0] != names[1]
    assert batches[0]["dm"].shape == (3, 32, 32, 1)


def test_nyu_keep_14():
    from densereg_tpu.data.nyu import KEEP_POSE_IDX, keep_14
    pose = np.arange(108, dtype=np.float32)
    out = keep_14(pose)
    assert out.shape == (42,)
    np.testing.assert_array_equal(out[:3], [0, 1, 2])
    np.testing.assert_array_equal(out[3:6], [9, 10, 11])  # joint 3
    assert keep_14(out).shape == (42,)  # idempotent on already-42


def test_msra_bin_roundtrip(tmp_path):
    from densereg_tpu.data.png16 import read_msra_bin
    crop = np.arange(12, dtype=np.float32).reshape(3, 4)
    path = str(tmp_path / "x.bin")
    with open(path, "wb") as f:
        np.asarray([10, 8, 2, 1, 6, 4], np.int32).tofile(f)  # cols,rows,l,t,r,b
        crop.tofile(f)
    full = read_msra_bin(path)
    assert full.shape == (8, 10)
    np.testing.assert_array_equal(full[1:4, 2:6], crop)
    assert full[0].sum() == 0


def test_nyu_packed_png(tmp_path):
    from PIL import Image
    from densereg_tpu.data.png16 import read_depth_png
    depth = np.random.default_rng(0).integers(0, 2000, (8, 8)).astype(np.uint16)
    rgb = np.zeros((8, 8, 3), np.uint8)
    rgb[..., 1] = depth >> 8
    rgb[..., 2] = depth & 0xFF
    p = str(tmp_path / "d.png")
    Image.fromarray(rgb).save(p)
    np.testing.assert_array_equal(read_depth_png(p, nyu_packed=True), depth)


def test_png16_roundtrip(tmp_path):
    from PIL import Image
    from densereg_tpu.data.png16 import read_depth_png
    depth = np.random.default_rng(0).integers(0, 60000, (8, 8)).astype(np.uint16)
    p = str(tmp_path / "d16.png")
    Image.fromarray(depth.astype(np.int32), mode="I").save(p, format="PNG",
                                                           bits=16)
    got = read_depth_png(p)
    np.testing.assert_array_equal(got, depth)


@pytest.mark.parametrize("host_pre", [False, True],
                         ids=["device_crop", "host_crop"])
def test_train_pipeline_multiworker(tmp_path, host_pre):
    """Multiple producers yield valid batches; with host_preprocess the CPU
    crop program is also exercised concurrently from the worker threads."""
    spec = get_dataset("synthetic", "training", directory=str(tmp_path),
                       num_shards=2, samples_per_shard=8)
    pipe = InputPipeline(spec, batch_size=2, sub_batch=1, input_hw=(32, 32),
                         num_workers=3, host_preprocess=host_pre)
    try:
        it = iter(pipe)
        for _ in range(5):
            batch = next(it)
            assert batch["dm"].shape == (1, 2, 32, 32, 1)
            assert np.isfinite(np.asarray(batch["com"])).all()
    finally:
        pipe.close()


def test_partition_for_host_disjoint_cover():
    """Multi-host input: shards split disjointly across hosts; hosts beyond
    the shard count fall back to host-seeded shuffles of everything."""
    from densereg_tpu.data.pipeline import partition_for_host

    items = list(range(10))
    parts = [partition_for_host(items, h, 4) for h in range(4)]
    assert sorted(x for p in parts for x in p) == items
    assert all(len(p) >= 2 for p in parts)
    assert partition_for_host(items, 3, 16) == items
    assert partition_for_host(items, 0, 1) == items


def test_pipeline_rejects_indivisible_multihost_batch(tmp_path, monkeypatch):
    import jax
    import pytest

    from densereg_tpu.data.base import get_dataset
    from densereg_tpu.data.pipeline import InputPipeline
    from densereg_tpu.parallel import make_mesh

    spec = get_dataset("synthetic", "training", directory=str(tmp_path),
                       num_shards=1, samples_per_shard=8)
    monkeypatch.setattr(jax, "process_count", lambda: 3)
    with pytest.raises(ValueError, match="not divisible"):
        InputPipeline(spec, batch_size=4, sub_batch=1, input_hw=(32, 32),
                      mesh=make_mesh())


def test_device_prefetch_preserves_order_and_exhaustion():
    from densereg_tpu.data.pipeline import device_prefetch

    assert list(device_prefetch(iter(range(7)), depth=3)) == list(range(7))
    assert list(device_prefetch(iter(range(2)), depth=4)) == [0, 1]
    assert list(device_prefetch(iter([]), depth=2)) == []

    # laziness: exactly `depth` items pulled ahead of the consumer
    pulled = []

    def gen():
        for i in range(10):
            pulled.append(i)
            yield i

    it = device_prefetch(gen(), depth=2)
    assert next(it) == 0
    assert pulled == [0, 1, 2]
    assert next(it) == 1
    assert pulled == [0, 1, 2, 3]


def test_host_preprocess_matches_device_path(tmp_path):
    """host_preprocess=True moves the crop/com program to the CPU backend
    and ships cropped float32; the yielded batches must match the default
    (device-preprocess) path on the same shuffle order within float
    tolerance (the program is identical — only the backend differs)."""
    spec = get_dataset("synthetic", "training", directory=str(tmp_path),
                       num_shards=2, samples_per_shard=8)
    a = InputPipeline(spec, batch_size=2, sub_batch=2, input_hw=(32, 32),
                      seed=3)
    b = InputPipeline(spec, batch_size=2, sub_batch=2, input_hw=(32, 32),
                      seed=3, host_preprocess=True)
    try:
        ba = next(iter(a))
        bb = next(iter(b))
        for k in ("dm", "pose", "cfg", "com"):
            np.testing.assert_allclose(np.asarray(ba[k]), np.asarray(bb[k]),
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=k)
    finally:
        a.close()
        b.close()


def test_host_preprocess_test_pipeline_matches(tmp_path):
    """TestPipeline(host_preprocess=True) yields the same batches as the
    device-preprocess path (sequential order, so directly comparable)."""
    spec = get_dataset("synthetic", "testing", directory=str(tmp_path),
                       num_shards=1, samples_per_shard=6)
    a = TestPipeline(spec, batch_size=4, input_hw=(32, 32))
    b = TestPipeline(spec, batch_size=4, input_hw=(32, 32),
                     host_preprocess=True)
    for ba, bb in zip(a, b):
        assert ba["name"] == bb["name"]
        for k in ("dm", "pose", "cfg", "com"):
            np.testing.assert_allclose(np.asarray(ba[k]), np.asarray(bb[k]),
                                       rtol=1e-5, atol=1e-5, err_msg=k)
