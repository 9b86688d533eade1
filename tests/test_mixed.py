import numpy as np
import pytest

from densereg_tpu.data.base import get_dataset
from densereg_tpu.data.mixed import MixedPipeline


def test_mixed_pipeline_interleaves(tmp_path):
    a = get_dataset("synthetic", "training", directory=str(tmp_path / "a"),
                    num_shards=1, samples_per_shard=8, seed=1)
    b = get_dataset("synthetic", "training", directory=str(tmp_path / "b"),
                    num_shards=1, samples_per_shard=8, seed=2)
    mix = MixedPipeline([a, b], batch_size=2, sub_batch=1, input_hw=(32, 32),
                        weights=[0.5, 0.5], seed=0)
    try:
        it = iter(mix)
        batches = [next(it) for _ in range(4)]
        for batch in batches:
            assert batch["dm"].shape == (1, 2, 32, 32, 1)
            assert batch["pose"].shape == (1, 2, 48)
    finally:
        mix.close()


def test_mixed_rejects_joint_mismatch(tmp_path):
    a = get_dataset("synthetic", "training", directory=str(tmp_path / "a"),
                    num_shards=1, samples_per_shard=4)
    import dataclasses
    b = dataclasses.replace(a, jnt_num=21)
    with pytest.raises(ValueError, match="joint count"):
        MixedPipeline([a, b], batch_size=2)


def test_auto_resume(tmp_path):
    """--resume restores the latest checkpoint transparently."""
    from densereg_tpu.config import NetConfig, TrainConfig
    from densereg_tpu.train.loop import train

    net = NetConfig(num_stack=1, num_fea=8, num_joint=16, input_hw=(32, 32))
    tcfg = TrainConfig(batch_size=2, sub_batch=1, augment=False,
                       base_dir=str(tmp_path / "cache"), checkpoint_every=2)
    spec = get_dataset("synthetic", "training",
                       directory=str(tmp_path / "data"),
                       num_shards=1, samples_per_shard=8)
    s1 = train(spec, net, tcfg, max_steps=3, log_fn=lambda *_: None)
    assert int(s1.step) == 3
    s2 = train(spec, net, tcfg, restore_step="auto", max_steps=5,
               log_fn=lambda *_: None)
    assert int(s2.step) == 5
