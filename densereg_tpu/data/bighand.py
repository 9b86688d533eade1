"""BigHand 2.2M dataset — interface stub.

The reference CLI dispatches ``--dataset bighand`` to a ``data.bigHand``
module that is NOT shipped in the repo snapshot (the import at
/root/reference/model/hourglass_um_crop_tiny.py:886-889 would fail).  We keep
the registry entry so the CLI surface matches, with the documented BigHand
camera intrinsics and 21-joint layout; converting the actual dataset requires
its (license-gated) source files.
"""

from __future__ import annotations

import os

from densereg_tpu.config import CameraConfig
from densereg_tpu.data.base import DatasetSpec, register_dataset

CFG = CameraConfig(fx=475.065948, fy=475.065857, cx=315.944855,
                   cy=245.287079, w=640.0, h=480.0)
JNT_NUM = 21
DEFAULT_DIR = "./exp/data/bighand/"


@register_dataset("bighand")
def make_spec(subset: str, directory: str = DEFAULT_DIR, **_) -> DatasetSpec:
    shard_dir = os.path.join(directory, "shards")
    if not os.path.isdir(shard_dir):
        raise NotImplementedError(
            "bighand is an interface stub (the reference never shipped its "
            "loader either, /root/reference/model/hourglass_um_crop_tiny.py:"
            "886); place converted shards under %s to use it" % shard_dir)
    files = sorted(
        os.path.join(shard_dir, f) for f in os.listdir(shard_dir)
        if f.startswith(subset) and f.endswith(".npz"))
    approx = 1000 * max(len(files), 1)
    return DatasetSpec(
        name="bighand", subset=subset, cfg=CFG, jnt_num=JNT_NUM,
        max_depth=1000.0, directory=directory, filenames=files,
        exact_num=approx, approximate_num=approx)
