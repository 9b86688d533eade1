"""Host->device transfer probe for the eval/serving feed path.

Times the full host-feed loop — ``jnp.asarray(raw frames)`` -> jitted
preprocess -> forward+decode -> fetch xyz — once with float32 frames and
once with the shards' native uint16 (half the bytes), isolating the
transfer-dtype effect that dominates the eval loop through a
remote-attached TPU (BASELINE.md: ~17 MB/batch-256 at float32 128x128).

Usage: python tools/transfer_probe.py [--batch 256] [--frames 240,320]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from densereg_tpu import geometry
    from densereg_tpu.config import CameraConfig, EvalConfig, NetConfig
    from densereg_tpu.eval.loop import make_infer_fn
    from densereg_tpu.models import DenseRegNet
    from densereg_tpu.preprocess import preprocess_batch_from_pose

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--frames", default="240,320",
                    help="raw frame H,W (sensor size)")
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()
    fh, fw = (int(x) for x in args.frames.split(","))
    b = args.batch

    net_cfg = NetConfig(num_stack=2, num_fea=128, num_joint=16,
                        compute_dtype="bfloat16")
    net = DenseRegNet(net_cfg)
    variables = net.init({"params": jax.random.key(0)},
                         jnp.zeros((1, 128, 128, 1)), train=False)
    infer = make_infer_fn(net_cfg, EvalConfig(batch_size=b))
    icvl = CameraConfig(fx=241.42, fy=241.42, cx=160, cy=120, w=fw, h=fh)
    cam = icvl.as_array()

    rng = np.random.default_rng(0)
    depth = np.zeros((b, fh, fw, 1), np.uint16)
    depth[:, fh // 4:3 * fh // 4, fw // 4:3 * fw // 4, 0] = \
        rng.uniform(350, 450, (b, fh // 2, fw // 2)).astype(np.uint16)
    poses = np.zeros((b, 16, 3), np.float32)
    poses[..., 0] = rng.uniform(-40, 40, (b, 16))
    poses[..., 1] = rng.uniform(-30, 30, (b, 16))
    poses[..., 2] = rng.uniform(360, 440, (b, 16))
    poses = poses.reshape(b, -1)

    def run_once(raw):
        dm, pose, cfgs, coms = preprocess_batch_from_pose(
            jnp.asarray(raw), jnp.asarray(poses), cam, 128, 128, 500.0)
        xyz = infer(variables, dm, cfgs, coms)
        return float(jnp.sum(xyz))  # full fence (relay-safe)

    mb = {"float32": depth.astype(np.float32), "uint16": depth}
    for name, raw in mb.items():
        run_once(raw)  # compile + warm
        run_once(raw)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            run_once(raw)
        dt = (time.perf_counter() - t0) / args.reps
        nbytes = raw.nbytes / 1e6
        print(f"{name:8s} feed: {dt * 1e3:7.1f} ms/batch-{b} "
              f"({b / dt:7.0f} fps incl. host loop; {nbytes:.1f} MB/batch "
              f"transferred)")


if __name__ == "__main__":
    main()
