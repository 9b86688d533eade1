"""Interleaved A/B measurement: fused preprocess-into-train-step dispatch
vs the two-dispatch path (VERDICT r2 item 5).

A = the production train loop's shape: per batch, transfer raw uint16
    frames, run the jitted preprocess program, then run the jitted train
    step (two dispatches; the pipeline normally overlaps them with
    device_prefetch — disabled here so the dispatch structure itself is
    what's measured).
B = ``make_fused_train_step``: one dispatch doing preprocess + scan step.
C = host-preprocess staging, synchronous form: the same preprocess
    program jitted on the HOST CPU backend in the consumer loop, cropped
    float32 over the wire (13 MB vs 30 MB raw), one train-step dispatch.
D = host-preprocess staging, PIPELINED (the production
    ``InputPipeline(host_preprocess=True)`` data flow): the CPU crop runs
    in a producer thread feeding a bounded queue, so its cost overlaps
    the device's step k-1 instead of serializing with it.
E = D plus the uint16 wire codec (``wire_dtype="uint16"``,
    densereg_tpu.wire): the producer fixed-point-encodes the crop, halving
    the wire bytes again (6.5 vs 13 MB/batch); the consumer dequantizes in
    one device pass.

Methodology per the relay notes (memory: tpu-relay-benchmarking /
CLAUDE.md): host batches are PRE-generated outside the timed region;
variants are interleaved A,B,A,B,... within one process across >= 3 reps;
iterations chain through the carried TrainState; one scalar fetch fences
each timed block.  Through the remote relay the expected floor is the
~12 MB/batch uint16 transfer (~45-60 MB/s tunnel), which both variants
pay; the fused form saves one host->device program dispatch per batch.

Usage: python tools/fused_dispatch_bench.py [--iters 10] [--reps 3]
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
    from densereg_tpu.config import CameraConfig, NetConfig, TrainConfig
    from densereg_tpu.preprocess import preprocess_batch_from_pose
    from densereg_tpu.train import (create_train_state,
                                    make_fused_train_step, make_train_step)

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--batch", type=int, default=40)
    ap.add_argument("--sub_batch", type=int, default=5)
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev})", flush=True)

    net_cfg = NetConfig(num_stack=2, num_fea=128, num_joint=16,
                        input_hw=(128, 128), compute_dtype="bfloat16")
    tcfg = TrainConfig(batch_size=args.batch, sub_batch=args.sub_batch,
                       augment=True)
    icvl = CameraConfig(fx=241.42, fy=241.42, cx=160, cy=120, w=320, h=240)
    cam = np.asarray(icvl.as_array(), np.float32)
    n = args.batch * args.sub_batch

    # pre-generated raw host batches (uint16, the production staging dtype)
    rng = np.random.default_rng(0)
    host = []
    for _ in range(4):
        frames = np.full((n, 240, 320, 1), 900, np.uint16)
        frames[:, 90:170, 120:220, 0] = rng.integers(
            380, 460, (n, 80, 100)).astype(np.uint16)
        poses = np.zeros((n, 16, 3), np.float32)
        poses[..., 0] = rng.uniform(-25, 25, (n, 16))
        poses[..., 1] = rng.uniform(-25, 25, (n, 16))
        poses[..., 2] = rng.uniform(400, 440, (n, 16))
        host.append((frames, poses.reshape(n, -1)))
    mb = host[0][0].nbytes / 1e6
    print(f"raw frames: {mb:.1f} MB/batch uint16", flush=True)

    state0 = create_train_state(jax.random.key(0), net_cfg, tcfg, 1e6)
    step = make_train_step(net_cfg, tcfg, donate=False)
    fused = make_fused_train_step(net_cfg, tcfg, cam, donate=False)
    cam_j = jnp.asarray(cam)
    pre = jax.jit(lambda f, p: preprocess_batch_from_pose(
        f, p, cam_j, 128, 128))

    def run_two(state, iters):
        s = state
        for i in range(iters):
            frames, poses = host[i % len(host)]
            dm, pose, cfgs, coms = pre(jnp.asarray(frames),
                                       jnp.asarray(poses))
            batch = {
                "dm": dm.reshape(args.sub_batch, args.batch, 128, 128, 1),
                "pose": pose.reshape(args.sub_batch, args.batch, -1),
                "cfg": cfgs.reshape(args.sub_batch, args.batch, 6),
                "com": coms.reshape(args.sub_batch, args.batch, 3),
            }
            s, _ = step(s, batch, jax.random.key(i))
        float(jnp.sum(jax.tree_util.tree_leaves(s.params)[0]))

    def run_fused(state, iters):
        s = state
        for i in range(iters):
            frames, poses = host[i % len(host)]
            s, _ = fused(s, jnp.asarray(frames), jnp.asarray(poses),
                         jax.random.key(i))
        float(jnp.sum(jax.tree_util.tree_leaves(s.params)[0]))

    cpu = jax.devices("cpu")[0]

    def run_hostpre(state, iters):
        s = state
        for i in range(iters):
            frames, poses = host[i % len(host)]
            with jax.default_device(cpu):
                dm, pose, cfgs, coms = preprocess_batch_from_pose(
                    frames, poses, cam, 128, 128)
            batch = {
                "dm": jnp.asarray(np.asarray(dm)).reshape(
                    args.sub_batch, args.batch, 128, 128, 1),
                "pose": jnp.asarray(np.asarray(pose)).reshape(
                    args.sub_batch, args.batch, -1),
                "cfg": jnp.asarray(np.asarray(cfgs)).reshape(
                    args.sub_batch, args.batch, 6),
                "com": jnp.asarray(np.asarray(coms)).reshape(
                    args.sub_batch, args.batch, 3),
            }
            s, _ = step(s, batch, jax.random.key(i))
        float(jnp.sum(jax.tree_util.tree_leaves(s.params)[0]))

    def _make_hostpipe(wire_u16: bool):
        # the production pipelined form: one producer thread crops on the
        # CPU backend into a bounded queue while the consumer transfers +
        # steps — models InputPipeline(host_preprocess=True).__iter__;
        # with wire_u16 the producer also fixed-point-encodes the crop
        # (InputPipeline(wire_dtype="uint16"): 6.5 vs 13 MB/batch)
        import queue as _queue
        import threading as _threading

        from densereg_tpu.wire import encode_dm_u16

        def run(state, iters):
            q: _queue.Queue = _queue.Queue(maxsize=2)

            def produce():
                for i in range(iters):
                    frames, poses = host[i % len(host)]
                    with jax.default_device(cpu):
                        out = preprocess_batch_from_pose(
                            frames, poses, cam, 128, 128)
                    out = tuple(np.asarray(x) for x in out)
                    if wire_u16:
                        out = encode_dm_u16(out[0]) + out[1:]
                    q.put(out)

            t = _threading.Thread(target=produce, daemon=True)
            t.start()
            s = state
            for i in range(iters):
                item = q.get()
                if wire_u16:
                    from densereg_tpu.wire import decode_dm_u16

                    qdm, scale, pose, cfgs, coms = item
                    dm = decode_dm_u16(jnp.asarray(qdm), jnp.asarray(scale))
                    pose, cfgs, coms = (jnp.asarray(x)
                                        for x in (pose, cfgs, coms))
                else:
                    dm, pose, cfgs, coms = (jnp.asarray(x) for x in item)
                batch = {
                    "dm": dm.reshape(args.sub_batch, args.batch, 128, 128, 1),
                    "pose": pose.reshape(args.sub_batch, args.batch, -1),
                    "cfg": cfgs.reshape(args.sub_batch, args.batch, 6),
                    "com": coms.reshape(args.sub_batch, args.batch, 3),
                }
                s, _ = step(s, batch, jax.random.key(i))
            float(jnp.sum(jax.tree_util.tree_leaves(s.params)[0]))
            t.join()

        return run

    run_hostpipe = _make_hostpipe(False)
    run_hostpipe_u16 = _make_hostpipe(True)

    # warm every compile before any timing
    run_two(state0, 1)
    run_fused(state0, 1)
    run_hostpre(state0, 1)
    run_hostpipe(state0, 1)
    run_hostpipe_u16(state0, 1)

    # ROTATE the variant order each rep: relay throughput drifts within a
    # run (measured monotone degradation across a rep's blocks), so a fixed
    # order systematically favors whichever variant runs first.  With one
    # full rotation every variant occupies every position once.
    variants = [("two", run_two), ("fused", run_fused),
                ("hostpre", run_hostpre), ("hostpipe", run_hostpipe),
                ("hostpipe_u16", run_hostpipe_u16)]
    results = {name: [] for name, _ in variants}
    for rep in range(args.reps):
        rot = rep % len(variants)
        order = variants[rot:] + variants[:rot]
        for name, fn in order:
            t0 = time.perf_counter()
            fn(state0, args.iters)
            dt = (time.perf_counter() - t0) / args.iters
            results[name].append(dt)
            print(f"rep {rep} {name:8s}: {dt*1e3:7.1f} ms/batch "
                  f"({n/dt:7.0f} samples/s)", flush=True)

    for name, ts in results.items():
        ts = sorted(ts)
        med = ts[len(ts) // 2]
        print(f"{name:8s} median {med*1e3:7.1f} ms/batch  "
              f"(all: {', '.join(f'{t*1e3:.0f}' for t in ts)})", flush=True)


if __name__ == "__main__":
    main()
