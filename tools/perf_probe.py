"""Performance probe: stage-by-stage timings on the attached accelerator.

Measures (per batch size):
  * network forward only (eval mode)
  * full serving path (norm + forward + vote decode), jnp and Pallas decode
  * one full training step (batch 40 x sub_batch 5 reference config)

Usage: python tools/perf_probe.py [--batches 64,256,1024] [--train]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit_chained(step, x0, iters=20, warmup=2):
    """Time ``x -> step(x)`` with iterations serialized through the carried
    value and a final scalar fetch.  On remote-attached accelerators
    ``block_until_ready`` does not fence queued work, so naive loops measure
    dispatch, not compute."""
    import jax.numpy as jnp

    x = step(x0)
    float(jnp.sum(jnp.ravel(x)[0]))
    for _ in range(warmup - 1):
        x = step(x)
    float(jnp.sum(jnp.ravel(x)[0]))
    t0 = time.perf_counter()
    x = x0
    for _ in range(iters):
        x = step(x)
    float(jnp.sum(jnp.ravel(x)[0]))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from densereg_tpu import geometry
    from densereg_tpu.config import (CameraConfig, EvalConfig, NetConfig,
                                     TrainConfig)
    from densereg_tpu.eval.loop import make_infer_fn
    from densereg_tpu.models import DenseRegNet
    from densereg_tpu.preprocess import norm_dm

    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="64,256,1024")
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--net", default="um_v1",
                    help="architecture variant: um_v1 | um_v1_lite | "
                         "um_v1_deconv")
    ap.add_argument("--input", type=int, default=128,
                    help="crop size (128/256/512; sets hourglass depth)")
    ap.add_argument("--train_batch", type=int, default=40,
                    help="--train: per-sub-batch size (reference default "
                         "40; at --input 512 the 40x5 step's remat'd "
                         "activations exceed the 16 GB HBM — use 8)")
    ap.add_argument("--train_sub", type=int, default=5,
                    help="--train: accumulation sub-batches")
    args = ap.parse_args()
    IN = args.input

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '')}")

    net_cfg = NetConfig(num_stack=2, num_fea=128, num_joint=16,
                        input_hw=(IN, IN),
                        compute_dtype=args.dtype, net_module=args.net)
    net = DenseRegNet(net_cfg)
    icvl = CameraConfig(fx=241.42, fy=241.42, cx=160, cy=120, w=320, h=240)
    cfg128 = geometry.scale_cfg(icvl.as_array(), IN, IN)
    rng = np.random.default_rng(0)

    variables = net.init({"params": jax.random.key(0)},
                         jnp.zeros((1, IN, IN, 1)), train=False)

    @jax.jit
    def fwd_step(x):
        outs = net.apply(variables, x, train=False)
        return x + jnp.sum(outs["um"][-1]) * 1e-24

    for b in [int(x) for x in args.batches.split(",")]:
        dms = jnp.asarray(rng.uniform(300, 500, (b, IN, IN, 1))
                          .astype(np.float32))
        cfgs = jnp.tile(cfg128[None], (b, 1))
        coms = jnp.tile(jnp.asarray([[0.0, 0.0, 400.0]], jnp.float32), (b, 1))
        normed = norm_dm(dms, coms)

        t_fwd = timeit_chained(fwd_step, normed)
        print(f"b={b:5d}  fwd {t_fwd*1e3:7.2f} ms ({b/t_fwd:9.0f} fps)",
              flush=True)

        def full_step_factory(use_pallas):
            infer = make_infer_fn(net_cfg, EvalConfig(batch_size=b,
                                                      use_pallas=use_pallas))

            @jax.jit
            def step(x):
                xyz = infer(variables, x, cfgs, coms)
                return x + jnp.sum(xyz) * 1e-24
            return step

        t_full = timeit_chained(full_step_factory(False), dms)
        print(f"b={b:5d}  full {t_full*1e3:7.2f} ms ({b/t_full:9.0f} fps)  "
              f"decode-overhead {(t_full-t_fwd)*1e3:6.2f} ms", flush=True)
        if args.pallas and dev.platform == "tpu":
            t_pal = timeit_chained(full_step_factory(True), dms)
            print(f"b={b:5d}  full+pallas {t_pal*1e3:7.2f} ms "
                  f"({b/t_pal:9.0f} fps)", flush=True)

    if args.train:
        from densereg_tpu.train import create_train_state, make_train_step
        tcfg = TrainConfig(batch_size=args.train_batch,
                           sub_batch=args.train_sub, augment=True)
        state = create_train_state(jax.random.key(0), net_cfg, tcfg, 1e6)
        step_fn = make_train_step(net_cfg, tcfg, donate=False)
        sub, bb = tcfg.sub_batch, tcfg.batch_size
        poses = np.zeros((sub, bb, 16, 3), np.float32)
        poses[..., 0] = rng.uniform(-40, 40, (sub, bb, 16))
        poses[..., 1] = rng.uniform(-40, 40, (sub, bb, 16))
        poses[..., 2] = rng.uniform(360, 440, (sub, bb, 16))
        batch = {
            "dm": jnp.asarray(rng.uniform(300, 500, (sub, bb, IN, IN, 1))
                              .astype(np.float32)),
            "pose": jnp.asarray(poses.reshape(sub, bb, -1)),
            "cfg": jnp.tile(cfg128[None, None], (sub, bb, 1)),
            "com": jnp.asarray(poses.mean(axis=2)),
        }
        # chained through the carried TrainState -> serialized by construction
        key = jax.random.key(1)
        s = step_fn(state, batch, key)[0]
        float(s.renorm_t)
        iters = 5
        t0 = time.perf_counter()
        s = state
        for _ in range(iters):
            s, _ = step_fn(s, batch, key)
        float(jnp.sum(jax.tree_util.tree_leaves(s.params)[0]))
        t = (time.perf_counter() - t0) / iters
        spb = sub * bb
        print(f"train step (b{bb}xsub{sub}): {t*1e3:.1f} ms "
              f"({spb/t:.0f} samples/s)  [reference logs sec/batch here]")


if __name__ == "__main__":
    main()
