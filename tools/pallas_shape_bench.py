"""Compile + validate + time the fused Pallas decode on hardware for every
dataset head shape: ICVL j=16, NYU j=14, MSRA j=21 (VERDICT r2 item 4 —
non-power-of-two sublane counts may tile differently under Mosaic, so the
interpret-mode CPU tests alone don't prove the TPU path).

For each shape: compile the kernel on the attached accelerator, assert the
decoded poses match the jnp decoder (the semantics oracle) within float
tolerance, and report chained-dep timings for both.

Usage: python tools/pallas_shape_bench.py [--batch 256] [--iters 20]
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

    from densereg_tpu import decode, geometry
    from densereg_tpu.config import CameraConfig, EvalConfig
    from densereg_tpu.ops.fused_decode import fused_decode

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--input", type=int, default=128,
                    help="crop size; decode maps are input/4 (256 -> 64x64 "
                         "heads = hw 4096, a different Mosaic tiling than "
                         "the 32x32 flagship)")
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev})", flush=True)
    interpret = dev.platform != "tpu"

    icvl = CameraConfig(fx=241.42, fy=241.42, cx=160, cy=120, w=320, h=240)
    b, h, w = args.batch, args.input // 4, args.input // 4
    rng = np.random.default_rng(0)
    cfgs = jnp.tile(geometry.scale_cfg(jnp.asarray(icvl.as_array()),
                                       args.input, args.input)[None], (b, 1))
    coms = jnp.tile(jnp.asarray([[5.0, -3.0, 400.0]], jnp.float32), (b, 1))

    for name, j in (("icvl", 16), ("nyu", 14), ("msra", 21)):
        hms = jnp.asarray(rng.uniform(0, 1, (b, h, w, j)).astype(np.float32))
        hm3s = jnp.asarray(
            rng.uniform(0, 0.9, (b, h, w, j)).astype(np.float32))
        um = rng.normal(size=(b, h, w, j, 3)).astype(np.float32)
        um /= np.linalg.norm(um, axis=-1, keepdims=True) + 1e-6
        ums = jnp.asarray(um.reshape(b, h, w, 3 * j))
        tiny = rng.uniform(-1, 1, (b, h, w, 1)).astype(np.float32)
        tiny[rng.random((b, h, w, 1)) < 0.1] = -1.0
        tiny = jnp.asarray(tiny)

        ref = decode.decode_poses(hms, hm3s, ums, tiny, cfgs, coms,
                                  EvalConfig(use_pallas=False))
        got = fused_decode(hms, hm3s, ums, tiny, cfgs, coms,
                           interpret=interpret)
        diff = float(jnp.max(jnp.abs(got - ref["normed"])))
        ok = diff < 1e-3
        print(f"[{name}] j={j}: compiled, max|fused-jnp| = {diff:.2e} "
              f"{'OK' if ok else 'MISMATCH'}", flush=True)
        if not ok:
            raise SystemExit(f"{name} j={j} mismatch {diff}")

        # chained-dep timing: perturb hm by ~0 from the previous decode
        def chain_fused(x):
            out = fused_decode(x, hm3s, ums, tiny, cfgs, coms,
                               interpret=interpret)
            return x + jnp.sum(out) * 1e-24

        def chain_jnp(x):
            out = decode.decode_poses(x, hm3s, ums, tiny, cfgs, coms,
                                      EvalConfig(use_pallas=False))
            return x + jnp.sum(out["normed"]) * 1e-24

        for label, fn in (("fused", jax.jit(chain_fused)),
                          ("jnp  ", jax.jit(chain_jnp))):
            x = fn(hms)
            float(jnp.ravel(x)[0])
            t0 = time.perf_counter()
            x = hms
            for _ in range(args.iters):
                x = fn(x)
            float(jnp.ravel(x)[0])
            dt = (time.perf_counter() - t0) / args.iters
            print(f"  {label} decode b={b}: {dt*1e3:7.2f} ms "
                  f"({b/dt:9.0f} fps)", flush=True)


if __name__ == "__main__":
    main()
