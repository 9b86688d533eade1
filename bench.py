"""Benchmark harness.

Measures end-to-end inference throughput (normalize -> stacked hourglass
s2/f128 -> vote decode) in frames/sec/chip at serving batch 256 on the
available accelerator — BASELINE.json config #5 ("fused
preprocess->infer->vote serving at batch 256").

Accelerator default is the fastest production serving configuration:
calibrated int8 (per-channel weights + static activation scales; decoded
pose pinned within 1 mm of float on a trained net, tests/test_quantize.py)
with the fused Pallas decode.  BENCH_QUANT=0 forces bf16; failures degrade
gracefully int8 -> bf16 -> jnp decode so the harness always reports.

``vs_baseline``: the reference publishes no numbers (BASELINE.json.published
is empty; see BASELINE.md) — its training/test logs sec/batch on CPU only.
The north-star is ">=20x frames/sec/chip over the CPU baseline", so we
measure the SAME program on the local CPU backend (small batch, extrapolated
per-frame) and report accelerator_fps / cpu_fps.  If no CPU backend is
available the stored constant from exp/cpu_baseline.json is used.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "256"))
CPU_BATCH = int(os.environ.get("BENCH_CPU_BATCH", "4"))
# Committed one-time measurement of the same serving program on this image's
# CPU backend (the reference's default platform); re-measure by deleting the
# file or setting BENCH_REMEASURE_CPU=1.
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_cpu_baseline.json")


def _build(batch, compute_dtype, use_pallas=False, quant=False):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from densereg_tpu import geometry
    from densereg_tpu.config import CameraConfig, EvalConfig, NetConfig
    from densereg_tpu.eval.loop import make_infer_fn
    from densereg_tpu.models import DenseRegNet, fold_batch_norm

    net_cfg = NetConfig(num_stack=2, num_fea=128, num_joint=16,
                        input_hw=(128, 128), compute_dtype=compute_dtype)
    net = DenseRegNet(net_cfg)
    rng = np.random.default_rng(0)
    dms = jnp.asarray(
        rng.uniform(300.0, 500.0, (batch, 128, 128, 1)).astype(np.float32))
    variables = net.init({"params": jax.random.key(0)},
                         jnp.zeros((1, 128, 128, 1)), train=False)
    if quant:
        # int8 serving path: folded BN + per-channel weight quantization +
        # static activation scales from a calibration pass.  This is the
        # accelerator default: measured 9.7k fps vs 9.1k bf16 at batch 256
        # on v5e, with the decoded pose pinned within 1 mm of float on a
        # trained net (tests/test_quantize.py).
        from densereg_tpu.models.quantize import calibrate, quantize_weights
        from densereg_tpu.preprocess import norm_dm
        variables = quantize_weights(
            fold_batch_norm(variables, eps=net_cfg.bn_epsilon))
        net_cfg = dataclasses.replace(net_cfg, fold_bn=True, quantize=True)
        coms_cal = jnp.tile(jnp.asarray([[0.0, 0.0, 400.0]], jnp.float32),
                            (batch, 1))
        variables = jax.jit(
            lambda v, d: calibrate(DenseRegNet(net_cfg), v,
                                   [norm_dm(d, coms_cal)])
        )(variables, dms)
    if (not quant) and os.environ.get("BENCH_FOLD", "1") == "1":
        # serving default: batch norm folded into the conv weights
        variables = fold_batch_norm(variables, eps=net_cfg.bn_epsilon)
        net_cfg = dataclasses.replace(net_cfg, fold_bn=True)
    icvl = CameraConfig(fx=241.42, fy=241.42, cx=160, cy=120, w=320, h=240)
    cfgs = jnp.tile(geometry.scale_cfg(icvl.as_array(), 128, 128)[None],
                    (batch, 1))
    coms = jnp.tile(jnp.asarray([[0.0, 0.0, 400.0]], jnp.float32), (batch, 1))
    infer = make_infer_fn(net_cfg, EvalConfig(batch_size=batch,
                                              use_pallas=use_pallas))
    return infer, variables, dms, cfgs, coms


def _measure(device, batch, compute_dtype, iters=10, warmup=2,
             use_pallas=False, quant=False):
    """Iterations are chained through a data dependency (the decoded pose
    perturbs the next input by ~1e-24 mm) and a scalar is fetched at the end:
    on remote-attached accelerators ``block_until_ready`` alone does not
    fence previously enqueued work, which inflates naive timings ~100x."""
    import jax
    import jax.numpy as jnp

    with jax.default_device(device):
        infer, variables, dms, cfgs, coms = _build(batch, compute_dtype,
                                                   use_pallas, quant)

        @jax.jit
        def chained(variables, dms, cfgs, coms):
            xyz = infer(variables, dms, cfgs, coms)
            return dms + jnp.sum(xyz) * 1e-24, xyz

        dms1, xyz = chained(variables, dms, cfgs, coms)
        float(jnp.sum(xyz))  # warm compile + full fence
        for _ in range(warmup - 1):
            dms1, xyz = chained(variables, dms, cfgs, coms)
        float(jnp.sum(xyz))
        t0 = time.perf_counter()
        cur = dms
        for _ in range(iters):
            cur, xyz = chained(variables, cur, cfgs, coms)
        float(jnp.sum(xyz))  # fences the whole chain
        dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    import jax

    dev = jax.devices()[0]
    on_accel = dev.platform != "cpu"
    # Accelerator default: calibrated int8 (the fastest serving config with
    # a pinned <1 mm decode contract).  BENCH_QUANT=0 forces bf16,
    # BENCH_QUANT=1 forces int8 regardless of platform.
    env_q = os.environ.get("BENCH_QUANT", "")
    quant = env_q == "1" or (env_q != "0" and on_accel)
    mode = "int8" if quant else ("bfloat16" if on_accel else "float32")
    # graceful degradation: int8+pallas -> bf16+pallas -> bf16 jnp decode
    attempts = [(quant, on_accel)]
    if on_accel:
        if quant:
            attempts.append((False, True))
        attempts.append((False, False))
    value = None
    for q, pallas in attempts:
        try:
            value = _measure(dev, BATCH if on_accel else CPU_BATCH,
                             "bfloat16" if on_accel else "float32",
                             iters=30 if on_accel else 2,
                             use_pallas=pallas, quant=q)
            mode = "int8" if q else ("bfloat16" if on_accel else "float32")
            break
        except Exception:
            if (q, pallas) == attempts[-1]:
                raise

    cpu_fps = None
    if os.path.exists(BASELINE_FILE) and not os.environ.get(
            "BENCH_REMEASURE_CPU"):
        with open(BASELINE_FILE) as f:
            cpu_fps = json.load(f).get("cpu_fps")
    if cpu_fps is None and on_accel:
        try:
            cpu = jax.devices("cpu")[0]
            cpu_fps = _measure(cpu, CPU_BATCH, "float32", iters=2, warmup=1)
            with open(BASELINE_FILE, "w") as f:
                json.dump({"cpu_fps": cpu_fps, "batch": CPU_BATCH}, f)
        except Exception:
            cpu_fps = None
    vs = (value / cpu_fps) if cpu_fps else 1.0

    print(json.dumps({
        "metric": "ICVL-style serving throughput (norm+hourglass s2f128"
                  "+vote decode, batch %d, %s, %s)" % (
                      BATCH if on_accel else CPU_BATCH, dev.platform, mode),
        "value": round(value, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
