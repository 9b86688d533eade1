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

JSON contract — exactly one line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N,
   "platform": "<jax device platform the primary metric ran on>"}
plus, when the harness fell back to the CPU backend because the
accelerator was unreachable (relay outage — VERDICT r3 weak #2),
  "degraded": true
so cross-round tooling never mistakes a fallback line for a throughput
regression.  A deliberate CPU run (JAX_PLATFORMS=cpu from the caller) is
NOT marked degraded; only the in-harness re-exec sets it.  Likewise, when
the host's 1-minute load average at capture start exceeds BENCH_LOAD_LIMIT
x cpu_count (default 0.75 — another job is competing for the CPU that
feeds the chip), the line carries
  "contended": true, "load1": N
(VERDICT r4 weak #5: round 4's run-2 eval-loop number was a contention
artifact); BENCH_REFUSE_CONTENDED=1 exits(3) instead of measuring.

On accelerators the object also carries secondary metrics (VERDICT r2
item 6; BENCH_TRAIN=0 / BENCH_EVAL=0 disable):
  "train_samples_per_sec" — train step at the reference 40x5 config;
  "eval_loop_fps" — streaming host-fed eval loop (transfer-bound through
  a remote-attached chip; compare only against other host-loop numbers);
  "eval_loop_wire" — the host->device feed dtype for that number;
  "eval_loop_feed" — "test_pipeline" (default from round 4: the REAL
  TestPipeline with host-CPU crop, the same code the CLI `test` runs) or
  "arrays" (BENCH_FEED=arrays: the r3-style pre-generated-array feed —
  use it when comparing against r3 captures).
A failed secondary measurement drops its key and logs the exception to
stderr (never silently — ADVICE r3).

BENCH_STACK/BENCH_FEA/BENCH_JOINT/BENCH_INPUT shrink the network (contract
tests use a tiny config; production defaults match the flagship s2/f128).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "256"))
CPU_BATCH = int(os.environ.get("BENCH_CPU_BATCH", "4"))
STACK = int(os.environ.get("BENCH_STACK", "2"))
FEA = int(os.environ.get("BENCH_FEA", "128"))
JOINT = int(os.environ.get("BENCH_JOINT", "16"))
INPUT = int(os.environ.get("BENCH_INPUT", "128"))
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

    net_cfg = NetConfig(num_stack=STACK, num_fea=FEA, num_joint=JOINT,
                        input_hw=(INPUT, INPUT), compute_dtype=compute_dtype)
    net = DenseRegNet(net_cfg)
    rng = np.random.default_rng(0)
    dms = jnp.asarray(
        rng.uniform(300.0, 500.0, (batch, INPUT, INPUT, 1))
        .astype(np.float32))
    variables = net.init({"params": jax.random.key(0)},
                         jnp.zeros((1, INPUT, INPUT, 1)), train=False)
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
    cfgs = jnp.tile(geometry.scale_cfg(icvl.as_array(), INPUT, INPUT)[None],
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
    return batch * iters / dt, (infer, variables, cfgs, coms)


def _measure_train(device, iters=5, blocks=3):
    """Train-step samples/s at the reference config (batch 40 x sub_batch 5,
    augmented, bf16); iterations chain through the carried TrainState.

    The compiled step is timed in several independent blocks and the BEST
    block is reported: through the relay a single block occasionally lands
    on a queue hiccup and reads 10-15x slow (observed 95 vs ~1,440
    samples/s on back-to-back runs of the same program), while the best of
    three tracks the device time (BASELINE.md: 137 ms at 40x5)."""
    import jax
    import jax.numpy as jnp

    from densereg_tpu import geometry
    from densereg_tpu.config import CameraConfig, NetConfig, TrainConfig
    from densereg_tpu.train import create_train_state, make_train_step

    with jax.default_device(device):
        net_cfg = NetConfig(num_stack=2, num_fea=128, num_joint=16,
                            input_hw=(128, 128), compute_dtype="bfloat16")
        tcfg = TrainConfig(batch_size=40, sub_batch=5, augment=True)
        state = create_train_state(jax.random.key(0), net_cfg, tcfg, 1e6)
        step_fn = make_train_step(net_cfg, tcfg, donate=False)
        rng = np.random.default_rng(0)
        sub, bb = tcfg.sub_batch, tcfg.batch_size
        icvl = CameraConfig(fx=241.42, fy=241.42, cx=160, cy=120,
                            w=320, h=240)
        cfg128 = geometry.scale_cfg(jnp.asarray(icvl.as_array()), 128, 128)
        poses = np.zeros((sub, bb, 16, 3), np.float32)
        poses[..., 0] = rng.uniform(-40, 40, (sub, bb, 16))
        poses[..., 1] = rng.uniform(-40, 40, (sub, bb, 16))
        poses[..., 2] = rng.uniform(360, 440, (sub, bb, 16))
        batch = {
            "dm": jnp.asarray(rng.uniform(300, 500, (sub, bb, 128, 128, 1))
                              .astype(np.float32)),
            "pose": jnp.asarray(poses.reshape(sub, bb, -1)),
            "cfg": jnp.tile(cfg128[None, None], (sub, bb, 1)),
            "com": jnp.asarray(poses.mean(axis=2)),
        }
        key = jax.random.key(1)
        s, _ = step_fn(state, batch, key)
        float(s.renorm_t)  # warm compile + fence
        best = float("inf")
        for _ in range(blocks):
            t0 = time.perf_counter()
            s = state
            for _ in range(iters):
                s, _ = step_fn(s, batch, key)
            float(jnp.sum(jax.tree_util.tree_leaves(s.params)[0]))
            best = min(best, (time.perf_counter() - t0) / iters)
    return sub * bb / best


def _measure_eval_loop(infer, variables, cfgs, coms, batch, n_batches=4,
                       blocks=2, wire="uint16"):
    """Streaming eval-loop fps: fresh PRE-GENERATED host batches transferred
    each iteration through the already-compiled serving program, dispatched
    with one batch in flight (the double-buffered eval pattern).  On a
    remote-attached chip this is transfer-bound and relay-dependent; the
    value is comparable only to other host-loop numbers (BASELINE.md).
    Best of ``blocks`` timed blocks, for the same hiccup reason as
    ``_measure_train``.

    ``wire="uint16"`` (the default, BENCH_WIRE=f32 to disable) feeds the
    per-batch fixed-point uint16 crop encoding (densereg_tpu.wire) — the
    production ``--host_preprocess --wire_dtype uint16`` feed: half the
    bytes over the transfer-bound link, <=0.005 mm quantization."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    host = [rng.uniform(300.0, 500.0, (batch, INPUT, INPUT, 1))
            .astype(np.float32) for _ in range(n_batches)]
    if wire == "uint16":
        from densereg_tpu.wire import encode_dm_u16
        host = [encode_dm_u16(h) for h in host]
        feed = lambda h: infer(variables, jnp.asarray(h[0]), cfgs, coms,
                               jnp.asarray(h[1]))
    else:
        feed = lambda h: infer(variables, jnp.asarray(h), cfgs, coms)
    out = feed(host[0])
    float(jnp.sum(out))  # fence warmup
    best = float("inf")
    for _ in range(blocks):
        t0 = time.perf_counter()
        last = None
        for h in host:
            last = feed(h)
        float(jnp.sum(last))  # device executes in order -> fences each batch
        best = min(best, time.perf_counter() - t0)
    return batch * n_batches / best


def _measure_eval_loop_real(infer, variables, batch, n_frames=None,
                            wire="uint16", passes=2):
    """Production feed path (VERDICT r3 #5): the actual ``TestPipeline``
    (host-CPU crop + uint16 wire codec, exactly what the CLI
    ``test --host_preprocess --wire_dtype uint16`` runs) streamed through
    ``evaluate_stream`` over synthetic shards — the benched loop IS the
    production loop (/root/reference/data/dataset_base.py:210-237 +
    /root/reference/model/test_model.py:60-88 equivalent).

    Shards are generated once and cached under /tmp; fps comes from
    ``evaluate_stream``'s own report.  Best of ``passes`` warm passes
    (relay-hiccup rule, see _measure_train)."""
    from densereg_tpu.data.base import get_dataset
    from densereg_tpu.data.pipeline import TestPipeline
    from densereg_tpu.eval.loop import evaluate_stream

    n_frames = n_frames or batch * 4
    spec = get_dataset(
        "synthetic", "testing",
        directory=os.environ.get("BENCH_SYNTH_DIR", "/tmp/bench_synth"),
        num_shards=max(1, n_frames // 256), samples_per_shard=min(256, n_frames))
    n_frames = min(n_frames, spec.exact_num)

    def one_pass():
        pipe = TestPipeline(spec, batch, input_hw=(INPUT, INPUT),
                            host_preprocess=True, wire_dtype=wire)
        return evaluate_stream(infer, variables, iter(pipe), n_frames,
                               log_fn=lambda *a: None)

    one_pass()  # warm: compile + shard decode cache
    return max(one_pass()["fps"] for _ in range(passes))


def _devices_or_cpu_reexec(
        timeout_s: float = float(os.environ.get("BENCH_ATTACH_TIMEOUT",
                                                "300"))):
    """Return jax.devices(), surviving an unreachable accelerator.

    Through the remote relay a dead pool makes ``jax.devices()`` HANG
    inside the plugin (observed 2026-08-17: multi-hour outage; TERM is
    ignored mid-attach), which would turn the whole benchmark into a
    silent timeout.  The backend is probed in a daemon thread; if it
    neither returns nor errors within ``timeout_s``, or errors with the
    backend-init failure, the process re-execs itself pinned to the CPU
    backend so ONE JSON line is still emitted (platform "cpu" marks the
    degraded run).  Healthy accelerators attach in seconds — the watchdog
    is inert there."""
    import threading

    out = {}

    def probe():
        try:
            import jax

            out["devices"] = jax.devices()
        except Exception as e:  # RuntimeError: unable to initialize backend
            out["error"] = e

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" in out:
        return out["devices"]
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        raise RuntimeError(f"CPU backend failed: {out.get('error')}")
    sys.stderr.write(
        f"[bench] accelerator unreachable "
        f"({'hang' if 'error' not in out else out['error']}); "
        f"re-executing on the CPU backend\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               BENCH_DEGRADED="1")
    os.execve(sys.executable,
              [sys.executable, os.path.abspath(__file__)], env)


def _contention():
    """Capture-hygiene guard (VERDICT r4 weak #5): a bench run on a host
    that is simultaneously running other CPU-heavy work (e.g. the test
    suite on this 1-core image) measures the CONTENTION, not the program —
    round 4's run-2 artifact read 124 fps eval-loop for exactly this
    reason.  The 1-minute load average is sampled at start; above
    BENCH_LOAD_LIMIT x cpu_count (default 0.75) the JSON line carries
    ``"contended": true`` plus the observed load, so no tooling can
    mistake the capture for a regression.  BENCH_REFUSE_CONTENDED=1 makes
    the harness exit(3) instead of measuring at all."""
    try:
        load1 = os.getloadavg()[0]
    except (OSError, AttributeError):
        return {}
    ncpu = os.cpu_count() or 1
    limit = float(os.environ.get("BENCH_LOAD_LIMIT", "0.75")) * ncpu
    if load1 <= limit:
        return {}
    msg = (f"[bench] host contended at capture start: load1={load1:.2f} "
           f"with {ncpu} cpu(s), limit {limit:.2f}")
    if os.environ.get("BENCH_REFUSE_CONTENDED") == "1":
        sys.stderr.write(msg + "; refusing to measure\n")
        sys.exit(3)
    sys.stderr.write(msg + "; marking the capture contended\n")
    return {"contended": True, "load1": round(load1, 2)}


def main():
    contended = _contention()
    dev = _devices_or_cpu_reexec()[0]

    import jax

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
    value, ctx = None, None
    for q, pallas in attempts:
        try:
            value, ctx = _measure(dev, BATCH if on_accel else CPU_BATCH,
                                  "bfloat16" if on_accel else "float32",
                                  iters=30 if on_accel else 2,
                                  use_pallas=pallas, quant=q)
            mode = "int8" if q else ("bfloat16" if on_accel else "float32")
            break
        except Exception:
            if (q, pallas) == attempts[-1]:
                raise

    # secondary metrics (VERDICT r2 item 6): train-step samples/s and the
    # streaming eval-loop fps, emitted as extra keys on the same JSON object
    # (the primary metric/value/unit/vs_baseline contract is unchanged).
    # Default on for accelerators; BENCH_TRAIN=0 / BENCH_EVAL=0 disable.
    extras = {}
    if on_accel and os.environ.get("BENCH_EVAL", "1") == "1" and ctx:
        wire = "float32" if os.environ.get("BENCH_WIRE") == "f32" \
            else "uint16"
        # default feed is the REAL TestPipeline (VERDICT r3 #5: the benched
        # path is the production path); BENCH_FEED=arrays reverts to the
        # r3-style pre-generated-array transfer measurement
        real_feed = os.environ.get("BENCH_FEED", "pipeline") != "arrays"
        for w in ([wire, "float32"] if wire == "uint16" else [wire]):
            try:
                if real_feed:
                    extras["eval_loop_fps"] = round(_measure_eval_loop_real(
                        ctx[0], ctx[1], BATCH, wire=w), 2)
                    extras["eval_loop_feed"] = "test_pipeline"
                else:
                    extras["eval_loop_fps"] = round(_measure_eval_loop(
                        ctx[0], ctx[1], ctx[2], ctx[3], BATCH, wire=w), 2)
                    extras["eval_loop_feed"] = "arrays"
                extras["eval_loop_wire"] = w
                break
            except Exception:
                # never silent (ADVICE r3): a regression in the eval-loop
                # measurement path must be diagnosable from the capture
                import traceback
                sys.stderr.write(f"[bench] eval_loop_fps (wire={w}) "
                                 f"failed:\n{traceback.format_exc()}")
    if on_accel and os.environ.get("BENCH_TRAIN", "1") == "1":
        try:
            extras["train_samples_per_sec"] = round(_measure_train(dev), 2)
        except Exception:
            import traceback
            sys.stderr.write(
                f"[bench] train_samples_per_sec failed:\n"
                f"{traceback.format_exc()}")

    cpu_fps = None
    if os.path.exists(BASELINE_FILE) and not os.environ.get(
            "BENCH_REMEASURE_CPU"):
        try:
            with open(BASELINE_FILE) as f:
                cpu_fps = json.load(f).get("cpu_fps")
        except (json.JSONDecodeError, OSError):
            cpu_fps = None  # corrupt/partial file: fall through to remeasure
    if cpu_fps is None and on_accel:
        try:
            cpu = jax.devices("cpu")[0]
            cpu_fps, _ = _measure(cpu, CPU_BATCH, "float32", iters=2,
                                  warmup=1)
            if (STACK, FEA, JOINT, INPUT) == (2, 128, 16, 128):
                # only cache the flagship-config baseline — a tiny-knob
                # run must never overwrite the committed reference number
                with open(BASELINE_FILE, "w") as f:
                    json.dump({"cpu_fps": cpu_fps, "batch": CPU_BATCH}, f)
        except Exception:
            cpu_fps = None
    vs = (value / cpu_fps) if cpu_fps else 1.0

    degraded = {"degraded": True} if os.environ.get("BENCH_DEGRADED") else {}
    print(json.dumps({
        "metric": "ICVL-style serving throughput (norm+hourglass s%df%d"
                  "+vote decode, batch %d, %s, %s)" % (
                      STACK, FEA,
                      BATCH if on_accel else CPU_BATCH, dev.platform, mode),
        "value": round(value, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(vs, 2),
        "platform": dev.platform,
        **degraded,
        **contended,
        **extras,
    }))


if __name__ == "__main__":
    sys.exit(main())
