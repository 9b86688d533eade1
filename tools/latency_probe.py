"""Serving latency across batch sizes (p50/p90 per-request device time).

Complements bench.py's throughput headline: a production deployment cares
about the latency of SMALL requests too (single frame, small bursts),
where the hourglass runs launch-bound rather than bandwidth-bound.
Measures the full serving program (normalize -> s2/f128 net -> vote
decode, calibrated int8 by default like the bench) at several batch
sizes.

Through a remote-relay-attached chip a single round trip is dominated by
the tunnel (~100 ms class), which says nothing about the chip — so like
bench.py the probe times CHAINED iterations (each feeds the next through
a data dependency, one scalar fetch at the end) and reports device-side
per-iteration time: the steady-state latency a locally-attached server
would see.  The reference has no serving surface to compare against
(its only inference path is the dataset-bound test driver,
/root/reference/model/test_model.py).

Usage: python tools/latency_probe.py [--batches 1,4,16,64,256]
       [--iters 30] [--no-quant]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bench import _build

    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,4,16,64,256")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-quant", action="store_true")
    args = ap.parse_args()

    dev = jax.devices()[0]
    on_accel = dev.platform != "cpu"
    quant = on_accel and not args.no_quant
    print(f"device: {dev.platform} ({dev}), "
          f"{'int8' if quant else 'bf16/f32'}", flush=True)

    rows = []
    for b in [int(x) for x in args.batches.split(",")]:
        with jax.default_device(dev):
            infer, variables, dms, cfgs, coms = _build(
                b, "bfloat16" if on_accel else "float32",
                use_pallas=on_accel, quant=quant)

            @jax.jit
            def chained(variables, dms, cfgs, coms):
                xyz = infer(variables, dms, cfgs, coms)
                return dms + jnp.sum(xyz) * 1e-24, xyz

            cur, xyz = chained(variables, dms, cfgs, coms)
            float(jnp.sum(xyz))  # compile + fence
            per_iter = []
            for _ in range(args.reps):
                cur = dms
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    cur, xyz = chained(variables, cur, cfgs, coms)
                float(jnp.sum(xyz))  # fence the chain
                per_iter.append((time.perf_counter() - t0) / args.iters)
        lat = min(per_iter)  # best rep == least relay interference
        rows.append({"batch": b, "latency_ms": round(lat * 1e3, 3),
                     "fps": round(b / lat, 1)})
        print(f"b={b:4d}: {lat*1e3:8.3f} ms/request  "
              f"({b/lat:9.1f} frames/s)", flush=True)

    print(json.dumps({"metric": "serving latency sweep", "rows": rows}))


if __name__ == "__main__":
    main()
