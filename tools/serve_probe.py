"""Load-test the persistent serving daemon (densereg_tpu/serve.py).

Drives N pipelined requests at a running server (or self-hosts one from an
export artifact) and reports end-to-end client-side latency percentiles and
throughput, plus the server's own batching stats.

    # against a running daemon
    python tools/serve_probe.py --socket /tmp/densereg.sock --requests 512

    # self-hosted from an artifact (spawns the server in-process)
    python tools/serve_probe.py --artifact model.drexpt --requests 512 \
        --window_ms 2 --inflight 64

    # self-hosted at the production net config with random-init weights
    # (latency/throughput is weight-independent; this is how the daemon is
    # probed on hardware without a trained checkpoint)
    python tools/serve_probe.py --net s2f128 --max_batch 64 --quantize \
        --requests 1024 --inflight 1 16 64 256

``--inflight`` is the client-side pipelining depth: how many requests are
kept outstanding (the server can only micro-batch what is concurrently in
flight, so this knob sweeps the latency/throughput curve from batch-1
latency to full-batch throughput).

The reference has no comparable surface — its closest analogue is the
offline test driver's sec/batch print (/root/reference/model/test_model.py:
60-68).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _percentile(sorted_vals, p):
    if not sorted_vals:
        return 0.0
    return sorted_vals[min(len(sorted_vals) - 1,
                           int(p * len(sorted_vals)))]


def run_probe(address: str, requests: int, inflight: int,
              frame_hw, rng) -> dict:
    from densereg_tpu.serve import Client

    h, w = frame_hw
    # integer-mm depth so u16 wire is exact; one shared frame buffer is
    # fine — the probe measures the serving path, not input diversity
    frame = rng.integers(300, 500, (h, w)).astype(np.uint16)
    bbx = [h // 4, w // 4, 3 * h // 4, 3 * w // 4, 600.0]

    with Client(address) as c:
        if not c.ping():
            raise SystemExit(f"server at {address} did not answer ping")
        # warm the program + client path
        c.predict(frame, bbx)
        # snapshot cumulative server counters so this row reports ITS OWN
        # coalescing, not the lifetime average (one self-hosted server
        # serves the whole sweep — lifetime mean_batch is dragged down by
        # the low-inflight rows; advisor r4 finding)
        s0 = c.stats()
        frames0 = s0["mean_batch"] * s0["batches"]
        t_submit = {}
        lat = []
        t0 = time.perf_counter()
        sent = recvd = 0
        while recvd < requests:
            while sent < requests and sent - recvd < inflight:
                rid = c.submit(frame, bbx, rid=sent)
                t_submit[rid] = time.perf_counter()
                sent += 1
            resp = c.recv()
            if "error" in resp:
                raise SystemExit(f"server error: {resp['error']}")
            lat.append(time.perf_counter() - t_submit.pop(resp["id"]))
            recvd += 1
        wall = time.perf_counter() - t0
        stats = c.stats()

    lat_ms = sorted(v * 1e3 for v in lat)
    row_batches = stats["batches"] - s0["batches"]
    row_frames = stats["mean_batch"] * stats["batches"] - frames0
    return {
        "requests": requests,
        "inflight": inflight,
        "fps": round(requests / wall, 1),
        "p50_ms": round(_percentile(lat_ms, 0.50), 2),
        "p90_ms": round(_percentile(lat_ms, 0.90), 2),
        "p99_ms": round(_percentile(lat_ms, 0.99), 2),
        "row_mean_batch": round(row_frames / max(row_batches, 1), 2),
        "server_mean_batch": round(stats["mean_batch"], 2),
        "server_batches": stats["batches"],
    }


def _net_predictor(desc: str, max_batch: int, quantize: bool,
                   batch_buckets=None):
    """Random-init Predictor at a named production config (serving latency
    and throughput do not depend on the weight values, so this probes the
    daemon on hardware without a trained checkpoint).  ``desc`` is
    s<stack>f<fea>, e.g. s2f128 — the reference's released ICVL model shape
    (/root/reference/exp/scripts/fetch_icvl_model.sh:3)."""
    import re

    import jax
    import jax.numpy as jnp

    from densereg_tpu.config import CameraConfig, NetConfig
    from densereg_tpu.models import DenseRegNet
    from densereg_tpu.serving import Predictor

    m = re.fullmatch(r"s(\d+)f(\d+)", desc)
    if not m:
        raise SystemExit(f"--net must look like s2f128, got {desc!r}")
    net_cfg = NetConfig(num_stack=int(m.group(1)), num_fea=int(m.group(2)),
                        num_joint=16, input_hw=(128, 128))
    icvl = CameraConfig(fx=241.42, fy=241.42, cx=160, cy=120, w=320, h=240)
    net = DenseRegNet(net_cfg)
    variables = net.init({"params": jax.random.key(0)},
                         jnp.zeros((1, 128, 128, 1)), train=False)
    return Predictor(variables, net_cfg, icvl, max_batch=max_batch,
                     quantize=quantize, batch_buckets=batch_buckets)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--socket", default=None,
                    help="address of a RUNNING server (Unix path or "
                         "host:port)")
    ap.add_argument("--artifact", default=None,
                    help="self-host this jax.export artifact instead")
    ap.add_argument("--net", default=None,
                    help="self-host a random-init net at this config "
                         "(e.g. s2f128) instead of a checkpoint/artifact")
    ap.add_argument("--max_batch", type=int, default=64,
                    help="--net mode: server-side micro-batch capacity")
    ap.add_argument("--quantize", action="store_true",
                    help="--net mode: serve the int8-weight graph")
    ap.add_argument("--batch_buckets", default=None,
                    help="--net mode: comma-separated dispatch-size ladder "
                         "(e.g. 1,8,64); lone requests ride the smallest "
                         "bucket instead of padding to max_batch")
    ap.add_argument("--requests", type=int, default=512)
    ap.add_argument("--inflight", type=int, default=None, nargs="+",
                    help="pipelining depth(s) to sweep (default: 1, "
                         "max_batch)")
    ap.add_argument("--window_ms", type=float, default=2.0,
                    help="self-hosted server batching window")
    ap.add_argument("--frame_hw", type=int, nargs=2, default=None,
                    help="frame size when probing a remote server "
                         "(default 240 320)")
    args = ap.parse_args(argv)
    if not (args.socket or args.artifact or args.net):
        ap.error("need --socket, --artifact, or --net")

    rng = np.random.default_rng(0)
    server = None
    try:
        if args.artifact or args.net:
            import tempfile

            from densereg_tpu.serve import Server

            if args.artifact:
                from densereg_tpu.export import load_exported
                pred = load_exported(args.artifact)
                h, w = pred.frame_hw
            else:
                buckets = (tuple(int(v) for v in
                                 args.batch_buckets.split(",") if v)
                           if args.batch_buckets else None)
                pred = _net_predictor(args.net, args.max_batch,
                                      args.quantize, buckets)
                h, w = int(pred.camera.h), int(pred.camera.w)
            # compile/run every (bucket, dtype) program before timing
            # anything (u16 is a second program where the predictor
            # accepts it natively; bucketed predictors and bucket-ladder
            # artifacts have one program per rung)
            pred.warmup(with_u16=pred.accepts_u16)
            address = tempfile.mktemp(prefix="densereg_probe_",
                                      suffix=".sock")
            server = Server(pred, address, window_ms=args.window_ms)
            frame_hw = (h, w)
            default_sweep = [1, pred.max_batch]
        else:
            address = args.socket
            frame_hw = tuple(args.frame_hw or (240, 320))
            default_sweep = [1, 64]

        for depth in (args.inflight or default_sweep):
            res = run_probe(address, args.requests, depth, frame_hw, rng)
            print(json.dumps(res))
    finally:
        if server is not None:
            server.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
