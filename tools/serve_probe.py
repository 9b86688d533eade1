"""Load-test the persistent serving daemon (densereg_tpu/serve.py).

Drives N pipelined requests at a running server (or self-hosts one from an
export artifact) and reports end-to-end client-side latency percentiles and
throughput, plus the server's own batching stats.

    # against a running daemon
    python tools/serve_probe.py --socket /tmp/densereg.sock --requests 512

    # self-hosted from an artifact (spawns the server in-process)
    python tools/serve_probe.py --artifact model.drexpt --requests 512 \
        --window_ms 2 --inflight 64

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
    return {
        "requests": requests,
        "inflight": inflight,
        "fps": round(requests / wall, 1),
        "p50_ms": round(_percentile(lat_ms, 0.50), 2),
        "p90_ms": round(_percentile(lat_ms, 0.90), 2),
        "p99_ms": round(_percentile(lat_ms, 0.99), 2),
        "server_mean_batch": round(stats["mean_batch"], 2),
        "server_batches": stats["batches"],
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--socket", default=None,
                    help="address of a RUNNING server (Unix path or "
                         "host:port)")
    ap.add_argument("--artifact", default=None,
                    help="self-host this jax.export artifact instead")
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
    if not (args.socket or args.artifact):
        ap.error("need --socket or --artifact")

    rng = np.random.default_rng(0)
    server = None
    try:
        if args.artifact:
            import tempfile

            from densereg_tpu.export import load_exported
            from densereg_tpu.serve import Server

            pred = load_exported(args.artifact)
            # compile before timing anything
            h, w = pred.frame_hw
            pred(np.zeros((1, h, w), np.float32),
                 np.asarray([[0, 0, h, w, 600.0]], np.float32))
            address = tempfile.mktemp(prefix="densereg_probe_",
                                      suffix=".sock")
            server = Server(pred, address, window_ms=args.window_ms)
            frame_hw = pred.frame_hw
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
