"""Persistent serving daemon: wire protocol, cross-client micro-batching,
error handling, and the CLI `serve` subcommand.

The reference has no persistent inference surface (its only serving path is
re-running /root/reference/model/test_model.py per evaluation); these tests
pin the daemon against the in-process Predictor as ground truth."""

import os
import signal
import subprocess
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from densereg_tpu.config import CameraConfig, NetConfig
from densereg_tpu.models import DenseRegNet
from densereg_tpu.serve import Client, Server
from densereg_tpu.serving import Predictor

ICVL = CameraConfig(fx=241.42, fy=241.42, cx=160, cy=120, w=320, h=240)
NET = NetConfig(num_stack=1, num_fea=8, num_joint=4, input_hw=(32, 32))
BBX = np.array([60, 80, 200, 260, 600], np.float32)


def _frames(rng, n):
    # integer-valued mm depth: exactly representable in BOTH u16 and f32,
    # so the two wire dtypes must produce identical results
    return rng.integers(300, 500, (n, 240, 320)).astype(np.float32)


@pytest.fixture(scope="module")
def pred():
    net = DenseRegNet(NET)
    variables = net.init({"params": jax.random.key(0)},
                         jnp.zeros((1, 32, 32, 1)), train=False)
    p = Predictor(variables, NET, ICVL, max_batch=4)
    # compile before the latency-sensitive batching assertions run
    p(np.full((1, 240, 320), 400, np.float32), BBX[None])
    return p


@pytest.fixture
def server(pred, tmp_path):
    with Server(pred, str(tmp_path / "s.sock"), window_ms=50) as s:
        yield s


def test_roundtrip_matches_direct(pred, server, rng):
    frames = _frames(rng, 3)
    bbxs = np.tile(BBX, (3, 1))
    want = pred(frames, bbxs)
    with Client(server.address) as c:
        assert c.ping()
        got = np.stack([c.predict(f, BBX) for f in frames])
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_pipelined_requests_are_microbatched(pred, tmp_path, rng):
    """8 requests submitted before any result is read must be coalesced
    into fewer device dispatches than requests (the whole point of the
    batching window)."""
    with Server(pred, str(tmp_path / "b.sock"), window_ms=300) as s:
        frames = _frames(rng, 8)
        bbxs = np.tile(BBX, (8, 1))
        with Client(s.address) as c:
            got = c.predict_batch(frames, bbxs)
            st = c.stats()
    np.testing.assert_allclose(got, pred(frames, bbxs), rtol=0, atol=1e-5)
    assert st["responses"] == 8
    assert st["batches"] < 8, st  # coalesced at all
    assert st["mean_batch"] > 1.5, st


def test_bucketed_predictor_through_daemon(tmp_path, rng):
    """A batch_buckets predictor behind the daemon: lone requests dispatch
    at the 1-bucket (result rows < max_batch) and answers still match the
    direct predictor."""
    net = DenseRegNet(NET)
    variables = net.init({"params": jax.random.key(0)},
                         jnp.zeros((1, 32, 32, 1)), train=False)
    p = Predictor(variables, NET, ICVL, max_batch=4, batch_buckets=(1, 2))
    p.warmup(with_u16=False)
    frames = _frames(rng, 3)
    bbxs = np.tile(BBX, (3, 1))
    want = p(frames, bbxs)
    with Server(p, str(tmp_path / "bk.sock"), window_ms=0) as s:
        with Client(s.address) as c:
            got = np.stack([c.predict(f, BBX) for f in frames])
            st = c.stats()
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)
    # window_ms=0 + sequential predict: every dispatch was a lone request
    assert st["batches"] == 3 and st["mean_batch"] == 1.0, st


def test_semantic_error_keeps_connection_usable(server, rng):
    with Client(server.address) as c:
        c.submit(np.full((16, 16), 400, np.float32), BBX)
        resp = c.recv()
        assert "error" in resp and "16, 16" in resp["error"]
        # connection survives a semantic error; next request succeeds
        xyz = c.predict(_frames(rng, 1)[0], BBX)
        assert xyz.shape == (12,) and np.isfinite(xyz).all()
        assert c.stats()["errors"] == 1


def test_u16_request_matches_f32(server, rng):
    f = _frames(rng, 1)[0]
    with Client(server.address) as c:
        np.testing.assert_array_equal(c.predict(f.astype(np.uint16), BBX),
                                      c.predict(f, BBX))


def test_tcp_transport(pred, rng):
    with Server(pred, "127.0.0.1:0", window_ms=10) as s:
        assert ":" in s.address  # resolved ephemeral port
        with Client(s.address) as c:
            xyz = c.predict(_frames(rng, 1)[0], BBX)
    assert xyz.shape == (12,)


def test_concurrent_clients_all_answered(pred, tmp_path, rng):
    frames = _frames(rng, 6)
    want = pred(frames, np.tile(BBX, (6, 1)))
    results, errs = {}, []

    def _one(i):
        try:
            with Client(srv.address) as c:
                results[i] = c.predict(frames[i], BBX)
        except Exception as e:  # surfaced below; keep the join running
            errs.append((i, e))

    with Server(pred, str(tmp_path / "c.sock"), window_ms=100) as srv:
        threads = [threading.Thread(target=_one, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
    assert not errs, errs
    for i in range(6):
        np.testing.assert_allclose(results[i], want[i], rtol=0, atol=1e-5)


class _SlowPredictor:
    """Throttled predictor wrapper: makes the device drain deterministically
    slower than a flooding client, so the backpressure test's sheds don't
    depend on host speed."""

    def __init__(self, inner, delay_s=0.1):
        self._inner, self._delay = inner, delay_s
        self.max_batch = inner.max_batch
        self.camera = inner.camera
        self.variables = inner.variables

    def _dispatch(self, frames, bbxs):
        time.sleep(self._delay)
        return self._inner._dispatch(frames, bbxs)


def test_backpressure_sheds_flood(pred, tmp_path, rng):
    """A client flooding faster than the device drains must not grow the
    pending queue beyond max_queue: excess requests get an immediate,
    well-formed 'overloaded' error, every accepted request is still
    answered, and the connection stays usable."""
    n = 64
    frame = _frames(rng, 1)[0]
    with Server(_SlowPredictor(pred), str(tmp_path / "f.sock"),
                window_ms=50, max_queue=3) as s:
        with Client(s.address) as c:
            for i in range(n):
                c.submit(frame, BBX, rid=i)
            ok = shed = 0
            for _ in range(n):
                resp = c.recv()
                if resp.get("error") == "overloaded":
                    shed += 1
                else:
                    assert len(resp["xyz"]) == 12
                    ok += 1
            st = c.stats()
            # the connection survives shedding; a follow-up request works
            assert np.isfinite(c.predict(frame, BBX)).all()
    assert ok + shed == n
    assert shed > 0, "flood never shed: queue bound not enforced"
    assert st["sheds"] == shed
    assert st["max_queue"] == 3 and st["queue_depth"] <= 3
    assert st["responses"] == ok  # every accepted request was answered


def test_exported_artifact_server(pred, tmp_path, rng):
    """The daemon serves a jax.export artifact (no model code needed) with
    the same results as the live predictor."""
    from densereg_tpu.export import export_predictor, load_exported

    path = str(tmp_path / "m.drexpt")
    export_predictor(pred, path, platforms=("cpu",))
    frames = _frames(rng, 2)
    with Server(load_exported(path), str(tmp_path / "e.sock"),
                window_ms=10) as s:
        with Client(s.address) as c:
            got = np.stack([c.predict(f, BBX) for f in frames])
            # u16 requests ride the artifact's u16 entry point (no f32
            # downgrade) and must match bit-for-bit
            got_u16 = c.predict(frames[0].astype(np.uint16), BBX)
    np.testing.assert_allclose(got, pred(frames, np.tile(BBX, (2, 1))),
                               rtol=0, atol=1e-5)
    np.testing.assert_array_equal(got_u16, got[0])


def test_cli_serve_subcommand(pred, tmp_path, rng):
    """End-to-end: `densereg_tpu serve --artifact` in a real subprocess —
    warmup, request, stats, clean SIGTERM shutdown."""
    from densereg_tpu.export import export_predictor

    art = str(tmp_path / "m.drexpt")
    export_predictor(pred, art, platforms=("cpu",))
    sock = str(tmp_path / "cli.sock")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    proc = subprocess.Popen(
        [sys.executable, "-m", "densereg_tpu.cli.main", "serve",
         "--artifact", art, "--socket", sock, "--window_ms", "5"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    try:
        deadline = time.time() + 180
        client = None
        while time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError(
                    f"serve exited early:\n{proc.stdout.read().decode()}")
            if os.path.exists(sock):
                try:
                    client = Client(sock)
                    break
                except (ConnectionError, OSError):
                    time.sleep(0.2)
            else:
                time.sleep(0.2)
        assert client is not None, "server never came up"
        assert client.ping()
        xyz = client.predict(_frames(rng, 1)[0], BBX)
        assert xyz.shape == (12,) and np.isfinite(xyz).all()
        assert client.stats()["responses"] == 1
        client.close()
    finally:
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=60)
    assert proc.returncode == 0, out.decode()
    assert "[serve] shutdown" in out.decode()
    assert not os.path.exists(sock)  # unix socket cleaned up


def test_serve_probe_net_mode(capsys):
    """tools/serve_probe.py --net self-hosts a random-init predictor at a
    named s<stack>f<fea> config and prints one JSON sweep row per inflight
    depth (the mode used to probe the daemon on hardware without a trained
    checkpoint)."""
    root = os.path.dirname(os.path.dirname(__file__))
    if root not in sys.path:
        sys.path.insert(0, root)
    from tools.serve_probe import main

    # window_ms=300: on a 1-core host the 2-deep pipelined pair must
    # reliably coalesce, or the cumulative mean_batch assertion below is
    # timing-dependent (same reasoning as
    # test_pipelined_requests_are_microbatched)
    assert main(["--net", "s1f8", "--max_batch", "2", "--requests", "4",
                 "--inflight", "1", "2", "--window_ms", "300"]) == 0
    rows = [r for r in capsys.readouterr().out.splitlines()
            if r.startswith("{")]
    assert len(rows) == 2
    import json as _json
    for depth, row in zip((1, 2), rows):
        rec = _json.loads(row)
        assert rec["inflight"] == depth and rec["requests"] == 4
        assert rec["fps"] > 0 and rec["p99_ms"] >= rec["p50_ms"]
    # pipelined clients must actually micro-batch; row_mean_batch is the
    # per-row delta (not diluted by the inflight-1 row or warmups)
    assert _json.loads(rows[1])["row_mean_batch"] > 1.0
    assert _json.loads(rows[1])["server_mean_batch"] > 1.0
