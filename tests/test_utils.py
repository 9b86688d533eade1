import json
import os
import sys

import jax
import numpy as np

from densereg_tpu.utils.device import default_device, topology_report, visible_devices
from densereg_tpu.utils.logging import MetricLogger, TrainLogWriter
from densereg_tpu.utils.profiling import StepTimer

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_topology_and_visibility(monkeypatch):
    report = topology_report()
    assert "default backend: cpu" in report
    assert len(visible_devices()) == 8
    monkeypatch.setenv("DENSEREG_VISIBLE_DEVICES", "0,3")
    devs = visible_devices()
    assert [d.id for d in devs] == [0, 3]
    assert default_device().id == 0


def test_train_log_writer_format(tmp_path):
    w = TrainLogWriter(str(tmp_path))
    w.log_step(5, 100, 1.234, 0.5, 0.01, echo=False)
    w.close()
    text = open(os.path.join(tmp_path, "training_log.txt")).read()
    assert "step 5/100" in text and "sec/batch" in text and "sec/sample" in text


def test_metric_logger_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    m = MetricLogger(path)
    m.log(3, loss=1.5, tag="x")
    m.close()
    rec = json.loads(open(path).read().strip())
    assert rec["step"] == 3 and rec["loss"] == 1.5 and rec["tag"] == "x"


def test_step_timer():
    import time
    t = StepTimer(warmup=1)
    for _ in range(3):
        with t:
            time.sleep(0.01)
    assert 0.005 < t.mean < 0.2 and t.count == 3


def test_ema_params_track_params(rng):
    import jax.numpy as jnp
    from densereg_tpu.config import NetConfig, TrainConfig
    from densereg_tpu.train import create_train_state, make_train_step
    from tests.test_train import make_batch

    net = NetConfig(num_stack=1, num_fea=8, num_joint=3, input_hw=(32, 32))
    tcfg = TrainConfig(batch_size=2, sub_batch=1, augment=False,
                       ema_decay=0.5)
    state = create_train_state(jax.random.key(0), net, tcfg, 10.0)
    assert state.ema_params is not None
    step = make_train_step(net, tcfg, donate=False)
    batch = make_batch(rng, 1, 2)
    s1, _ = step(state, batch, jax.random.key(1))
    # ema = 0.5*init + 0.5*new for every leaf
    for e, p0, p1 in zip(jax.tree_util.tree_leaves(s1.ema_params),
                         jax.tree_util.tree_leaves(state.params),
                         jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(e),
                                   0.5 * np.asarray(p0) + 0.5 * np.asarray(p1),
                                   rtol=1e-5, atol=1e-7)


def test_ema_recursion_post_update_semantics(rng):
    """Pins the EMA recursion over MULTIPLE steps: shadows track the
    POST-update params deterministically, ema_t = d*ema_{t-1} +
    (1-d)*params_t (DEVIATIONS.md #17 — the reference's
    ``tf.group(apply_gradients, ema_op)`` leaves the read order unspecified
    and ramps the decay by global_step, train_multi_gpu.py:108-117)."""
    import jax.numpy as jnp
    from densereg_tpu.config import NetConfig, TrainConfig
    from densereg_tpu.train import create_train_state, make_train_step
    from tests.test_train import make_batch

    net = NetConfig(num_stack=1, num_fea=8, num_joint=3, input_hw=(32, 32))
    d = 0.8
    tcfg = TrainConfig(batch_size=2, sub_batch=1, augment=False,
                       ema_decay=d)
    state = create_train_state(jax.random.key(0), net, tcfg, 10.0)
    step = make_train_step(net, tcfg, donate=False)
    ema = [np.asarray(leaf) for leaf in
           jax.tree_util.tree_leaves(state.params)]
    for i in range(3):
        state, _ = step(state, make_batch(rng, 1, 2), jax.random.key(i))
        ema = [d * e + (1 - d) * np.asarray(p) for e, p in
               zip(ema, jax.tree_util.tree_leaves(state.params))]
    for e_ref, e_got in zip(ema, jax.tree_util.tree_leaves(state.ema_params)):
        np.testing.assert_allclose(np.asarray(e_got), e_ref,
                                   rtol=1e-5, atol=1e-7)


def test_trace_summary_tool(tmp_path):
    """tools/trace_summary.py digests a Chrome-trace export into per-op
    rows (the terminal profiling story; no TensorBoard needed)."""
    import gzip
    import json
    import subprocess
    import sys

    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 1, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 7, "tid": 1, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "X", "pid": 3, "tid": 1, "name": "fusion.1", "ts": 0,
         "dur": 3000},
        {"ph": "X", "pid": 3, "tid": 1, "name": "fusion.1", "ts": 4000,
         "dur": 1000},
        {"ph": "X", "pid": 3, "tid": 1, "name": "conv.2", "ts": 9000,
         "dur": 1000},
        # host-side event with the same line name must NOT be counted
        {"ph": "X", "pid": 7, "tid": 1, "name": "hostwork", "ts": 0,
         "dur": 99999},
    ]
    d = tmp_path / "plugins" / "profile" / "x"
    d.mkdir(parents=True)
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)

    out = subprocess.run(
        [sys.executable, "tools/trace_summary.py", str(tmp_path),
         "--steps", "2"],
        capture_output=True, text=True, cwd=ROOT)
    assert out.returncode == 0, out.stderr
    assert "total 2.50 ms/step" in out.stdout
    lines = [l for l in out.stdout.splitlines() if "fusion.1" in l]
    assert lines and "2.000" in lines[0] and "80.0" in lines[0]
    assert "hostwork" not in out.stdout


def test_sol_report_roofline_math():
    """tools/sol_report.py: peak-table lookup and roofline arithmetic."""
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    import sol_report

    class Dev:
        device_kind = "TPU v5 lite"

    key, peaks = sol_report.chip_peaks(Dev())
    assert key == "v5e" and peaks == (197.0, 394.0, 819.0)

    class Cpu:
        device_kind = "cpu"

    assert sol_report.chip_peaks(Cpu()) == (None, None)

    # compute-bound program: 19.7 TF at v5e's 197 TF/s peak -> sol 100 ms
    row = sol_report.report_line("x", 19.7e12, 8.19e9, 0.2, peaks)
    assert row["bound"] == "compute"
    assert abs(row["sol_ms"] - 100.0) < 1e-6
    assert abs(row["sol_pct"] - 50.0) < 1e-6
    # memory-bound: 81.9 GB at 819 GB/s -> sol 100 ms
    row = sol_report.report_line("y", 1e9, 81.9e9, 0.4, peaks)
    assert row["bound"] == "memory"
    assert abs(row["sol_ms"] - 100.0) < 1e-6
    assert abs(row["hbm_pct"] - 25.0) < 1e-6
    # int8 peak selection
    row = sol_report.report_line("z", 39.4e12, 1e6, 0.1, peaks, int8=True)
    assert abs(row["sol_ms"] - 100.0) < 1e-6
