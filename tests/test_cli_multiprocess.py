"""End-to-end CLI training under ``jax.distributed`` (VERDICT r3 item 7).

``tests/test_multiprocess.py`` pins the pieces (partitioning, global-batch
assembly, step parity, multi-host eval) — here the full ``cmd_train`` path
runs as a real 2-process cluster: the SAME ``densereg_tpu.cli.main train``
command on each process (only ``--process_id`` differs), 4 virtual CPU
devices per process, through the production loop — InputPipeline's
multi-host shard partitioning, collective train steps over the global
8-device mesh, validation inference + keep_best collective best-save, and
collective Orbax checkpointing into ONE shared checkpoint tree.

This is the surface that supersedes the reference's (broken) multi-GPU
trainer (/root/reference/model/train_multi_gpu.py) for real: one command
per host, no tower loop, no in-graph gradient concat.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

NPROC = 2
STEPS = 10
DESC = "synthetic_training_s1_f8_in32_daug_um_v1"


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _cluster_env(cache_dir):
    """Worker env.  ``cache_dir`` must be FRESH and PER-PROCESS: reusing
    the long-lived persistent compile cache makes the two processes
    asymmetric (one loads AOT entries — sometimes rejecting them on
    machine-feature mismatch and recompiling — while the other compiles),
    which skews them past Gloo's hard-coded 30 s context-init window and
    diverges the collective bring-up order.  Fresh empty caches mean both
    processes always compile the same programs concurrently and reach each
    collective together."""
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "JAX_COMPILATION_CACHE_DIR": cache_dir,
        "PYTHONPATH": os.path.dirname(os.path.dirname(__file__)),
    })
    return env


def _run_cluster(make_cmd, what, attempts=2):
    """Run the same CLI command as an NPROC jax.distributed cluster.

    ``make_cmd(attempt)`` builds the per-attempt command (fresh output dirs
    for non-idempotent commands).  Retries once on the Gloo rendezvous
    race: XLA's CPU-collectives context init has a HARD-CODED 30 s
    key-exchange timeout, so on a loaded 1-core host one process can still
    be compiling when its peer reaches the first collective ("Gloo context
    initialization failed ... DEADLINE_EXCEEDED").  That is box contention,
    not a product failure — real multi-host TPU deployments don't share one
    core between processes.
    """
    import tempfile

    for attempt in range(attempts):
        coord = f"127.0.0.1:{_free_port()}"
        cmd = make_cmd(attempt) + ["--coordinator_address", coord,
                                   "--num_processes", str(NPROC)]
        procs = [subprocess.Popen(
                     cmd + ["--process_id", str(pid)],
                     env=_cluster_env(
                         tempfile.mkdtemp(prefix=f"climp_cache{pid}_")),
                     stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
                 for pid in range(NPROC)]
        outs = [p.communicate(timeout=900)[0].decode() for p in procs]
        if all(p.returncode == 0 for p in procs):
            return attempt, outs
        joined = "\n".join(outs)
        gloo_race = ("Gloo context initialization failed" in joined
                     and "DEADLINE_EXCEEDED" in joined)
        if not (gloo_race and attempt + 1 < attempts):
            for p, out in zip(procs, outs):
                assert p.returncode == 0, \
                    f"{what} process failed:\n{out[-4000:]}"
    raise AssertionError("unreachable")


@pytest.fixture(scope="module")
def cli_train_run(tmp_path_factory):
    outdir = tmp_path_factory.mktemp("climp")
    data_dir = str(outdir / "synth")
    # pre-generate so the two processes don't race on shard writing
    from densereg_tpu.data.base import get_dataset

    get_dataset("synthetic", "training", directory=data_dir)
    get_dataset("synthetic", "testing", directory=data_dir)

    def make_cmd(attempt):
        # fresh checkpoint tree per attempt: a half-written run must not
        # leak into the retry
        return [sys.executable, "-m", "densereg_tpu.cli.main", "train",
                "--dataset", "synthetic", "--data_dir", data_dir,
                "--input_size", "32", "--batch_size", "8",
                "--sub_batch", "1", "--num_stack", "1", "--num_fea", "8",
                "--compute_dtype", "float32",
                "--base_dir", str(outdir / f"cache{attempt}"),
                "--max_steps", str(STEPS), "--keep_best"]

    attempt, outs = _run_cluster(make_cmd, "CLI train")
    return os.path.join(str(outdir / f"cache{attempt}"), DESC), outs


def test_one_consistent_checkpoint(cli_train_run):
    """Both processes committed into ONE checkpoint tree; it restores to the
    final step with finite params on a single process."""
    train_dir, _ = cli_train_run
    import jax

    from densereg_tpu.config import NetConfig, TrainConfig
    from densereg_tpu.train import create_train_state
    from densereg_tpu.train.checkpoint import CheckpointManager

    net = NetConfig(num_stack=1, num_fea=8, num_joint=16,
                    input_hw=(32, 32), compute_dtype="float32")
    tcfg = TrainConfig(batch_size=8, sub_batch=1)
    state = create_train_state(jax.random.key(0), net, tcfg, 100.0)
    ckpt = CheckpointManager(os.path.join(train_dir, "ckpt"))
    assert ckpt.latest_step() == STEPS
    restored = ckpt.restore(state, STEPS)
    assert int(restored.step) == STEPS
    for leaf in jax.tree_util.tree_leaves(restored.params):
        assert np.isfinite(np.asarray(leaf)).all()
    ckpt.close()


def test_lead_only_artifacts(cli_train_run):
    """metrics.jsonl / summary events / best.json come from process 0 only;
    process 1 keeps its own suffixed text log."""
    train_dir, _ = cli_train_run
    assert os.path.exists(os.path.join(train_dir, "training_log.txt"))
    assert os.path.exists(os.path.join(train_dir, "training_log.p1.txt"))
    with open(os.path.join(train_dir, "metrics.jsonl")) as f:
        lines = [json.loads(line) for line in f]
    # one metrics record per summary cadence (steps 0) — duplicates would
    # mean a non-lead process wrote the shared stream
    steps = [r["step"] for r in lines]
    assert steps == sorted(set(steps)), steps
    events = os.listdir(os.path.join(train_dir, "summary"))
    assert len([e for e in events if "tfevents" in e]) == 1, events


def test_cli_eval_multiprocess(cli_train_run):
    """The CLI `test` subcommand under the same 2-process cluster: each
    process evaluates its contiguous shard range, rank 0 merges — one
    result dump with exactly exact_num lines and a 17-line error curve
    (eval.loop.evaluate_multihost through the real CLI entry)."""
    train_dir, _ = cli_train_run
    base_dir = os.path.dirname(train_dir)
    data_dir = os.path.join(os.path.dirname(base_dir), "synth")

    # idempotent command (rewrites its dumps), so the same cmd every attempt
    _run_cluster(lambda attempt: [
        sys.executable, "-m", "densereg_tpu.cli.main", "test",
        "--dataset", "synthetic", "--data_dir", data_dir,
        "--input_size", "32", "--batch_size", "8",
        "--num_stack", "1", "--num_fea", "8",
        "--compute_dtype", "float32", "--base_dir", base_dir,
    ], "CLI test")

    res = os.path.join(train_dir, f"testing-step{STEPS}-result.txt")
    assert os.path.exists(res), os.listdir(train_dir)
    from densereg_tpu.data.base import get_dataset

    spec = get_dataset("synthetic", "testing", directory=data_dir)
    lines = open(res).read().splitlines()
    assert len(lines) == spec.exact_num
    curve = open(os.path.join(
        train_dir, f"testing-step{STEPS}-result_error.txt"))
    assert len(curve.read().strip().splitlines()) == 17


def test_keep_best_collective_save(cli_train_run):
    """The keep_best collective path ran: marker exists (written by the
    lead), the best checkpoint restores, and both processes logged the same
    best error (identical collective ranking decisions)."""
    train_dir, outs = cli_train_run
    with open(os.path.join(train_dir, "best.json")) as f:
        best = json.load(f)
    assert np.isfinite(best["err"]) and best["step"] >= 0
    assert os.path.isdir(os.path.join(train_dir, "ckpt_best",
                                      str(best["step"])))
    for out in outs:
        assert "new best validation error" in out
