"""Streaming evaluation: batches -> jitted forward+decode -> result dump.

Equivalent of the reference test driver (/root/reference/model/test_model.py)
+ the decode graph of ``JointDetectionModel.test``
(/root/reference/model/hourglass_um_crop_tiny.py:442-527): one jitted
function runs normalization, the network in eval mode, offset reconstruction
and mean-shift decoding; the host loop only feeds batches, writes predictions
and accumulates the error curve, stopping exactly at ``exact_num`` frames.
"""

from __future__ import annotations

import time
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from densereg_tpu import decode as decode_mod
from densereg_tpu.config import EvalConfig, NetConfig
from densereg_tpu.eval.metrics import max_joint_error, summarize_percentages
from densereg_tpu.eval.writer import ResultWriter, write_error_curve
from densereg_tpu.models import DenseRegNet
from densereg_tpu.preprocess import method2_resize, norm_dm


def make_infer_fn(net_cfg: NetConfig, ecfg: EvalConfig = EvalConfig(),
                  mesh=None) -> Callable:
    """Returns jitted ``infer(variables, dms, cfgs, coms[, dm_scale])`` ->
    ``xyz (b, 3j)``.

    ``dms`` are raw-mm cropped depth maps (b, H, W, 1).  When the feed uses
    the uint16 wire codec (densereg_tpu.wire), pass the per-batch
    ``dm_scale`` array and ``dms`` as uint16 — the dequantize multiply is
    traced into the same program, so XLA fuses it with the normalize pass
    (no extra HBM round trip).  With ``mesh`` the batch is annotated to
    shard over the ``data`` axis for multi-chip batch-parallel serving.
    """
    net = DenseRegNet(net_cfg)
    out_h, out_w = net_cfg.output_hw

    def infer(variables, dms, cfgs, coms, dm_scale=None):
        dms = dms.astype(jnp.float32)
        if dm_scale is not None:
            dms = dms * dm_scale
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh = NamedSharding(mesh, P(tuple(mesh.axis_names)))
            dms = jax.lax.with_sharding_constraint(dms, sh)
        normed = norm_dm(dms, coms)
        outs = net.apply(variables, normed, train=False)
        hms = outs["hm"][-1]
        hm3s = outs["hm3"][-1]
        ums = outs["um"][-1]
        # method-2 shrink of the test graph, hourglass_um_crop_tiny.py:453
        tiny = method2_resize(normed, out_h, out_w)
        res = decode_mod.decode_poses(hms, hm3s, ums, tiny, cfgs, coms, ecfg)
        return res["xyz"]

    return jax.jit(infer)


def evaluate_stream(infer_fn, variables, batches: Iterable[dict],
                    exact_num: int, result_path: Optional[str] = None,
                    error_path: Optional[str] = None, log_every: int = 101,
                    log_fn=print):
    """Run inference over a batch stream and dump reference-format results.

    Args:
      batches: iterable of dicts with ``dm``, ``cfg``, ``com``, ``name`` and
        optionally ``pose`` (GT for the error curve).  Batches past
        ``exact_num`` total frames are truncated (the reference stops at
        ``exact_num``, /root/reference/model/test_model.py:79-83).
    Returns:
      dict with ``num_frames``, ``max_errors`` (list, empty if no GT),
      ``percentages``, ``fps``.
    """
    writer = ResultWriter(result_path) if result_path else None
    max_errors = []
    n_done = 0
    t0 = time.time()

    def consume(xyz_dev, batch, step):
        """Materialize one dispatched batch and write/score it."""
        nonlocal n_done
        xyz = np.asarray(xyz_dev)   # blocks; next batch already dispatched
        names = batch.get("name")
        take = min(len(xyz), exact_num - n_done)
        xyz = xyz[:take]
        if "pose" in batch and batch["pose"] is not None:
            gt = np.asarray(batch["pose"])[:take]
            max_errors.extend(np.asarray(max_joint_error(xyz, gt)).tolist())
        if writer is not None and names is not None:
            writer.write_batch(names[:take], xyz)
        n_done += take
        if log_every and step % log_every == 0:
            dt = time.time() - t0
            log_fn(f"[eval] {n_done}/{exact_num} frames, "
                   f"{n_done / max(dt, 1e-9):.1f} fps")

    # Double-buffered host loop: dispatch batch k+1 (async under jit) BEFORE
    # blocking on batch k's result, so host preprocessing + transfer overlap
    # device compute.  The reference's session loop is fully synchronous
    # (/root/reference/model/test_model.py:60-66).
    pending = None
    try:
        for step, batch in enumerate(batches):
            scale = batch.get("dm_scale")
            xyz_dev = (infer_fn(variables, batch["dm"], batch["cfg"],
                                batch["com"], scale)
                       if scale is not None else
                       infer_fn(variables, batch["dm"], batch["cfg"],
                                batch["com"]))
            if pending is not None:
                consume(*pending)
                if n_done >= exact_num:
                    pending = None
                    break
            pending = (xyz_dev, batch, step)
        if pending is not None and n_done < exact_num:
            consume(*pending)
    finally:
        if writer is not None:
            writer.close()
    if error_path and max_errors:
        write_error_curve(max_errors, error_path)
    dt = time.time() - t0
    return {
        "num_frames": n_done,
        "max_errors": max_errors,
        "percentages": summarize_percentages(max_errors) if max_errors else {},
        "fps": n_done / max(dt, 1e-9),
    }


def evaluate_multihost(infer_fn, variables, spec, batch_size, input_hw,
                       result_path, error_path=None, log_fn=print,
                       host_preprocess: bool = False,
                       wire_dtype: str = "float32") -> dict:
    """Multi-process evaluation: shard-partitioned, rank-0 result merge.

    The reference test driver is strictly single-process
    (/root/reference/model/test_model.py); under ``jax.distributed`` this
    runs it embarrassingly parallel instead: each process evaluates a
    CONTIGUOUS range of the deduped shard list on its own local devices
    (no cross-host collective — eval has no gradient to synchronize),
    writes ``<result_path>.part<k>``, and process 0 concatenates the
    parts in shard order, so the merged dump is line-for-line identical
    to a single-process run.  The reference ``exact_num`` truncation is
    preserved globally by clamping each host's local frame budget against
    the dataset-order cumulative count.

    Returns the merged report on process 0 ({"num_frames": global, ...});
    other processes return their local report.  ``result_path`` is
    required (the part files are the merge transport) and must be
    IDENTICAL across processes — derive it from shared state (checkpoint
    step), never from per-host wall clock.
    """
    import os

    import jax
    from jax.experimental import multihost_utils

    from densereg_tpu.data.pipeline import TestPipeline

    if not result_path:
        raise ValueError("evaluate_multihost requires result_path "
                         "(part files are the merge transport)")
    nproc = jax.process_count()
    host = jax.process_index()

    probe = TestPipeline(spec, batch_size, input_hw)
    readers = probe.unique_readers()
    counts = [len(r) for r in readers]
    base, rem = divmod(len(readers), nproc)
    lo = host * base + min(host, rem)
    hi = lo + base + (1 if host < rem else 0)
    cum_before = sum(counts[:lo])
    local_total = sum(counts[lo:hi])
    local_exact = max(
        0, min(cum_before + local_total, spec.exact_num) - cum_before)
    log_fn(f"[eval mh] process {host}/{nproc}: shards [{lo},{hi}) "
           f"({local_exact} frames)")

    pipe = TestPipeline(spec, batch_size, input_hw,
                        host_preprocess=host_preprocess,
                        wire_dtype=wire_dtype, shard_slice=slice(lo, hi))
    part_res = f"{result_path}.part{host}"
    report = evaluate_stream(infer_fn, variables, iter(pipe), local_exact,
                             part_res, None, log_fn=log_fn)
    np.save(f"{result_path}.errs{host}.npy",
            np.asarray(report["max_errors"], np.float64))

    multihost_utils.sync_global_devices("densereg_eval_parts")
    if host == 0:
        merged_errors = []
        n_merged = 0
        with open(result_path, "w") as out:
            for h in range(nproc):
                part = f"{result_path}.part{h}"
                if not os.path.exists(part):
                    # every host writes its part (possibly empty) before the
                    # barrier; a missing file means result_path is not on a
                    # filesystem all hosts share — refuse to emit a silently
                    # truncated dump
                    raise FileNotFoundError(
                        f"{part} missing after the parts barrier: "
                        f"result_path must be on a filesystem shared by "
                        f"all {nproc} processes")
                with open(part) as f:
                    for line in f:
                        out.write(line)
                        n_merged += 1
        for h in range(nproc):
            merged_errors.extend(np.load(f"{result_path}.errs{h}.npy")
                                 .tolist())
        expected = min(sum(counts), spec.exact_num)
        if n_merged != expected:
            raise RuntimeError(
                f"merged result has {n_merged} frames, expected {expected} "
                f"— a host evaluated a wrong shard range or dropped frames")
        if error_path and merged_errors:
            write_error_curve(merged_errors, error_path)
        report = {
            "num_frames": n_merged,
            "max_errors": merged_errors,
            "percentages": (summarize_percentages(merged_errors)
                            if merged_errors else {}),
            "fps": report["fps"],  # local-host rate; parts ran in parallel
        }
    # keep every process alive until the merge is on disk
    multihost_utils.sync_global_devices("densereg_eval_merge")
    return report
