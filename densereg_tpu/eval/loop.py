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
from densereg_tpu.preprocess import area_resize, norm_dm


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
        tiny = area_resize(normed, out_h, out_w)
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
