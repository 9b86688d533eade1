"""Batched serving API.

The reference has no serving story beyond the test driver; this module
packages the full production path — full-frame depth in, xyz joints out —
as one object:

    predictor = Predictor.from_checkpoint(train_dir, net_cfg)
    xyz = predictor(frames_mm, bbxs)        # (b, 3j) mm, camera space

Internally: static-shape crop (from bbox or provided pose), center-of-mass,
depth normalization, the stacked hourglass (optionally with batch norm
folded into the convs), and the vote/mean-shift decode — a single jitted
program per batch size.  Inputs are padded to the configured max batch so
one compiled executable serves any request size; an optional
``batch_buckets`` ladder (e.g. ``(1, 8, 64)``) instead pads each dispatch
to the smallest bucket that fits, trading a handful of extra compiles for
batch-1 device latency on lone requests.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from densereg_tpu import decode as decode_mod
from densereg_tpu.config import CameraConfig, EvalConfig, NetConfig
from densereg_tpu.models import DenseRegNet, fold_batch_norm
from densereg_tpu.preprocess import (
    crop_from_bbx,
    center_of_mass,
    method2_resize,
    norm_dm,
)


class Predictor:
    """``quantize=True`` converts the folded graph to int8: per-channel
    weights, plus static activation scales when ``calibration`` — a
    ``(frames_mm, bbxs)`` pair of representative REQUESTS (same layout as
    ``__call__``) — is given; the scales are recorded through the
    predictor's own crop/normalize path.  Measured ~7% faster than bf16 at
    batch 256 on v5e (BASELINE.md); without calibration the activations
    fall back to dynamic per-batch scaling, which is SLOWER than bf16
    (round-1 measurement)."""

    # uint16 integer-mm frames are accepted natively (cast on device):
    # half the host->device bytes, bit-identical results
    accepts_u16 = True

    def __init__(self, variables, net_cfg: NetConfig, camera: CameraConfig,
                 max_batch: int = 64, ecfg: EvalConfig = EvalConfig(),
                 fold_bn: bool = True, mesh=None, quantize: bool = False,
                 calibration=None, batch_buckets=None):
        if (fold_bn or quantize) and not net_cfg.fold_bn:
            variables = fold_batch_norm(variables, eps=net_cfg.bn_epsilon)
            net_cfg = dataclasses.replace(net_cfg, fold_bn=True)
        if quantize and not net_cfg.quantize:
            from densereg_tpu.models.quantize import quantize_weights

            variables = quantize_weights(variables)
            net_cfg = dataclasses.replace(net_cfg, quantize=True)
        self.net_cfg = net_cfg
        self.camera = camera
        self.max_batch = max_batch
        # Dispatch-size ladder: requests are padded UP to the smallest
        # bucket that fits instead of always to max_batch.  XLA compiles
        # one executable per shape, so each bucket is one extra compile
        # (warm them with ``warmup()``) — in exchange a lone request pays
        # batch-1 device time, not max_batch's (tools/latency_probe.py:
        # 3.6 ms at b=1 vs 7.2 ms at the b=64 knee on v5e).  max_batch is
        # always a bucket so any chunk the chunker produces has a home.
        if batch_buckets:
            buckets = sorted({int(v) for v in batch_buckets} | {max_batch})
            if buckets[0] < 1 or buckets[-1] > max_batch:
                raise ValueError(
                    f"batch_buckets must lie in [1, max_batch={max_batch}]; "
                    f"got {sorted(batch_buckets)}")
            self.batch_buckets = tuple(buckets)
        else:
            self.batch_buckets = (max_batch,)
        self.variables = variables
        self.mesh = mesh
        net = DenseRegNet(net_cfg)
        in_h, in_w = net_cfg.input_hw
        out_h, out_w = net_cfg.output_hw
        cam = camera.as_array()

        def preprocess(frames, bbxs):
            # uint16 requests are cast on device: half the host->device
            # bytes of float32 on the transfer-bound serving path.
            frames = frames.astype(jnp.float32)
            crop = jax.vmap(
                lambda d, b: crop_from_bbx(d, jnp.zeros((1,)), b, cam,
                                           in_h, in_w))
            dms, _, cfgs = crop(frames, bbxs)
            coms = jax.vmap(center_of_mass)(dms, cfgs)
            return dms, cfgs, coms

        def predict(variables, frames, bbxs):
            dms, cfgs, coms = preprocess(frames, bbxs)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                sh = NamedSharding(mesh, P(tuple(mesh.axis_names)))
                dms = jax.lax.with_sharding_constraint(dms, sh)
            normed = norm_dm(dms, coms)
            outs = net.apply(variables, normed, train=False)
            tiny = method2_resize(normed, out_h, out_w)
            res = decode_mod.decode_poses(outs["hm"][-1], outs["hm3"][-1],
                                          outs["um"][-1], tiny, cfgs, coms,
                                          ecfg)
            return res["xyz"]

        self._predict = jax.jit(predict)

        if quantize and calibration is not None:
            from densereg_tpu.models.quantize import calibrate

            frames, bbxs = calibration
            frames = np.asarray(frames, np.float32)
            if frames.ndim == 3:
                frames = frames[..., None]
            dms, _, coms = jax.jit(preprocess)(
                jnp.asarray(frames),
                jnp.asarray(np.asarray(bbxs, np.float32)))
            self.variables = jax.jit(
                lambda v, d: calibrate(net, v, [d])
            )(self.variables, norm_dm(dms, coms))

    @classmethod
    def from_checkpoint(cls, train_dir: str, net_cfg: NetConfig,
                        camera: CameraConfig, step: Optional[int] = -1,
                        use_ema: bool = False,
                        ema_decay: Optional[float] = None,
                        use_best: bool = False,
                        **kwargs) -> "Predictor":
        """``use_ema`` serves the exponential-moving-average weights
        (requires a run trained with ``TrainConfig.ema_decay``; pass the
        same ``ema_decay`` so the restore template matches).  ``use_best``
        serves the best-validation checkpoint tracked by
        ``TrainConfig.keep_best`` (``train_dir/ckpt_best``)."""
        import os

        from densereg_tpu.config import TrainConfig
        from densereg_tpu.train.checkpoint import CheckpointManager
        from densereg_tpu.train.state import create_train_state

        tcfg = TrainConfig() if ema_decay is None else \
            TrainConfig(ema_decay=ema_decay)
        state = create_train_state(jax.random.key(0), net_cfg, tcfg,
                                   steps_per_epoch=1.0)
        mgr = CheckpointManager(os.path.join(
            train_dir, "ckpt_best" if use_best else "ckpt"))
        state = mgr.restore(state, step)
        mgr.close()
        params = state.params
        if use_ema:
            if state.ema_params is None:
                raise ValueError(
                    "checkpoint has no EMA weights; train with --ema_decay "
                    "and pass ema_decay= here")
            params = state.ema_params
        variables = {"params": params, "batch_stats": state.batch_stats}
        return cls(variables, net_cfg, camera, **kwargs)

    @classmethod
    def from_converted(cls, msgpack_path: str, net_cfg: NetConfig,
                       camera: CameraConfig, **kwargs) -> "Predictor":
        """Load a migrated reference checkpoint
        (densereg_tpu.convert)."""
        from densereg_tpu.convert import load_converted

        payload = load_converted(msgpack_path)
        variables = {"params": payload["params"],
                     "batch_stats": payload["batch_stats"]}
        return cls(variables, net_cfg, camera, **kwargs)

    def warmup(self, with_u16: bool = True) -> None:
        """Compile every (bucket, dtype) serving executable up front so no
        client request ever eats a cold compile (minutes over a remote
        relay).  Blocks until the last program has run once."""
        hw = (int(self.camera.h), int(self.camera.w))
        bbx = np.asarray([[0, 0, hw[0], hw[1], 500.0]], np.float32)
        dtypes = (np.float32, np.uint16) if with_u16 else (np.float32,)
        for bucket in self.batch_buckets:
            for dt in dtypes:
                np.asarray(self._dispatch(
                    np.zeros((bucket,) + hw + (1,), dt),
                    np.repeat(bbx, bucket, 0)))

    def _dispatch(self, frames: np.ndarray, bbxs: np.ndarray):
        """Pad one chunk to the smallest batch bucket that fits and enqueue
        the jitted program (asynchronous — returns the device result, which
        has bucket rows, without blocking)."""
        b = frames.shape[0]
        bucket = next(v for v in self.batch_buckets if v >= b)
        pad = bucket - b
        if pad:
            frames = np.concatenate([frames, np.repeat(frames[-1:], pad, 0)])
            bbxs = np.concatenate([bbxs, np.repeat(bbxs[-1:], pad, 0)])
        return self._predict(self.variables, jnp.asarray(frames),
                             jnp.asarray(np.asarray(bbxs, np.float32)))

    def __call__(self, frames_mm: np.ndarray, bbxs: np.ndarray) -> np.ndarray:
        """frames_mm: (b, H, W) or (b, H, W, 1) raw depth, mm;
        bbxs: (b, 5) = (top, left, bottom, right, depth_threshold).
        Returns (b, 3j) xyz mm.

        Requests larger than ``max_batch`` are processed as a double-buffered
        chunk pipeline: chunk k+1 is padded + enqueued before chunk k's
        result is fetched, overlapping host work and transfers with device
        compute."""
        frames = np.asarray(frames_mm)
        if frames.dtype != np.uint16:  # keep integer depth in native width
            frames = frames.astype(np.float32, copy=False)
        if frames.ndim == 3:
            frames = frames[..., None]
        b = frames.shape[0]
        if b == 0:
            return np.zeros((0, 3 * self.net_cfg.num_joint), np.float32)
        out, pending = [], None
        for i in range(0, b, self.max_batch):
            chunk = frames[i:i + self.max_batch]
            dev = self._dispatch(chunk, bbxs[i:i + self.max_batch])
            if pending is not None:
                out.append(np.asarray(pending[0])[:pending[1]])
            pending = (dev, len(chunk))
        out.append(np.asarray(pending[0])[:pending[1]])
        return out[0] if len(out) == 1 else np.concatenate(out)
