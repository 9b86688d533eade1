"""Ahead-of-time model export (StableHLO serving artifacts).

The reference's only distribution format is a TF checkpoint plus the Python
model code that rebuilds the graph (/root/reference/exp/scripts/
fetch_icvl_model.sh, /root/reference/model/test_model.py:31-35).  The
TPU-native deployment story is stronger: :func:`export_predictor` bakes the
weights and the ENTIRE serving program — crop, normalize, hourglass
forward, vote decode — into one serialized ``jax.export`` artifact that any
process can load and run with :func:`load_exported` WITHOUT the model code,
the checkpoint, or even this package's model modules.

Artifact layout (single file): 8-byte magic, 4-byte big-endian JSON header
length, JSON header (batch contract + camera + joint count), then the
serialized StableHLO blob(s).  ``platforms=("tpu", "cpu")`` cross-lowers the
program for both targets by default so one artifact serves either.

By default the artifact carries TWO entry points: the float32 signature and
a ``uint16`` one (integer-mm depth frames, cast to f32 on device) so
exported-artifact servers keep the live path's measured 1.56x host->device
transfer win (BASELINE.md uint16 staging; densereg_tpu/serve.py ``u16``
requests).  The weights are baked into each program, so every extra entry
point adds roughly one weights-worth of bytes — pass ``u16=False`` for a
f32-only artifact.

A predictor built with a ``batch_buckets`` dispatch-size ladder (see
densereg_tpu/serving.py) exports one program per (bucket, dtype): the
loaded :class:`ExportedPredictor` then pads each dispatch to the smallest
bucket that fits, so an exported-artifact server keeps the live path's
lone-request latency win (batch-1 device time instead of max_batch's —
tools/latency_probe.py: 3.6 ms vs the 7.2 ms b=64 knee on v5e).  The
bucket programs are appended AFTER the two legacy blobs and indexed by a
``blob_table`` header field, so older readers of the format still load the
max_batch programs and simply ignore the ladder.  Artifacts written before
the u16 entry existed (no ``u16_len`` header field) also still load; they
report ``accepts_u16=False`` and servers cast u16 requests to f32 on the
host.
"""

from __future__ import annotations

import hashlib
import json
import struct
from typing import Optional, Sequence

import numpy as np

_MAGIC = b"DREXPT01"


def export_predictor(predictor, path: str,
                     frame_hw: Optional[tuple] = None,
                     platforms: Sequence[str] = ("tpu", "cpu"),
                     u16: bool = True,
                     batch_buckets: Optional[Sequence[int]] = None) -> None:
    """Serialize ``predictor``'s full serving program with baked-in weights.

    Args:
      predictor: a :class:`densereg_tpu.serving.Predictor`.
      frame_hw: raw input frame (H, W); defaults to the predictor camera's
        sensor size.
      platforms: lowering targets embedded in the artifact.
      u16: also embed the uint16-frames entry point (integer-mm depth,
        bit-identical results, half the host->device bytes; roughly doubles
        the artifact because the weights are baked into each program).
      batch_buckets: dispatch-size ladder to embed (one program per
        (bucket, dtype); max_batch is always included).  Defaults to the
        predictor's own ``batch_buckets``, so exporting a bucketed
        Predictor carries its ladder automatically.
    """
    import jax
    from jax import export as jexp

    cam = predictor.camera
    h, w = frame_hw if frame_hw is not None else (int(cam.h), int(cam.w))
    b = predictor.max_batch
    variables = predictor.variables
    if batch_buckets is None:
        batch_buckets = getattr(predictor, "batch_buckets", None)
    buckets = sorted({int(v) for v in (batch_buckets or ())} | {b})
    if buckets[0] < 1 or buckets[-1] > b:
        raise ValueError(f"batch_buckets must lie in [1, max_batch={b}]; "
                         f"got {buckets}")

    # weights close over the traced function -> constants in the artifact
    fn = jax.jit(lambda frames, bbxs: predictor._predict(
        variables, frames, bbxs))

    def _export(bb: int, dtype) -> bytes:
        return bytes(jexp.export(fn, platforms=tuple(platforms))(
            jax.ShapeDtypeStruct((bb, h, w, 1), dtype),
            jax.ShapeDtypeStruct((bb, 5), np.float32)).serialize())

    # blob order is part of the format: f32@max_batch first, then (if u16)
    # u16@max_batch — exactly the legacy dual-entry layout, so pre-ladder
    # readers slice the first two blobs via f32_len/u16_len and ignore the
    # rest — then the smaller buckets ascending, f32 then u16 each.
    blobs = [(b, "f32", _export(b, np.float32))]
    if u16:
        blobs.append((b, "u16", _export(b, np.uint16)))
    for bb in buckets:
        if bb == b:
            continue
        blobs.append((bb, "f32", _export(bb, np.float32)))
        if u16:
            blobs.append((bb, "u16", _export(bb, np.uint16)))

    header = {
        "max_batch": b,
        "frame_hw": [h, w],
        "num_joint": int(predictor.net_cfg.num_joint),
        "camera": list(np.asarray(cam.as_array(), np.float64)),
        "platforms": list(platforms),
        "sha256": hashlib.sha256(blobs[0][2]).hexdigest(),
    }
    if u16:
        header["u16_len"] = len(blobs[1][2])
        header["sha256_u16"] = hashlib.sha256(blobs[1][2]).hexdigest()
        header["f32_len"] = len(blobs[0][2])
    if len(buckets) > 1:
        header["batch_buckets"] = buckets
        header["blob_table"] = [
            {"batch": bb, "dtype": dt, "len": len(data),
             "sha256": hashlib.sha256(data).hexdigest()}
            for bb, dt, data in blobs]
    hdr = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack(">I", len(hdr)))
        f.write(hdr)
        for _, _, data in blobs:
            f.write(data)


class ExportedPredictor:
    """Callable loaded from an export artifact.

    Mirrors :meth:`densereg_tpu.serving.Predictor.__call__` — pad/chunk
    batching with the same double-buffered chunk pipeline — but runs the
    deserialized StableHLO program(s); no model code or checkpoint needed.
    """

    def __init__(self, entries: dict, header: dict):
        """``entries`` maps (batch, "f32"|"u16") -> deserialized export."""
        import jax

        self.max_batch = int(header["max_batch"])
        self.frame_hw = tuple(header["frame_hw"])
        self.num_joint = int(header["num_joint"])
        self.camera = np.asarray(header["camera"], np.float32)
        self.platforms = tuple(header.get("platforms", ()))
        self.batch_buckets = tuple(sorted(
            {bb for bb, dt in entries if dt == "f32"}))
        self.accepts_u16 = all(
            (bb, "u16") in entries for bb in self.batch_buckets)
        self._calls = {key: jax.jit(exp.call)
                       for key, exp in entries.items()}

    def warmup(self, with_u16: bool = True) -> None:
        """Run every embedded (bucket, dtype) program once so no client
        request ever eats a cold compile."""
        h, w = self.frame_hw
        bbx = np.asarray([[0, 0, h, w, 500.0]], np.float32)
        for bucket, dt in self._calls:
            if dt == "u16" and not with_u16:
                continue
            np.asarray(self._dispatch(
                np.zeros((bucket, h, w, 1),
                         np.uint16 if dt == "u16" else np.float32),
                np.repeat(bbx, bucket, 0)))

    def _dispatch(self, frames: np.ndarray, bbxs: np.ndarray):
        """Pad one chunk to the smallest embedded batch bucket that fits
        and run the matching program (asynchronous — returns the device
        result, which has bucket rows, without blocking)."""
        import jax.numpy as jnp
        b = frames.shape[0]
        dt = "f32"
        if frames.dtype == np.uint16:
            if not self.accepts_u16:  # pre-u16 artifact: cast on host
                frames = frames.astype(np.float32)
            else:
                dt = "u16"
        bucket = next(v for v in self.batch_buckets if v >= b)
        pad = bucket - b
        if pad:
            frames = np.concatenate([frames, np.repeat(frames[-1:], pad, 0)])
            bbxs = np.concatenate([bbxs, np.repeat(bbxs[-1:], pad, 0)])
        return self._calls[(bucket, dt)](
            jnp.asarray(frames), jnp.asarray(np.asarray(bbxs, np.float32)))

    def __call__(self, frames_mm: np.ndarray, bbxs: np.ndarray) -> np.ndarray:
        frames = np.asarray(frames_mm)
        if frames.dtype != np.uint16 or not self.accepts_u16:
            frames = frames.astype(np.float32, copy=False)
        if frames.ndim == 3:
            frames = frames[..., None]
        b = frames.shape[0]
        if b == 0:
            return np.zeros((0, 3 * self.num_joint), np.float32)
        out, pending = [], None
        for i in range(0, b, self.max_batch):
            chunk = frames[i:i + self.max_batch]
            dev = self._dispatch(chunk, bbxs[i:i + self.max_batch])
            if pending is not None:
                out.append(np.asarray(pending[0])[:pending[1]])
            pending = (dev, len(chunk))
        out.append(np.asarray(pending[0])[:pending[1]])
        return out[0] if len(out) == 1 else np.concatenate(out)


def load_exported(path: str) -> ExportedPredictor:
    """Load an artifact written by :func:`export_predictor`."""
    from jax import export as jexp

    with open(path, "rb") as f:
        magic = f.read(8)
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a densereg export artifact")
        (hlen,) = struct.unpack(">I", f.read(4))
        header = json.loads(f.read(hlen).decode())
        raw = f.read()

    def _check(data, want, what):
        if want is not None:
            got = hashlib.sha256(data).hexdigest()
            if got != want:
                raise ValueError(
                    f"{path}: {what} blob corrupted (sha256 {got[:12]}… != "
                    f"header {want[:12]}…)")

    entries = {}
    if "blob_table" in header:  # bucket-ladder artifact: indexed blobs
        off = 0
        for row in header["blob_table"]:
            data = raw[off:off + row["len"]]
            off += row["len"]
            _check(data, row.get("sha256"),
                   f"b{row['batch']}/{row['dtype']}")
            entries[(int(row["batch"]), row["dtype"])] = (
                jexp.deserialize(bytearray(data)))
    else:
        blob, blob_u16 = raw, b""
        if "u16_len" in header:  # dual-entry: f32 program, then u16
            blob, blob_u16 = (raw[:header["f32_len"]],
                              raw[header["f32_len"]:
                                  header["f32_len"] + header["u16_len"]])
        _check(blob, header.get("sha256"), "f32")
        entries[(int(header["max_batch"]), "f32")] = (
            jexp.deserialize(bytearray(blob)))
        if blob_u16:
            _check(blob_u16, header.get("sha256_u16"), "u16")
            entries[(int(header["max_batch"]), "u16")] = (
                jexp.deserialize(bytearray(blob_u16)))
    return ExportedPredictor(entries, header)
