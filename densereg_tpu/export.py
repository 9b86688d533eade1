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
requests).  The weights are baked into each program, so the second entry
point roughly doubles the artifact size — pass ``u16=False`` for a
f32-only artifact.  Artifacts written before the u16 entry existed (no
``u16_len`` header field) still load; they simply report
``accepts_u16=False`` and servers cast u16 requests to f32 on the host.
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
                     u16: bool = True) -> None:
    """Serialize ``predictor``'s full serving program with baked-in weights.

    Args:
      predictor: a :class:`densereg_tpu.serving.Predictor`.
      frame_hw: raw input frame (H, W); defaults to the predictor camera's
        sensor size.
      platforms: lowering targets embedded in the artifact.
      u16: also embed the uint16-frames entry point (integer-mm depth,
        bit-identical results, half the host->device bytes; roughly doubles
        the artifact because the weights are baked into each program).
    """
    import jax
    from jax import export as jexp

    cam = predictor.camera
    h, w = frame_hw if frame_hw is not None else (int(cam.h), int(cam.w))
    b = predictor.max_batch
    variables = predictor.variables

    # weights close over the traced function -> constants in the artifact
    fn = jax.jit(lambda frames, bbxs: predictor._predict(
        variables, frames, bbxs))
    bbx_spec = jax.ShapeDtypeStruct((b, 5), np.float32)
    blob = bytes(jexp.export(fn, platforms=tuple(platforms))(
        jax.ShapeDtypeStruct((b, h, w, 1), np.float32), bbx_spec
    ).serialize())
    header = {
        "max_batch": b,
        "frame_hw": [h, w],
        "num_joint": int(predictor.net_cfg.num_joint),
        "camera": list(np.asarray(cam.as_array(), np.float64)),
        "platforms": list(platforms),
        "sha256": hashlib.sha256(blob).hexdigest(),
    }
    blob_u16 = b""
    if u16:
        # the same program traced at uint16 input (the predictor casts on
        # device), so exported servers keep the u16 wire's transfer win
        blob_u16 = bytes(jexp.export(fn, platforms=tuple(platforms))(
            jax.ShapeDtypeStruct((b, h, w, 1), np.uint16), bbx_spec
        ).serialize())
        header["u16_len"] = len(blob_u16)
        header["sha256_u16"] = hashlib.sha256(blob_u16).hexdigest()
        header["f32_len"] = len(blob)
    hdr = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack(">I", len(hdr)))
        f.write(hdr)
        f.write(blob)
        f.write(blob_u16)


class ExportedPredictor:
    """Callable loaded from an export artifact.

    Mirrors :meth:`densereg_tpu.serving.Predictor.__call__` — pad/chunk
    batching with the same double-buffered chunk pipeline — but runs the
    deserialized StableHLO program; no model code or checkpoint needed.
    """

    def __init__(self, exported, header: dict, exported_u16=None):
        self._exported = exported
        self.max_batch = int(header["max_batch"])
        self.frame_hw = tuple(header["frame_hw"])
        self.num_joint = int(header["num_joint"])
        self.camera = np.asarray(header["camera"], np.float32)
        self.platforms = tuple(header.get("platforms", ()))
        self.accepts_u16 = exported_u16 is not None
        import jax
        self._call = jax.jit(exported.call)
        self._call_u16 = (jax.jit(exported_u16.call)
                          if exported_u16 is not None else None)

    def _dispatch(self, frames: np.ndarray, bbxs: np.ndarray):
        import jax.numpy as jnp
        b = frames.shape[0]
        pad = self.max_batch - b
        if pad:
            frames = np.concatenate([frames, np.repeat(frames[-1:], pad, 0)])
            bbxs = np.concatenate([bbxs, np.repeat(bbxs[-1:], pad, 0)])
        call = self._call
        if frames.dtype == np.uint16:
            if self._call_u16 is None:  # pre-u16 artifact: cast on host
                frames = frames.astype(np.float32)
            else:
                call = self._call_u16
        return call(jnp.asarray(frames),
                    jnp.asarray(np.asarray(bbxs, np.float32)))

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
        blob = f.read()
    blob_u16 = b""
    if "u16_len" in header:  # dual-entry artifact: f32 program, then u16
        blob, blob_u16 = (blob[:header["f32_len"]],
                          blob[header["f32_len"]:
                               header["f32_len"] + header["u16_len"]])

    def _check(data, want, what):
        if want is not None:
            got = hashlib.sha256(data).hexdigest()
            if got != want:
                raise ValueError(
                    f"{path}: {what} blob corrupted (sha256 {got[:12]}… != "
                    f"header {want[:12]}…)")

    _check(blob, header.get("sha256"), "f32")
    if blob_u16:
        _check(blob_u16, header.get("sha256_u16"), "u16")
    return ExportedPredictor(
        jexp.deserialize(bytearray(blob)), header,
        jexp.deserialize(bytearray(blob_u16)) if blob_u16 else None)
