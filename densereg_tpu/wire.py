"""Host->device wire codec for cropped depth batches.

On a remote-relay-attached TPU the eval/serving host loop is bound by the
host->device transfer of the cropped depth batch: the float32 crop feed
moves 16.8 MB/batch at 256 and runs at the relay's measured ~47 MB/s
(BASELINE.md).  The crop's value range is narrow — raw millimetres inside
the com window, background EXACTLY 0.0 (densereg_tpu.preprocess
crop_from_xyz_pose) — so the batch ships as per-batch fixed-point uint16:

    scale = max(dm) / 65535          (one f32 scalar per batch)
    q     = round(dm / scale)        (uint16, zeros stay zeros)
    dm'   = q * scale                (on device; fuses into the consumer)

Half the bytes of float32, quantization error <= max(dm)/131070
(~0.005 mm for a 600 mm crop) — two orders of magnitude below the 0.05 mm
parity budget (BASELINE.json north star) and below depth-sensor noise.
Background zeros are preserved bit-exactly (scale-only encoding, no
offset), so ``d > 0`` validity masks are unchanged.

The reference has no analogue (it feeds float32 through TF queue runners,
/root/reference/data/dataset_base.py:186-207); this is a TPU-topology
optimization in the same spirit as the uint16 shard staging
(data/pipeline._load_frames) — minimize bytes over the host<->device link
and let the device do the cheap arithmetic.
"""

from __future__ import annotations

import numpy as np

WIRE_DTYPES = ("float32", "uint16")


def encode_dm_u16(dm: np.ndarray):
    """Encode a non-negative float depth batch as (uint16, f32 scale).

    Args:
      dm: (..., h, w, 1) float array, values >= 0 (cropped raw-mm depth;
        negatives — which the crop never produces — are clamped to 0).
    Returns:
      (q, scale): ``q`` uint16 with ``dm``'s shape; ``scale`` a float32
      array of shape (1,) * dm.ndim so it broadcasts over the batch and
      stays an ARRAY argument under jit (a python scalar would retrace
      every batch).
    """
    dm = np.asarray(dm, np.float32)
    hi = float(dm.max(initial=0.0))
    scale = np.float32(max(hi, 1e-6) / 65535.0)
    q = np.clip(np.rint(dm / scale), 0.0, 65535.0).astype(np.uint16)
    return q, np.full((1,) * dm.ndim, scale, np.float32)


def decode_dm_u16(q, scale):
    """Jittable inverse of :func:`encode_dm_u16` (any backend)."""
    return q.astype(np.float32) * scale
