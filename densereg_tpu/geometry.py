"""Camera geometry: perspective projection and point-cloud back-projection.

Everything is written once for a single (sample, point) and broadcast over
leading axes; there is no per-point graph unrolling (the reference builds one
TF node per point via ``tf.unstack`` — /root/reference/data/util.py:41-56 —
which is the biggest graph-construction cost in that codebase).

Conventions (same as the reference):
  * ``xyz``: camera-space millimetres, z > 0 away from camera.
  * ``uvd``: pixel column u, pixel row v, depth d (= z, mm).
  * ``cfg``: ``(fx, fy, cx, cy, w, h)`` as a length-6 float vector; batched
    per-sample configs are ``(b, 6)``.
"""

from __future__ import annotations

import jax.numpy as jnp

from densereg_tpu.config import D_RANGE, POSE_NORM_RATIO


def xyz2uvd(xyz, cfg):
    """Perspective projection. (/root/reference/data/util.py:20,41-49)

    Args:
      xyz: (..., 3) or (..., 3*j) xyz points, mm.
      cfg: (..., 6) camera config, broadcastable against the leading axes of
        ``xyz`` after its last axis is reshaped to (..., p, 3).
    Returns:
      uvd with the same shape as ``xyz``.
    """
    shape = xyz.shape
    pts = xyz.reshape(shape[:-1] + (-1, 3))
    cfg = jnp.asarray(cfg)[..., None, :]
    u = pts[..., 0] * cfg[..., 0] / pts[..., 2] + cfg[..., 2]
    v = pts[..., 1] * cfg[..., 1] / pts[..., 2] + cfg[..., 3]
    return jnp.stack([u, v, pts[..., 2]], axis=-1).reshape(shape)


def uvd2xyz(uvd, cfg):
    """Back-projection, inverse of :func:`xyz2uvd`.
    (/root/reference/data/util.py:21,51-56)"""
    shape = uvd.shape
    pts = uvd.reshape(shape[:-1] + (-1, 3))
    cfg = jnp.asarray(cfg)[..., None, :]
    x = (pts[..., 0] - cfg[..., 2]) * pts[..., 2] / cfg[..., 0]
    y = (pts[..., 1] - cfg[..., 3]) * pts[..., 2] / cfg[..., 1]
    return jnp.stack([x, y, pts[..., 2]], axis=-1).reshape(shape)


def scale_cfg(cfg, out_w, out_h):
    """Rescale intrinsics when the image is resized to ``(out_h, out_w)``.

    Matches the inline rescaling done everywhere in the reference, e.g.
    /root/reference/model/hourglass_um_crop_tiny.py:225-229.
    """
    cfg = jnp.asarray(cfg)
    w_ratio = cfg[..., 4] / out_w
    h_ratio = cfg[..., 5] / out_h
    return jnp.stack(
        [
            cfg[..., 0] / w_ratio,
            cfg[..., 1] / h_ratio,
            cfg[..., 2] / w_ratio,
            cfg[..., 3] / h_ratio,
            jnp.full_like(cfg[..., 4], out_w),
            jnp.full_like(cfg[..., 5], out_h),
        ],
        axis=-1,
    )


def norm_xyz_pose(poses, coms):
    """``(pose - com) / POSE_NORM_RATIO`` per joint.
    (/root/reference/data/preprocess.py:144-155)

    Args:
      poses: (..., 3*j) xyz mm. coms: (..., 3).
    """
    shape = poses.shape
    p = poses.reshape(shape[:-1] + (-1, 3))
    return ((p - coms[..., None, :]) / POSE_NORM_RATIO).reshape(shape)


def unnorm_xyz_pose(normed, coms):
    """Inverse of :func:`norm_xyz_pose`.
    (/root/reference/data/preprocess.py:157-170)"""
    shape = normed.shape
    p = normed.reshape(shape[:-1] + (-1, 3))
    return (p * POSE_NORM_RATIO + coms[..., None, :]).reshape(shape)


def backproject_dm(normed_dm, cfg, com):
    """Back-project a normalized depth map into a normalized point cloud.

    TPU-native rewrite of ``generate_xyzs_from_multi_cfgs``
    (/root/reference/data/preprocess.py:189-232): one broadcasted expression
    instead of a per-sample ``tf.map_fn``; vmap/broadcast over the batch.

    Args:
      normed_dm: (h, w, 1) or (b, h, w, 1) depth normalized by
        :func:`densereg_tpu.preprocess.norm_dm` (invalid pixels == -1).
      cfg: (6,) or (b, 6) intrinsics *of the full-resolution crop*; they are
        rescaled internally to the map's (h, w).
      com: (3,) or (b, 3) hand center of mass, mm.
    Returns:
      (..., h, w, 3) normalized xyz point cloud; invalid pixels land on the
      far plane ``com_z + D_RANGE/2`` exactly as the reference does.
    """
    dm = jnp.asarray(normed_dm)
    h, w = dm.shape[-3], dm.shape[-2]
    cfg = jnp.asarray(cfg)
    com = jnp.asarray(com)
    batched = dm.ndim == 4
    if not batched:
        dm, cfg, com = dm[None], cfg[None], com[None]

    zz = dm[..., 0]
    min_depth = com[:, 2] - D_RANGE * 0.5
    max_depth = com[:, 2] + D_RANGE * 0.5
    zz = jnp.where(
        zz < -0.99,
        max_depth[:, None, None],
        zz * D_RANGE + min_depth[:, None, None],
    )

    # Pixel grid. The reference's tf.meshgrid(range(h), range(w)) produces
    # (w, h)-shaped tensors where axis 1 carries the first argument; on the
    # square maps used everywhere this equals: xx = column index, yy = row
    # index (/root/reference/data/preprocess.py:209-211).
    col = jnp.arange(w, dtype=dm.dtype)[None, None, :]
    row = jnp.arange(h, dtype=dm.dtype)[None, :, None]

    scaled = scale_cfg(cfg, w, h)  # (b, 6)
    fx = scaled[:, 0][:, None, None]
    fy = scaled[:, 1][:, None, None]
    cx = scaled[:, 2][:, None, None]
    cy = scaled[:, 3][:, None, None]

    xx = (col - cx) * zz / fx
    yy = (row - cy) * zz / fy

    com_b = com[:, None, None, :]
    xyz = jnp.stack(
        [
            (xx - com_b[..., 0]) / POSE_NORM_RATIO,
            (yy - com_b[..., 1]) / POSE_NORM_RATIO,
            (zz - com_b[..., 2]) / POSE_NORM_RATIO,
        ],
        axis=-1,
    )
    return xyz if batched else xyz[0]
