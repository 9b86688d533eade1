"""Ground-truth synthesis: 2D cone heatmaps, 3D offset maps, 3D closeness
heatmaps and unit-offset maps.

TPU-native rewrite of the ``_hm_2d/_hm_3d/_um/_resume_om`` methods of the
reference model (/root/reference/model/hourglass_um_crop_tiny.py:195-299):
every map is a single broadcasted expression over ``(b, h, w, j)`` — no
``tf.map_fn`` over the batch, no ``tf.unstack`` over joints — so XLA fuses
the whole synthesis into a couple of elementwise kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

from densereg_tpu import geometry
from densereg_tpu.config import MAX_DIST_2D, MAX_DIST_3D


def hm2d(poses, cfgs, out_h, out_w):
    """Cone-shaped 2D joint heatmaps.

    (/root/reference/model/hourglass_um_crop_tiny.py:213-247)

    Args:
      poses: (b, 3*j) unnormalized xyz pose, mm.
      cfgs: (b, 6) per-sample crop intrinsics.
    Returns:
      (b, out_h, out_w, j): ``max(0, R - dist2d((u,v), pixel)) / R`` with
      R = 4 px, after projecting the pose with intrinsics rescaled to the
      heatmap resolution.
    """
    b = poses.shape[0]
    j = poses.shape[1] // 3
    scaled = geometry.scale_cfg(cfgs, out_w, out_h)         # (b, 6)
    uvd = geometry.xyz2uvd(poses, scaled).reshape(b, j, 3)  # (b, j, 3)
    uu = uvd[:, None, None, :, 0]                           # (b,1,1,j)
    vv = uvd[:, None, None, :, 1]
    col = jnp.arange(out_w, dtype=poses.dtype)[None, None, :, None]
    row = jnp.arange(out_h, dtype=poses.dtype)[None, :, None, None]
    dist = jnp.sqrt(jnp.square(col - uu) + jnp.square(row - vv))
    return jnp.maximum(MAX_DIST_2D - dist, 0.0) / MAX_DIST_2D


def offset_maps(normed_poses, xyzs):
    """Per-pixel 3D offset maps pixel -> joint.

    (/root/reference/model/hourglass_um_crop_tiny.py:341-343)

    Args:
      normed_poses: (b, 3*j) normalized pose.
      xyzs: (b, h, w, 3) normalized point cloud (see
        :func:`densereg_tpu.geometry.backproject_dm`).
    Returns:
      (b, h, w, 3*j) offsets, channel layout ``[x0,y0,z0, x1,y1,z1, ...]``.
    """
    j = normed_poses.shape[-1] // 3
    tiled = jnp.tile(xyzs, (1, 1, 1, j))
    return normed_poses[:, None, None, :] - tiled


def hm3d(oms):
    """3D closeness heatmap from offset maps:
    ``max(0, (R3 - |offset|) / R3)`` with R3 = 0.8 (= 80 mm).

    (/root/reference/model/hourglass_um_crop_tiny.py:195-211)

    Args: oms: (b, h, w, 3*j). Returns: (b, h, w, j).
    """
    b, h, w, c = oms.shape
    o = oms.reshape(b, h, w, c // 3, 3)
    mag = jnp.sqrt(jnp.sum(jnp.square(o), axis=-1))
    return jnp.maximum((MAX_DIST_3D - mag) / MAX_DIST_3D, 0.0)


def unit_offset_maps(oms, hm3):
    """Unit offset vectors: ``om / |om|`` where the magnitude implied by the
    3D heatmap is meaningfully below the cutoff, else 0.

    (/root/reference/model/hourglass_um_crop_tiny.py:249-274).  The magnitude
    is reconstructed from ``hm3`` (``d = R3 * (1 - hm3)``) rather than from
    ``om`` directly, exactly as the reference does, so the pair
    ``(hm3, um)`` stays self-consistent with :func:`resume_offset_maps`.

    Args: oms: (b,h,w,3*j); hm3: (b,h,w,j). Returns: (b,h,w,3*j).
    """
    b, h, w, c = oms.shape
    j = c // 3
    d = MAX_DIST_3D - hm3 * MAX_DIST_3D            # (b,h,w,j)
    mask = d < (MAX_DIST_3D - 1e-2)
    o = oms.reshape(b, h, w, j, 3)
    safe_d = jnp.where(mask, d, 1.0)[..., None]
    um = jnp.where(mask[..., None], o / safe_d, 0.0)
    return um.reshape(b, h, w, c)


def resume_offset_maps(hm3, um):
    """Reconstruct offset maps from (3D heatmap, unit offsets):
    ``om = um * R3 * (1 - hm3)``.

    (/root/reference/model/hourglass_um_crop_tiny.py:276-299)
    """
    b, h, w, c = um.shape
    j = c // 3
    d = MAX_DIST_3D - hm3 * MAX_DIST_3D
    o = um.reshape(b, h, w, j, 3) * d[..., None]
    return o.reshape(b, h, w, c)


def um_xy_angle(ums):
    """xy-plane angle visualization of unit-offset maps
    (``_vis_um_xy``, /root/reference/model/hourglass_um_crop_tiny.py:301-311):
    ``sin(x/|xy|)`` where the vector is meaningful, 1 elsewhere.

    Args: ums (b, h, w, 3j). Returns (b, h, w, j).
    """
    b, h, w, c = ums.shape
    u = ums.reshape(b, h, w, c // 3, 3)
    x, y, z = u[..., 0], u[..., 1], u[..., 2]
    d = jnp.sqrt(x * x + y * y)
    small = (d * d + z * z) < 0.1
    # the reference divides by d unguarded and NaNs on pure-z vectors
    # (hourglass_um_crop_tiny.py:309); we clamp the denominator
    safe_d = jnp.maximum(d, 1e-6)
    return jnp.where(small, 1.0, jnp.sin(x / safe_d))


def um_z_component(ums):
    """z component per joint (``_vis_um_z``, ibid.:313-320)."""
    b, h, w, c = ums.shape
    return ums.reshape(b, h, w, c // 3, 3)[..., 2]


def gaussian_heatmaps(uvd, out_h, out_w, sigma=3.0):
    """Per-point Gaussian heatmaps, the legacy/bigHand GT path
    (``heatmap_from_uvd_op``, /root/reference/data/util.py:85-127).  The
    reference scatters a delta and runs a separable blur twice; we emit the
    analytically equivalent normalized Gaussian bump directly (peak = 1).

    Args: uvd (..., 3j) or (..., j, 3). Returns (..., out_h, out_w, j).
    """
    pts = uvd.reshape(uvd.shape[:-1] + (-1, 3)) if uvd.shape[-1] != 3 else uvd
    uu = jnp.clip(pts[..., 0], 0, out_w - 1)
    vv = jnp.clip(pts[..., 1], 0, out_h - 1)
    col = jnp.arange(out_w, dtype=uvd.dtype)
    row = jnp.arange(out_h, dtype=uvd.dtype)
    d2 = (jnp.square(col[None, :, None] - uu[..., None, None, :])
          + jnp.square(row[:, None, None] - vv[..., None, None, :]))
    return jnp.exp(-d2 / (2.0 * sigma * sigma))


def synthesize(poses, cfgs, coms, normed_dms, out_h, out_w):
    """One jitted call producing every training target.

    Fuses the GT block of ``JointDetectionModel.loss``
    (/root/reference/model/hourglass_um_crop_tiny.py:336-346).

    Args:
      poses: (b, 3*j) xyz mm; cfgs: (b, 6); coms: (b, 3);
      normed_dms: (b, H, W, 1) normalized depth at network input resolution.
    Returns:
      dict with ``hm2 (b,h,w,j)``, ``hm3 (b,h,w,j)``, ``um (b,h,w,3j)``,
      ``om (b,h,w,3j)``, ``tiny_dm (b,h,w,1)``.
    """
    from densereg_tpu.preprocess import method2_resize  # local import: no cycle

    gt_hm2 = hm2d(poses, cfgs, out_h, out_w)
    normed_poses = geometry.norm_xyz_pose(poses, coms)
    # the reference's method-2 (TF1 bicubic == exact subsample at this
    # integer ratio) shrink, hourglass_um_crop_tiny.py:340
    tiny_dm = method2_resize(normed_dms, out_h, out_w)
    xyzs = geometry.backproject_dm(tiny_dm, cfgs, coms)
    om = offset_maps(normed_poses, xyzs)
    hm3 = hm3d(om)
    um = unit_offset_maps(om, hm3)
    return {"hm2": gt_hm2, "hm3": hm3, "um": um, "om": om, "tiny_dm": tiny_dm}
