"""Data augmentation: per-sample random in-plane rotation + anisotropic scale.

The reference applies two sequential image resamplings per sample
(``tf.contrib.image.rotate`` then nearest resize + center crop-or-pad,
/root/reference/data/preprocess.py:234-267).  Here both are composed into a
SINGLE affine nearest-neighbour warp about the image center — one gather per
pixel instead of two, and exact pose/image consistency by construction: the
pose transform and the image transform share the same 2x2 matrix

    M = [[ sx*cos,  sx*sin],
         [-sy*sin,  sy*cos]]      (uv row-vector convention, as the
                                   reference's rot_mat at preprocess.py:244)

applied about the projected center of mass, which by construction of
:func:`densereg_tpu.preprocess.center_of_mass` is the image center.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from densereg_tpu import geometry


def _affine_params(key, dtype=jnp.float32):
    """angle ~ U(-pi, pi); per-axis scale ~ clip(N(1, 0.2), 0.9, 1.1)
    (/root/reference/data/preprocess.py:238,251)."""
    k1, k2 = jax.random.split(key)
    angle = jax.random.uniform(k1, (), dtype, -jnp.pi, jnp.pi)
    ratio = jnp.clip(1.0 + 0.2 * jax.random.normal(k2, (2,), dtype), 0.9, 1.1)
    return angle, ratio  # ratio = (height_ratio, width_ratio)


def _transform_pose_uv(uv, angle, ratio, center):
    """Forward map of a uv point: rotate by -angle (row-vector R), then scale
    (u by width ratio, v by height ratio), all about ``center``."""
    rel = uv - center
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    u = (rel[..., 0] * cos + rel[..., 1] * sin) * ratio[1]
    v = (-rel[..., 0] * sin + rel[..., 1] * cos) * ratio[0]
    return jnp.stack([u, v], axis=-1) + center


def _warp_image(dm, angle, ratio, center):
    """Nearest-neighbour warp: output(q) = input(M^-1 (q - c) + c), zeros
    outside.  M^-1 = R(angle) @ diag(1/ratio) in row-vector form."""
    h, w = dm.shape[0], dm.shape[1]
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    qx = jnp.arange(w, dtype=jnp.float32)[None, :] - center[0]
    qy = jnp.arange(h, dtype=jnp.float32)[:, None] - center[1]
    # unscale then rotate back (inverse of _transform_pose_uv)
    ux = qx / ratio[1]
    uy = qy / ratio[0]
    sx = ux * cos - uy * sin + center[0]
    sy = ux * sin + uy * cos + center[1]
    ix = jnp.round(sx).astype(jnp.int32)
    iy = jnp.round(sy).astype(jnp.int32)
    valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    ix = jnp.clip(ix, 0, w - 1)
    iy = jnp.clip(iy, 0, h - 1)
    vals = dm[iy, ix]
    return jnp.where(valid[..., None] if dm.ndim == 3 else valid, vals, 0.0)


def augment_one(key, dm, pose, cfg, com):
    """Augment a single (depth map, pose) pair.

    Args:
      dm: (h, w, 1) cropped raw depth, mm; pose: (3*j,) xyz mm;
      cfg: (6,) crop intrinsics; com: (3,) xyz mm.
    Returns:
      (augmented dm, augmented xyz pose).
    """
    angle, ratio = _affine_params(key)
    uv_com = geometry.xyz2uvd(com, cfg)[:2]

    uvd = geometry.xyz2uvd(pose, cfg).reshape(-1, 3)
    new_uv = _transform_pose_uv(uvd[:, :2], angle, ratio, uv_com)
    new_uvd = jnp.concatenate([new_uv, uvd[:, 2:3]], axis=-1)
    new_pose = geometry.uvd2xyz(new_uvd.reshape(-1), cfg)

    new_dm = _warp_image(dm, angle, ratio, uv_com)
    return new_dm, new_pose


@jax.jit
def augment_batch(key, dms, poses, cfgs, coms):
    """Batched augmentation with independent per-sample keys
    (equivalent of ``data_aug``, /root/reference/data/preprocess.py:234-267).
    """
    keys = jax.random.split(key, dms.shape[0])
    return jax.vmap(augment_one)(keys, dms, poses, cfgs, coms)
