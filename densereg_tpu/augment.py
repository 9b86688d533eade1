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


def _source_indices(shape_hw, angle, ratio, center):
    """Integer source pixel of each output pixel for the inverse affine map
    M^-1 = R(angle) @ diag(1/ratio) (row-vector form).  Out-of-image samples
    keep their raw (out-of-range) index — consumers treat those as zeros."""
    h, w = shape_hw
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
    return iy, ix


def _warp_image_gather(dm, angle, ratio, center):
    """Nearest-neighbour warp via a 2-D gather: output(q) = input(M^-1 q),
    zeros outside.  Semantics oracle for the MXU warp below; on TPU the
    gather lowers to a slow flattened 1-D gather (~35 ms of a 170 ms train
    step at batch 40x5 — BASELINE.md), so the MXU form is the default."""
    h, w = dm.shape[0], dm.shape[1]
    iy, ix = _source_indices((h, w), angle, ratio, center)
    valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    ixc = jnp.clip(ix, 0, w - 1)
    iyc = jnp.clip(iy, 0, h - 1)
    vals = dm[iyc, ixc]
    return jnp.where(valid[..., None] if dm.ndim == 3 else valid, vals, 0.0)


def _warp_image(dm, angle, ratio, center):
    """Nearest-neighbour warp as two one-hot contractions on the MXU.

    Bitwise-identical to :func:`_warp_image_gather`:

        out[y, x] = sum_k sum_s dm[k, s] * [ix[y,x] == s] * [iy[y,x] == k]

    The inner contraction over the source column ``s`` is a dense matmul
    (XLA fuses the iota-compare one-hot into the dot's VMEM tiles, so the
    (h, w, w) indicator never round-trips HBM); the outer reduction over the
    source row ``k`` is a VPU multiply-reduce.  Out-of-range indices produce
    all-zero indicator rows, which reproduces the zero fill outside the
    source image without an explicit mask.  ~10x faster than the gather form
    on TPU (the warp drops out of the train-step profile entirely).
    """
    h, w = dm.shape[0], dm.shape[1]
    iy, ix = _source_indices((h, w), angle, ratio, center)
    img = dm[..., 0] if dm.ndim == 3 else dm
    col_hot = jax.nn.one_hot(ix, w, dtype=jnp.float32)       # (h, w, s)
    row_hot = jax.nn.one_hot(iy, h, dtype=jnp.float32)       # (h, w, k)
    # rows[y, x, k] = img[k, ix[y, x]]  (zero when ix out of range)
    rows = jnp.einsum("ks,yxs->yxk", img.astype(jnp.float32), col_hot,
                      preferred_element_type=jnp.float32)
    out = jnp.einsum("yxk,yxk->yx", rows, row_hot)
    return out[..., None] if dm.ndim == 3 else out


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
