"""Device-side preprocessing: crop, depth normalization, resizing.

The reference crops with dynamic-shape ops (``tf.image.crop_to_bounding_box``
-> ``pad_to_bounding_box`` -> ``resize``, /root/reference/data/preprocess.py:
10-129) which cannot compile to a fixed TPU program.  Here the whole
crop+square-pad+resize chain is algebraically collapsed into ONE static-shape
bilinear resampling of the source depth map: for every output pixel we compute
its source coordinate through the (crop, pad, scale) transform and gather with
masked bilinear taps.  The result is bit-for-bit the same math with fully
static shapes, so it jits, vmaps over the batch, and fuses with the rest of
the input pipeline on device.

All functions are single-sample and pure; use ``jax.vmap`` for batches (the
exported ``*_batch`` wrappers do exactly that).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from densereg_tpu import geometry
from densereg_tpu.config import D_RANGE


# ---------------------------------------------------------------------------
# Resizing primitives
# ---------------------------------------------------------------------------

def area_resize(x, out_h, out_w):
    """Integer-ratio AREA (box-mean) downsample —
    ``tf.image.resize_images(x, s, ResizeMethod.AREA)``.  NOT what the
    reference's ``method=2`` resizes do (see :func:`method2_resize`); kept
    as the antialiased option for from-scratch training."""
    h, w = x.shape[-3], x.shape[-2]
    if h % out_h or w % out_w:
        raise ValueError(f"area_resize needs integer ratio, got {h}x{w} -> {out_h}x{out_w}")
    fh, fw = h // out_h, w // out_w
    lead = x.shape[:-3]
    c = x.shape[-1]
    x = x.reshape(lead + (out_h, fh, out_w, fw, c))
    return x.mean(axis=(-4, -2))


def method2_resize(x, out_h, out_w):
    """The reference's ``tf.image.resize_images(x, s, 2)`` downsample.

    In the TF1 enum ``2`` is **BICUBIC** (BILINEAR=0, NEAREST=1, BICUBIC=2,
    AREA=3) with legacy coordinates (``src = dst * in/out``, no half-pixel
    centers).  For the integer-ratio shrinks the reference performs
    (/root/reference/network/um_v1.py:111 and
    /root/reference/model/hourglass_um_crop_tiny.py:340,453, all 128->32)
    the source coordinate is integral, the cubic weights collapse to
    ``[0, 1, 0, 0]``, and the op is an EXACT point subsample ``x[::r, ::r]``
    — verified against TF 2.21 ``compat.v1`` (max abs diff 0.0) and pinned
    through the real reference graph in tests/test_tf_parity_realgraph.py.
    (An earlier reading of ``method=2`` as AREA — SURVEY.md §7 repeats it —
    produced ~1e-3 relative error on the hm3/um heads.)"""
    h, w = x.shape[-3], x.shape[-2]
    if h % out_h or w % out_w:
        raise ValueError(
            f"method2_resize needs integer ratio, got {h}x{w} -> {out_h}x{out_w}")
    fh, fw = h // out_h, w // out_w
    return x[..., ::fh, ::fw, :]


def resize_bilinear(img, out_h, out_w):
    """TF1 legacy bilinear resize (``align_corners=False``): source coordinate
    = ``dst_index * (in/out)`` with edge clamping — NOT half-pixel centers.
    This matches ``tf.image.resize_images`` as compiled by TF 1.3, which the
    reference uses for the crop resize (/root/reference/data/preprocess.py:53)
    and heatmap upsampling (/root/reference/model/hourglass_um_crop_tiny.py:470).
    """
    h, w = img.shape[-3], img.shape[-2]
    dtype = img.dtype

    def axis_coords(n_in, n_out):
        scale = n_in / n_out
        src = jnp.arange(n_out, dtype=jnp.float32) * scale
        i0 = jnp.floor(src).astype(jnp.int32)
        i0 = jnp.clip(i0, 0, n_in - 1)
        i1 = jnp.minimum(i0 + 1, n_in - 1)
        frac = src - i0.astype(jnp.float32)
        return i0, i1, frac

    y0, y1, fy = axis_coords(h, out_h)
    x0, x1, fx = axis_coords(w, out_w)

    top = jnp.take(img, y0, axis=-3)
    bot = jnp.take(img, y1, axis=-3)
    tl = jnp.take(top, x0, axis=-2).astype(jnp.float32)
    tr = jnp.take(top, x1, axis=-2).astype(jnp.float32)
    bl = jnp.take(bot, x0, axis=-2).astype(jnp.float32)
    br = jnp.take(bot, x1, axis=-2).astype(jnp.float32)

    fx = fx[:, None]
    t = tl + (tr - tl) * fx
    b = bl + (br - bl) * fx
    out = t + (b - t) * fy[None, :, None, None].reshape(
        (1,) * (img.ndim - 3) + (out_h, 1, 1))
    return out.astype(dtype)


def resize_nearest(img, out_h, out_w):
    """TF1 legacy nearest resize (``align_corners=False``):
    index = floor(dst * in/out)."""
    h, w = img.shape[-3], img.shape[-2]
    ys = jnp.clip((jnp.arange(out_h) * (h / out_h)).astype(jnp.int32), 0, h - 1)
    xs = jnp.clip((jnp.arange(out_w) * (w / out_w)).astype(jnp.int32), 0, w - 1)
    return jnp.take(jnp.take(img, ys, axis=-3), xs, axis=-2)


# ---------------------------------------------------------------------------
# Crop (static-shape resampling formulation)
# ---------------------------------------------------------------------------

def _bbox_from_pose(pose, cfg, pad):
    """Pose-driven bounding box (/root/reference/data/preprocess.py:24-37)."""
    uvd = geometry.xyz2uvd(pose, cfg).reshape(-1, 3)
    min_c = jnp.min(uvd, axis=0)
    max_c = jnp.max(uvd, axis=0)
    h, w = cfg[5], cfg[4]
    top = jnp.minimum(jnp.maximum(min_c[1] - pad, 0.0), h - 2 * pad)
    left = jnp.minimum(jnp.maximum(min_c[0] - pad, 0.0), w - 2 * pad)
    bottom = jnp.maximum(jnp.minimum(max_c[1] + pad, h), top + 2 * pad - 1)
    right = jnp.maximum(jnp.minimum(max_c[0] + pad, w), left + 2 * pad - 1)
    return (top.astype(jnp.int32), left.astype(jnp.int32),
            bottom.astype(jnp.int32), right.astype(jnp.int32))


def _resample_crop(dm, top, left, bottom, right, out_h, out_w):
    """Crop -> center-pad-to-square -> legacy-bilinear-resize, as one masked
    bilinear gather with static output shape.

    Derivation: the reference pads the (bottom-top, right-left) crop into a
    ``longer_edge``-sided square at offset (oh, ow) then resizes with legacy
    bilinear (src = dst * le/out).  A padded-space sample at (yp, xp) reads
    source pixel (yp - oh + top, xp - ow + left) when inside the crop window
    and 0 otherwise; we evaluate the 4 bilinear taps of each output pixel
    directly against the source with that mask.
    """
    h_in, w_in = dm.shape[0], dm.shape[1]
    hbox = bottom - top
    wbox = right - left
    le = jnp.maximum(hbox, wbox)
    oh = ((le - hbox).astype(jnp.float32) / 2.0).astype(jnp.int32)
    ow = ((le - wbox).astype(jnp.float32) / 2.0).astype(jnp.int32)

    lef = le.astype(jnp.float32)
    ys = jnp.arange(out_h, dtype=jnp.float32) * lef / out_h   # padded-space y
    xs = jnp.arange(out_w, dtype=jnp.float32) * lef / out_w
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, le - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, le - 1)
    y1 = jnp.minimum(y0 + 1, le - 1)
    x1 = jnp.minimum(x0 + 1, le - 1)
    fy = (ys - y0.astype(jnp.float32))[:, None]
    fx = (xs - x0.astype(jnp.float32))[None, :]

    dm2 = dm[..., 0] if dm.ndim == 3 else dm

    def tap(yy, xx):
        """Read padded image P[yy, xx] for yy (out_h,), xx (out_w,)."""
        yv = (yy >= oh) & (yy < oh + hbox)
        xv = (xx >= ow) & (xx < ow + wbox)
        sy = jnp.clip(yy - oh + top, 0, h_in - 1)
        sx = jnp.clip(xx - ow + left, 0, w_in - 1)
        vals = dm2[sy[:, None], sx[None, :]]
        return jnp.where(yv[:, None] & xv[None, :], vals, 0.0)

    tl = tap(y0, x0)
    tr = tap(y0, x1)
    bl = tap(y1, x0)
    br = tap(y1, x1)
    t = tl + (tr - tl) * fx
    b = bl + (br - bl) * fx
    out = t + (b - t) * fy
    return out[..., None], le, oh, ow


def _new_cfg(cfg, top, left, le, oh, ow, out_h, out_w):
    """Post-crop intrinsics (/root/reference/data/preprocess.py:69-78)."""
    ratio_x = le.astype(jnp.float32) / out_w
    ratio_y = le.astype(jnp.float32) / out_h
    return jnp.stack([
        cfg[0] / ratio_x,
        cfg[1] / ratio_y,
        (cfg[2] - left.astype(jnp.float32) + ow.astype(jnp.float32)) / ratio_x,
        (cfg[3] - top.astype(jnp.float32) + oh.astype(jnp.float32)) / ratio_y,
        jnp.float32(out_w),
        jnp.float32(out_h),
    ])


def crop_from_xyz_pose(dm, pose, cfg, out_h, out_w, pad=20.0,
                       fixed_bg_threshold: Optional[float] = None):
    """Crop the hand region around the (GT or estimated) pose.

    Single-sample, static shapes; vmap over batches.  Mirrors
    /root/reference/data/preprocess.py:10-79 including the background cull:
    pixels deeper than ``min(valid joint depth) + 250`` (or a dataset-fixed
    threshold, e.g. 500 mm for ICVL) are zeroed.

    Args:
      dm: (H, W, 1) raw depth, mm. pose: (3*j,). cfg: (6,).
    Returns:
      (cropped (out_h, out_w, 1), pose, new_cfg (6,)).
    """
    cfg = jnp.asarray(cfg, jnp.float32)
    top, left, bottom, right = _bbox_from_pose(pose, cfg, pad)
    cropped, le, oh, ow = _resample_crop(dm, top, left, bottom, right, out_h, out_w)

    if fixed_bg_threshold is not None:
        d_th = jnp.float32(fixed_bg_threshold)
    else:
        # depth at the (clipped) integer joint projections; ignore readings
        # <= 100 mm; threshold = nearest joint surface + 250 mm
        # (/root/reference/data/preprocess.py:56-67).
        h_in, w_in = dm.shape[0], dm.shape[1]
        uvd = geometry.xyz2uvd(pose, cfg).reshape(-1, 3)
        uu = jnp.clip(uvd[:, 0].astype(jnp.int32), 0, w_in - 1)
        vv = jnp.clip(uvd[:, 1].astype(jnp.int32), 0, h_in - 1)
        dd = dm[vv, uu, 0] if dm.ndim == 3 else dm[vv, uu]
        dd = jnp.where(dd > 100.0, dd, jnp.inf)
        d_th = jnp.min(dd) + 250.0

    cropped = jnp.where(cropped < d_th, cropped, 0.0)
    new_cfg = _new_cfg(cfg, top, left, le, oh, ow, out_h, out_w)
    return cropped, pose, new_cfg


def crop_from_bbx(dm, pose, bbx, cfg, out_h, out_w):
    """Crop driven by a stored bounding box + depth threshold
    (NYU test path, /root/reference/data/preprocess.py:81-129).

    Args: bbx: (5,) = (top, left, bottom, right, depth_threshold).
    """
    cfg = jnp.asarray(cfg, jnp.float32)
    top = bbx[0].astype(jnp.int32)
    left = bbx[1].astype(jnp.int32)
    bottom = bbx[2].astype(jnp.int32)
    right = bbx[3].astype(jnp.int32)
    cropped, le, oh, ow = _resample_crop(dm, top, left, bottom, right, out_h, out_w)
    cropped = jnp.where(cropped < bbx[4], cropped, 0.0)
    new_cfg = _new_cfg(cfg, top, left, le, oh, ow, out_h, out_w)
    return cropped, pose, new_cfg


# ---------------------------------------------------------------------------
# Center of mass & depth normalization
# ---------------------------------------------------------------------------

def center_of_mass(dm, cfg):
    """Hand center: mean valid depth back-projected through the image-center
    ray, depth floored at 200 mm (/root/reference/data/preprocess.py:131-142).

    Deviation from the reference: an all-invalid map yields com_z = 200
    instead of NaN.
    """
    h, w = dm.shape[0], dm.shape[1]
    d = dm[..., 0] if dm.ndim == 3 else dm
    valid = d > 0.0
    cnt = jnp.maximum(jnp.sum(valid), 1)
    ave_d = jnp.sum(jnp.where(valid, d, 0.0)) / cnt.astype(jnp.float32)
    ave_d = jnp.maximum(ave_d, 200.0)
    ave_u = jnp.float32(w / 2)
    ave_v = jnp.float32(h / 2)
    ave_x = (ave_u - cfg[2]) * ave_d / cfg[0]
    ave_y = (ave_v - cfg[3]) * ave_d / cfg[1]
    return jnp.stack([ave_x, ave_y, ave_d])


def norm_dm(dms, coms):
    """Normalize depth into the com-centred window
    (/root/reference/data/preprocess.py:176-187): value = (d - (com_z -
    R/2)) / R inside ``(com_z - R, com_z + R/2)``, else -1 (R = 300 mm).

    Args: dms: (..., h, w, 1); coms: (..., 3) — broadcast over leading axes.
    """
    com_z = coms[..., 2][..., None, None, None]
    max_depth = com_z + D_RANGE * 0.5
    min_depth = com_z - D_RANGE * 0.5
    mask = (dms < max_depth) & (dms > min_depth - D_RANGE * 0.5)
    return jnp.where(mask, (dms - min_depth) / D_RANGE, -1.0)


# ---------------------------------------------------------------------------
# Batched convenience wrappers
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def preprocess_batch_from_pose(dms, poses, cfg, out_h, out_w,
                               fixed_bg_threshold=None):
    """Full train-style preprocess for a batch: crop from GT pose + com.

    Equivalent of ``dataset.preprocess_op`` + ``center_of_mass``
    (/root/reference/data/icvl.py:145-150) as one jitted program.

    Args: dms (b,H,W,1) — any real dtype: the host pipeline feeds the
      shards' native uint16 (half the host->device bytes of float32) and the
      cast to float32 happens here, on device, before the bilinear crop.
    Returns: (cropped (b,h,w,1), poses, cfgs (b,6), coms (b,3)).
    """
    dms = dms.astype(jnp.float32)
    crop = jax.vmap(
        lambda d, p: crop_from_xyz_pose(d, p, cfg, out_h, out_w,
                                        fixed_bg_threshold=fixed_bg_threshold))
    cropped, poses, cfgs = crop(dms, poses)
    coms = jax.vmap(center_of_mass)(cropped, cfgs)
    return cropped, poses, cfgs, coms


@functools.partial(jax.jit, static_argnums=(4, 5))
def preprocess_batch_from_bbx(dms, poses, bbxs, cfg, out_h, out_w):
    """NYU-test-style preprocess: crop from stored bounding boxes
    (/root/reference/data/nyu.py:208-220).  Accepts uint16 depth like
    :func:`preprocess_batch_from_pose`."""
    dms = dms.astype(jnp.float32)
    crop = jax.vmap(lambda d, p, b: crop_from_bbx(d, p, b, cfg, out_h, out_w))
    cropped, poses, cfgs = crop(dms, poses, bbxs)
    coms = jax.vmap(center_of_mass)(cropped, cfgs)
    return cropped, poses, cfgs, coms
