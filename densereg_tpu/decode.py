"""Vote decoding: dense offset predictions -> 3D joint positions.

Re-design of the decode stage of the reference model
(/root/reference/model/hourglass_um_crop_tiny.py:545-814).  The reference
nests three levels of ``tf.map_fn`` (batch -> joint -> candidate) around
top-k / scatter_nd / an unrolled mean-shift; here every step is a batched
tensor program over ``(b, j, n)`` — top-k via ``lax.top_k``, the voting-grid
init via a one-hot matmul, the mean-shift via a scanned fixed-point update —
so the whole decoder jits into a handful of fused TPU kernels.  Two Pallas
forms exist with this module as their semantics oracle:
``densereg_tpu.ops.fused_decode`` (the ENTIRE decode as one kernel — the
TPU serving path, ``EvalConfig(use_pallas=True)``) and
``densereg_tpu.ops.meanshift_pallas`` (the mean-shift stage alone).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from densereg_tpu import geometry
from densereg_tpu.config import D_RANGE, MAX_DIST_3D, POSE_NORM_RATIO, EvalConfig


def refined_heatmaps(hms, hm3s, tiny_dms):
    """Candidate-selection weight map: ``(hm + 1) * hm3 * valid(dm)``
    (/root/reference/model/hourglass_um_crop_tiny.py:764-768)."""
    mask = jnp.where(tiny_dms < -0.99, 0.0, 1.0)  # (b,h,w,1)
    return (hms + 1.0) * hm3s * mask


def generate_candidates(refined, cand_xyz, num_pt: int):
    """Top-k candidate positions per joint
    (/root/reference/model/hourglass_um_crop_tiny.py:598-627).

    Args:
      refined: (b, h, w, j) selection scores.
      cand_xyz: (b, h, w, 3j) voted positions (point cloud + offsets).
    Returns:
      (scores (b, j, n), candidates (b, j, n, 3), flat pixel idx (b, j, n)).
    """
    b, h, w, j = refined.shape
    scores = refined.reshape(b, h * w, j).transpose(0, 2, 1)        # (b,j,hw)
    top_val, top_idx = jax.lax.top_k(scores, num_pt)                 # (b,j,n)
    xyz = cand_xyz.reshape(b, h * w, j, 3).transpose(0, 2, 1, 3)     # (b,j,hw,3)
    cans = jnp.take_along_axis(xyz, top_idx[..., None], axis=2)      # (b,j,n,3)
    return top_val, cans, top_idx


def candidate_weights(cans, coms, cfgs, hms, tiny_dms):
    """Reprojection weighting (+ the reference's z-clamp, which it computes
    and then discards — we reproduce both and likewise only use the weights;
    /root/reference/model/hourglass_um_crop_tiny.py:629-682,774).

    Out-of-image reprojections get weight 0 (the reference relies on GPU
    ``gather_nd`` returning 0 for out-of-bounds indices).

    Args:
      cans: (b, j, n, 3) normalized candidate xyz.
      coms: (b, 3); cfgs: (b, 6); hms: (b, h, w, j); tiny_dms: (b, h, w, 1).
    Returns:
      (weights (b, j, n), z-clamped candidates (b, j, n, 3)).
    """
    b, h, w, j = hms.shape
    xyz_mm = cans * POSE_NORM_RATIO + coms[:, None, None, :]
    scaled = geometry.scale_cfg(cfgs, w, h)                          # (b,6)
    uvd = geometry.xyz2uvd(
        xyz_mm.reshape(b, -1), scaled).reshape(b, j, -1, 3)
    uu = (uvd[..., 0] + 0.5).astype(jnp.int32)
    vv = (uvd[..., 1] + 0.5).astype(jnp.int32)
    inb = (uu >= 0) & (uu < w) & (vv >= 0) & (vv < h)
    uc = jnp.clip(uu, 0, w - 1)
    vc = jnp.clip(vv, 0, h - 1)
    flat = vc * w + uc                                               # (b,j,n)

    hm_flat = hms.reshape(b, h * w, j).transpose(0, 2, 1)            # (b,j,hw)
    weights = jnp.take_along_axis(hm_flat, flat, axis=2)
    weights = jnp.where(inb, weights, 0.0)

    # observed surface z in normalized pose units:
    # (normed_dm * R - R/2) / 100 = (depth_mm - com_z) / 100
    dm_flat = tiny_dms.reshape(b, h * w)
    od = jnp.take_along_axis(dm_flat, flat.reshape(b, -1), axis=1).reshape(b, j, -1)
    od = (od * D_RANGE - D_RANGE * 0.5) / POSE_NORM_RATIO
    zz = jnp.maximum(cans[..., 2], jnp.where(inb, od, cans[..., 2]))
    clamped = jnp.concatenate([cans[..., :2], zz[..., None]], axis=-1)
    return weights, clamped


def _vote_grid_init(cans, weights, num_quan: int = 2):
    """Mean-shift initialization: scatter weights into a (2q)^3 grid over
    [-1, 1]^3, take the LAST maximal cell in row-major order, return its
    center (/root/reference/model/hourglass_um_crop_tiny.py:704-712).

    cans: (..., n, 3); weights: (..., n).  Vectorized as a one-hot matmul
    instead of scatter_nd.
    """
    g = 2 * num_quan
    q = jnp.clip((cans + 1.0) * num_quan, 0.0, g - 0.1).astype(jnp.int32)
    flat = (q[..., 0] * g + q[..., 1]) * g + q[..., 2]               # (...,n)
    onehot = jax.nn.one_hot(flat, g ** 3, dtype=weights.dtype)
    votes = jnp.einsum("...n,...nc->...c", weights, onehot)          # (...,g^3)
    # last occurrence of the max in row-major order
    last_idx = (g ** 3 - 1) - jnp.argmax(votes[..., ::-1], axis=-1)
    iz = last_idx % g
    iy = (last_idx // g) % g
    ix = last_idx // (g * g)
    center = (jnp.stack([ix, iy, iz], axis=-1).astype(cans.dtype) / num_quan
              - 1.0 + 0.5 / num_quan)
    return center                                                     # (...,3)


def weighted_mean_shift(cans, weights, num_it: int, band_width: float):
    """Weighted Gaussian mean shift from the voting-grid init
    (/root/reference/model/hourglass_um_crop_tiny.py:684-741).

    cans: (..., n, 3); weights: (..., n).  Returns (..., 3).
    """
    inv_sigma = -1.0 / (2.0 * band_width * band_width)
    cur = _vote_grid_init(cans, weights)

    def body(_, cur):
        d2 = jnp.sum(jnp.square(cans - cur[..., None, :]), axis=-1)
        s = jnp.exp(inv_sigma * d2) * weights
        num = jnp.sum(cans * s[..., None], axis=-2)
        den = jnp.sum(s, axis=-1, keepdims=True)
        # all-zero weights (every candidate reprojected off-image) would
        # divide 0/0 — the reference NaNs here (hourglass_um_crop_tiny.py:
        # 719-720); we keep the voting-grid estimate instead.
        return jnp.where(den > 0.0, num / jnp.where(den > 0.0, den, 1.0), cur)

    return jax.lax.fori_loop(0, num_it, body, cur)


def mean_shift(cans, num_it: int = 10, band_width: float = 0.8):
    """Unweighted variant (/root/reference/model/hourglass_um_crop_tiny.py:
    545-596), kept for the reference's alternative decode scheme."""
    return weighted_mean_shift(cans, jnp.ones(cans.shape[:-1], cans.dtype),
                               num_it, band_width)


def decode_poses(hms, hm3s, ums, tiny_dms, cfgs, coms,
                 cfg: EvalConfig = EvalConfig()):
    """Full decode: last-stack head outputs -> xyz joints (mm).

    Equivalent of ``_resume_om`` + ``_xyz_estimation`` + unnormalization
    (/root/reference/model/hourglass_um_crop_tiny.py:442-471,743-785).

    Args:
      hms/hm3s: (b, h, w, j); ums: (b, h, w, 3j);
      tiny_dms: (b, h, w, 1) normalized depth at heatmap resolution;
      cfgs: (b, 6); coms: (b, 3).
    Returns:
      dict with ``xyz (b, 3j) mm``, ``normed (b, j, 3)``,
      ``candidates (b, j, n, 3)``, ``weights (b, j, n)``.
    """
    b, h, w, j = hms.shape

    if cfg.use_pallas:
        # the fully fused kernel covers every stage below (backprojection,
        # refined scores, top-k, weights, vote init, mean shift)
        from densereg_tpu.ops.fused_decode import fused_decode

        # Mosaic targets TPU; interpret everywhere else so --use_pallas is
        # safe on any backend
        interpret = cfg.pallas_interpret or jax.default_backend() != "tpu"
        normed = fused_decode(hms, hm3s, ums, tiny_dms, cfgs, coms,
                              num_pt=cfg.num_candidates,
                              num_it=cfg.mean_shift_iters,
                              band_width=cfg.band_width,
                              interpret=interpret)
        xyz = geometry.unnorm_xyz_pose(normed.reshape(b, -1), coms)
        return {"xyz": xyz, "normed": normed, "candidates": None,
                "weights": None}

    xyzs = geometry.backproject_dm(tiny_dms, cfgs, coms)              # (b,h,w,3)

    # Top-k FIRST, then reconstruct offsets only at the k selected pixels —
    # the reference materializes the full (b,h,w,3j) offset volume and then
    # gathers (hourglass_um_crop_tiny.py:756-771), which at serving batch
    # sizes is hundreds of MB of HBM traffic for 5 survivors per joint.
    refined = refined_heatmaps(hms, hm3s, tiny_dms)
    scores = refined.reshape(b, h * w, j).transpose(0, 2, 1)          # (b,j,hw)
    _, top_idx = jax.lax.top_k(scores, cfg.num_candidates)            # (b,j,n)

    xyz_sel = jnp.take_along_axis(                                    # (b,j,n,3)
        xyzs.reshape(b, 1, h * w, 3), top_idx[..., None], axis=2)
    hm3_sel = jnp.take_along_axis(
        hm3s.reshape(b, h * w, j).transpose(0, 2, 1), top_idx, axis=2)
    um_sel = jnp.take_along_axis(                                     # (b,j,n,3)
        ums.reshape(b, h * w, j, 3).transpose(0, 2, 1, 3),
        top_idx[..., None], axis=2)
    dist = MAX_DIST_3D - hm3_sel * MAX_DIST_3D                        # |offset|
    cans = xyz_sel + um_sel * dist[..., None]
    weights, _ = candidate_weights(cans, coms, cfgs, hms, tiny_dms)

    normed = weighted_mean_shift(
        cans, weights, cfg.mean_shift_iters, cfg.band_width)

    xyz = geometry.unnorm_xyz_pose(normed.reshape(b, -1), coms)
    return {"xyz": xyz, "normed": normed, "candidates": cans,
            "weights": weights}


def uvd_argmax(hms, ds):
    """Heatmap-argmax fallback estimator
    (/root/reference/model/hourglass_um_crop_tiny.py:788-814): first maximal
    pixel per joint, paired with the provided depth map value.

    Args: hms, ds: (b, h, w, j).  Returns (b, 3j) uvd.
    """
    b, h, w, j = hms.shape
    flat = hms.reshape(b, h * w, j)
    idx = jnp.argmax(flat, axis=1)                                    # (b,j)
    uu = (idx % w).astype(jnp.float32)
    vv = (idx // w).astype(jnp.float32)
    dd = jnp.take_along_axis(ds.reshape(b, h * w, j), idx[:, None, :],
                             axis=1)[:, 0, :]
    return jnp.stack([uu, vv, dd], axis=-1).reshape(b, 3 * j)
