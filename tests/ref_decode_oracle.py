"""Reference-literal numpy oracle for the vote/mean-shift decoder.

A deliberately UN-idiomatic, loop-for-loop port of the reference's decode
graph (/root/reference/model/hourglass_um_crop_tiny.py:598-785 plus its
helpers), kept independent from ``densereg_tpu.decode`` so the two can be
property-tested against each other on adversarial inputs (near-tie scores,
off-image reprojections, z-clamp boundaries).  The crop path has the same
treatment in test_preprocess.py; this file gives the paper's core
contribution — the decoder — its own literal model.

Reference semantics reproduced here:
- ``_resume_om`` (hourglass_um_crop_tiny.py:276-299): om = um * (R - hm3*R).
- ``generate_xyzs_from_multi_cfgs`` (data/preprocess.py:189-232): point
  cloud from the normalized depth map; background (< -0.99) pixels get
  max_depth; intrinsics rescaled to the tiny map.
- refined scores ``(hm+1)*hm3*mask(dm>-0.99)`` (:764-768).
- ``_generate_candidates`` (:598-627): per-joint ``tf.nn.top_k`` over the
  flattened refined map — sorted descending, ties to the LOWER index.
- ``_get_candidate_weights`` (:629-682): unnormalize, reproject with the
  tiny-map intrinsics, round via ``tf.to_int32(x+0.5)`` (truncation toward
  zero), gather hm with the GPU ``gather_nd`` out-of-bounds-returns-0
  semantics the released models ran under.  The z-clamped candidate output
  is computed and then DISCARDED by ``_xyz_estimation`` (:774 binds it to
  ``_``) — the oracle reproduces that too.
- ``_weighted_mean_shift`` (:684-741): 4^3 voting-grid init over [-1,1]^3
  with scatter-ADD of duplicate cells, LAST-maximal cell in row-major order
  (``tf.where(equal(max))[-1]``), cell-center start, then ``num_it``
  unrolled weighted Gaussian updates.  All-zero weights divide 0/0 -> NaN
  in the reference; the oracle keeps that literal NaN (the production
  decoder deviates: it keeps the grid init — DEVIATIONS.md).
"""

from __future__ import annotations

import numpy as np

D_RANGE = np.float32(300.0)
POSE_NORM_RATIO = np.float32(100.0)


def resume_om(hm3, um, max_dist_3d=0.8):
    """(h,w,j),(h,w,3j) -> (h,w,3j), per hourglass_um_crop_tiny.py:276-299."""
    max_dist_3d = np.float32(max_dist_3d)
    d = max_dist_3d - hm3 * max_dist_3d
    om = np.empty_like(um)
    for j in range(hm3.shape[-1]):
        for c in range(3):
            om[..., 3 * j + c] = um[..., 3 * j + c] * d[..., j]
    return om


def xyzs_from_cfg(dm, cfg, com):
    """Literal ``generate_xyzs_from_multi_cfgs`` inner fn
    (data/preprocess.py:199-228).  The reference's
    ``tf.meshgrid(range(h), range(w))`` (xy indexing) only lines up with the
    (h, w) depth map when h == w — all reference decode maps are square."""
    h, w = dm.shape[0], dm.shape[1]
    assert h == w, "reference meshgrid semantics require square maps"
    zz = dm[..., 0]
    min_depth = com[2] - D_RANGE * np.float32(0.5)
    max_depth = com[2] + D_RANGE * np.float32(0.5)
    zz = np.where(zz < -0.99, max_depth, zz * D_RANGE + min_depth)
    zz = zz.astype(np.float32)
    xx, yy = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32))
    w_ratio = cfg[4] / np.float32(w)
    h_ratio = cfg[5] / np.float32(h)
    fx, fy = cfg[0] / w_ratio, cfg[1] / h_ratio
    cx, cy = cfg[2] / w_ratio, cfg[3] / h_ratio
    xx = (xx - cx) * (zz / fx)
    yy = (yy - cy) * (zz / fy)
    xx = (xx - com[0]) / POSE_NORM_RATIO
    yy = (yy - com[1]) / POSE_NORM_RATIO
    zz = (zz - com[2]) / POSE_NORM_RATIO
    return np.stack([xx, yy, zz], axis=-1)


def top_k(vals, k):
    """``tf.nn.top_k``: descending, equal values keep the lower index first."""
    idx = np.argsort(-vals, kind="stable")[:k]
    return vals[idx], idx


def candidate_weights(xyz_pt, com, cfg, hm, dm):
    """Literal ``_get_candidate_weights`` inner fn
    (hourglass_um_crop_tiny.py:640-676) for ONE sample.

    xyz_pt: (j, n, 3) normalized candidates; hm: (h, w, j); dm: (h, w, 1).
    Returns (weights (j, n, 1), z-clamped candidates (j, n, 3)) — the
    caller (`_xyz_estimation`:774) uses only the weights.
    """
    out_h, out_w = hm.shape[0], hm.shape[1]
    j, n = xyz_pt.shape[0], xyz_pt.shape[1]
    flat = xyz_pt.reshape(-1).astype(np.float32) * POSE_NORM_RATIO + \
        np.tile(com, j * n)
    pts = flat.reshape(-1, 3)
    xx, yy, zz = (xyz_pt.reshape(-1, 3)[:, c] for c in range(3))

    w_ratio = cfg[4] / np.float32(out_w)
    h_ratio = cfg[5] / np.float32(out_h)
    fx, fy = cfg[0] / w_ratio, cfg[1] / h_ratio
    cx, cy = cfg[2] / w_ratio, cfg[3] / h_ratio
    uu = pts[:, 0] * fx / pts[:, 2] + cx        # data/util.py:20 _pro
    vv = pts[:, 1] * fy / pts[:, 2] + cy
    uu = np.trunc(uu + np.float32(0.5)).astype(np.int32)  # tf.to_int32
    vv = np.trunc(vv + np.float32(0.5)).astype(np.int32)
    jj = np.repeat(np.arange(j), n)

    dmn = (dm[..., 0] * D_RANGE - D_RANGE * np.float32(0.5)) / POSE_NORM_RATIO
    weights = np.zeros(j * n, np.float32)
    od = np.zeros(j * n, np.float32)            # OOB gather_nd -> 0 (GPU)
    for i in range(j * n):
        if 0 <= vv[i] < out_h and 0 <= uu[i] < out_w:
            weights[i] = hm[vv[i], uu[i], jj[i]]
            od[i] = dmn[vv[i], uu[i]]
    zz = np.maximum(zz, od)
    clamped = np.stack([xx, yy, zz], axis=-1).reshape(j, n, 3)
    return weights.reshape(j, n, 1), clamped


def weighted_mean_shift_joint(can_pt, weight, num_it=10, band_width=0.4):
    """Literal ``joint_fn`` of ``_weighted_mean_shift``
    (hourglass_um_crop_tiny.py:694-724) for ONE joint.

    can_pt: (n, 3); weight: (n, 1).  All-zero weights NaN (literal)."""
    num_quan = 2.0
    g = int(2 * num_quan)
    quan = np.clip((can_pt + np.float32(1.0)) * np.float32(num_quan),
                   0, 2 * num_quan - 0.1).astype(np.int64)
    quan_hm = np.zeros((g, g, g), np.float32)
    for p, wt in zip(quan, weight[:, 0]):       # scatter_nd ADDS duplicates
        quan_hm[p[0], p[1], p[2]] += wt
    eq = np.argwhere(quan_hm == quan_hm.max())  # row-major, like tf.where
    curr = eq[-1].astype(np.float32) / np.float32(num_quan) - \
        np.float32(1.0) + np.float32(0.5 / num_quan)
    inv_sigma = np.float32(-1.0 / (2 * band_width * band_width))
    with np.errstate(invalid="ignore", divide="ignore"):
        for _ in range(num_it):
            s = np.sum((can_pt - curr) ** 2, axis=-1)
            s = np.exp(inv_sigma * s)[:, None] * weight
            curr = np.sum(can_pt * s, axis=0) / np.sum(s)
    return curr


def decode(hms, hm3s, ums, tiny_dms, cfgs, coms, num_pt=5, num_it=10,
           band_width=0.4, max_dist_3d=0.8):
    """Full literal decode: ``test()``'s `_resume_om` + ``_xyz_estimation``
    (hourglass_um_crop_tiny.py:457-459,743-785).

    Returns dict: ``normed (b, j, 3)``, ``xyz (b, 3j) mm``,
    ``candidates (b, j, n, 3)``, ``weights (b, j, n)``.
    """
    b, h, w, j = hms.shape
    normed = np.zeros((b, j, 3), np.float32)
    all_cans = np.zeros((b, j, num_pt, 3), np.float32)
    all_w = np.zeros((b, j, num_pt), np.float32)
    for i in range(b):
        om = resume_om(hm3s[i], ums[i], max_dist_3d)
        xyz = xyzs_from_cfg(tiny_dms[i], cfgs[i], coms[i])
        xyzs = np.tile(xyz, (1, 1, j)) + om                       # (h,w,3j)
        mask = np.where(tiny_dms[i] < -0.99, np.float32(0),
                        np.float32(1))                            # (h,w,1)
        refined = (hms[i] + np.float32(1.0)) * hm3s[i] * mask
        rflat = refined.reshape(-1, j)
        xflat = xyzs.reshape(-1, 3 * j)
        cans = np.zeros((j, num_pt, 3), np.float32)
        for jj in range(j):                                       # :616-621
            _, idx = top_k(rflat[:, jj], num_pt)
            cans[jj] = np.stack([xflat[idx, 3 * jj],
                                 xflat[idx, 3 * jj + 1],
                                 xflat[idx, 3 * jj + 2]], axis=1)
        weights, _ = candidate_weights(cans, coms[i], cfgs[i], hms[i],
                                       tiny_dms[i])
        for jj in range(j):
            normed[i, jj] = weighted_mean_shift_joint(
                cans[jj], weights[jj], num_it, band_width)
        all_cans[i] = cans
        all_w[i] = weights[..., 0]
    xyz_mm = normed.reshape(b, -1) * POSE_NORM_RATIO + \
        np.tile(coms, (1, j))
    return {"normed": normed, "xyz": xyz_mm, "candidates": all_cans,
            "weights": all_w}
