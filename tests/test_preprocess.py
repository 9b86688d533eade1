import jax.numpy as jnp
import numpy as np
import pytest

from densereg_tpu import geometry, preprocess
from densereg_tpu.config import CameraConfig, D_RANGE

ICVL = CameraConfig(fx=241.42, fy=241.42, cx=160, cy=120, w=320, h=240)


# --- independent numpy model of the reference crop pipeline -----------------

def np_legacy_bilinear(img, out_h, out_w):
    h, w = img.shape[:2]
    out = np.zeros((out_h, out_w), np.float32)
    for i in range(out_h):
        for jj in range(out_w):
            sy = i * h / out_h
            sx = jj * w / out_w
            y0 = min(int(np.floor(sy)), h - 1)
            x0 = min(int(np.floor(sx)), w - 1)
            y1 = min(y0 + 1, h - 1)
            x1 = min(x0 + 1, w - 1)
            fy, fx = sy - y0, sx - x0
            t = img[y0, x0] + (img[y0, x1] - img[y0, x0]) * fx
            b = img[y1, x0] + (img[y1, x1] - img[y1, x0]) * fx
            out[i, jj] = t + (b - t) * fy
    return out


def np_reference_crop(dm, top, left, bottom, right, out_h, out_w):
    """crop -> center-pad-to-square -> legacy bilinear, literally as the
    reference does with dynamic shapes (/root/reference/data/preprocess.py:
    39-53)."""
    crop = dm[top:bottom, left:right]
    hbox, wbox = crop.shape
    le = max(hbox, wbox)
    oh = int((le - hbox) / 2)
    ow = int((le - wbox) / 2)
    padded = np.zeros((le, le), np.float32)
    padded[oh:oh + hbox, ow:ow + wbox] = crop
    return np_legacy_bilinear(padded, out_h, out_w)


def _hand_scene(rng):
    """Synthetic scene: plane of blobs at ~400mm within a region, background
    at 2000mm masked out as 0 elsewhere."""
    dm = np.zeros((240, 320), np.float32)
    dm[80:200, 100:260] = rng.uniform(350, 450, (120, 160)).astype(np.float32)
    pose = np.zeros((16, 3), np.float32)
    pose[:, 0] = rng.uniform(-40, 40, 16)
    pose[:, 1] = rng.uniform(-30, 30, 16)
    pose[:, 2] = rng.uniform(360, 440, 16)
    return dm, pose.reshape(-1)


def test_crop_matches_reference_semantics(rng):
    dm, pose = _hand_scene(rng)
    cfg = np.asarray(ICVL, np.float32)
    cropped, _, new_cfg = preprocess.crop_from_xyz_pose(
        jnp.asarray(dm[..., None]), jnp.asarray(pose), jnp.asarray(cfg),
        128, 128, fixed_bg_threshold=500.0)
    cropped = np.asarray(cropped)[..., 0]

    # recompute the bbox with the same math
    uvd = np.asarray(geometry.xyz2uvd(jnp.asarray(pose), jnp.asarray(cfg))
                     ).reshape(-1, 3)
    pad = 20.0
    mn, mx = uvd.min(0), uvd.max(0)
    top = int(min(max(mn[1] - pad, 0), ICVL.h - 2 * pad))
    left = int(min(max(mn[0] - pad, 0), ICVL.w - 2 * pad))
    bottom = int(max(min(mx[1] + pad, ICVL.h), top + 2 * pad - 1))
    right = int(max(min(mx[0] + pad, ICVL.w), left + 2 * pad - 1))

    expect = np_reference_crop(dm, top, left, bottom, right, 128, 128)
    expect = np.where(expect < 500.0, expect, 0.0)
    np.testing.assert_allclose(cropped, expect, rtol=1e-4, atol=1e-2)

    # new cfg: reprojecting the pose with it must land inside the 128 crop
    uvd_new = np.asarray(geometry.xyz2uvd(jnp.asarray(pose), new_cfg)
                         ).reshape(-1, 3)
    assert (uvd_new[:, 0] > 0).all() and (uvd_new[:, 0] < 128).all()
    assert (uvd_new[:, 1] > 0).all() and (uvd_new[:, 1] < 128).all()


def test_crop_geometry_roundtrip(rng):
    """A point visible at source pixel (u,v) must appear at the new_cfg
    projection of its xyz in the crop."""
    dm, pose = _hand_scene(rng)
    cfg = np.asarray(ICVL, np.float32)
    marker_xyz = pose.reshape(-1, 3)[3]
    uv = np.asarray(geometry.xyz2uvd(jnp.asarray(marker_xyz), jnp.asarray(cfg)))
    u, v = int(round(uv[0])), int(round(uv[1]))
    dm_marked = dm.copy()
    dm_marked[v, u] = 423.0  # distinctive value

    cropped, _, new_cfg = preprocess.crop_from_bbx(
        jnp.asarray(dm_marked[..., None]), jnp.asarray(pose),
        jnp.asarray(np.array([60.0, 80.0, 220.0, 280.0, 500.0], np.float32)),
        jnp.asarray(cfg), 128, 128)
    uv_new = np.asarray(geometry.xyz2uvd(
        jnp.asarray(np.array([uv[0], uv[1], 423.0], np.float32) * 0 +
                    np.array([marker_xyz[0], marker_xyz[1], marker_xyz[2]],
                             np.float32)), new_cfg))
    cu, cv = int(round(uv_new[0])), int(round(uv_new[1]))
    patch = np.asarray(cropped)[max(cv - 2, 0):cv + 3, max(cu - 2, 0):cu + 3, 0]
    # the marker depth should dominate a small neighbourhood
    assert patch.size and abs(patch - 423.0).min() < 40.0


def test_center_of_mass():
    dm = np.zeros((128, 128, 1), np.float32)
    dm[40:80, 40:80, 0] = 400.0
    cfg = np.asarray(geometry.scale_cfg(ICVL.as_array(), 128, 128))
    com = np.asarray(preprocess.center_of_mass(jnp.asarray(dm), jnp.asarray(cfg)))
    np.testing.assert_allclose(com[2], 400.0, rtol=1e-5)
    # u = 64 = scaled cx (160/2.5=64) -> x == 0
    np.testing.assert_allclose(com[0], (64 - cfg[2]) * 400 / cfg[0], atol=1e-4)


def test_center_of_mass_floor_and_empty():
    cfg = np.asarray(geometry.scale_cfg(ICVL.as_array(), 128, 128))
    dm = np.full((128, 128, 1), 120.0, np.float32)
    com = np.asarray(preprocess.center_of_mass(jnp.asarray(dm), jnp.asarray(cfg)))
    np.testing.assert_allclose(com[2], 200.0)  # floored
    empty = np.zeros((128, 128, 1), np.float32)
    com = np.asarray(preprocess.center_of_mass(jnp.asarray(empty), jnp.asarray(cfg)))
    assert np.isfinite(com).all()


def test_norm_dm_window():
    com = np.array([[0.0, 0.0, 400.0]], np.float32)
    vals = np.array([400.0, 250.0, 549.0, 551.0, 101.0, 99.0, 0.0], np.float32)
    dm = np.zeros((1, 1, 7, 1), np.float32)
    dm[0, 0, :, 0] = vals
    out = np.asarray(preprocess.norm_dm(jnp.asarray(dm), jnp.asarray(com)))[0, 0, :, 0]
    np.testing.assert_allclose(out[0], 0.5, atol=1e-6)          # com depth
    np.testing.assert_allclose(out[1], 0.0, atol=1e-6)          # com - 150
    assert 0.99 < out[2] <= 1.0                                  # just inside top
    np.testing.assert_allclose(out[3], -1.0)                     # beyond +150
    assert out[4] > -1.0                                         # > com-300
    np.testing.assert_allclose(out[5], -1.0)                     # below window
    np.testing.assert_allclose(out[6], -1.0)                     # invalid 0


def test_area_resize_is_box_mean(rng):
    x = rng.normal(size=(2, 128, 128, 3)).astype(np.float32)
    out = np.asarray(preprocess.area_resize(jnp.asarray(x), 32, 32))
    expect = x.reshape(2, 32, 4, 32, 4, 3).mean(axis=(2, 4))
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)


def test_method2_resize_is_exact_subsample(rng):
    x = rng.normal(size=(2, 128, 128, 3)).astype(np.float32)
    out = np.asarray(preprocess.method2_resize(jnp.asarray(x), 32, 32))
    np.testing.assert_array_equal(out, x[:, ::4, ::4, :])


def test_method2_resize_matches_tf1_method2(rng):
    """Authoritative pin: the reference's ``tf.image.resize_images(x, s, 2)``
    (TF1 enum 2 = BICUBIC, legacy coordinates) collapses to an exact point
    subsample for integer-ratio shrinks — compare against real TF."""
    tf = pytest.importorskip("tensorflow")
    x = rng.normal(size=(2, 32, 32, 4)).astype(np.float32)
    want = tf.compat.v1.image.resize_images(tf.constant(x), (8, 8), 2).numpy()
    got = np.asarray(preprocess.method2_resize(jnp.asarray(x), 8, 8))
    np.testing.assert_array_equal(got, want)


def test_resize_bilinear_legacy(rng):
    x = rng.normal(size=(9, 7)).astype(np.float32)
    out = np.asarray(preprocess.resize_bilinear(
        jnp.asarray(x[..., None][None]), 17, 13))[0, ..., 0]
    expect = np_legacy_bilinear(x, 17, 13)
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_preprocess_batch(rng):
    dms, poses = [], []
    for _ in range(3):
        d, p = _hand_scene(rng)
        dms.append(d[..., None])
        poses.append(p)
    dms = jnp.asarray(np.stack(dms))
    poses = jnp.asarray(np.stack(poses))
    c, p, cfgs, coms = preprocess.preprocess_batch_from_pose(
        dms, poses, ICVL.as_array(), 128, 128, 500.0)
    assert c.shape == (3, 128, 128, 1)
    assert cfgs.shape == (3, 6) and coms.shape == (3, 3)
    assert np.asarray(coms)[:, 2].min() >= 200.0


def test_preprocess_batch_uint16_matches_float32(rng):
    """The host pipeline transfers depth in the shards' native uint16; the
    on-device cast must give bit-identical results to a float32 feed."""
    dms, poses = [], []
    for _ in range(3):
        d, p = _hand_scene(rng)
        dms.append(np.round(d)[..., None])  # integer mm, as stored
        poses.append(p)
    dms = np.stack(dms)
    poses = jnp.asarray(np.stack(poses))
    out_f32 = preprocess.preprocess_batch_from_pose(
        jnp.asarray(dms, jnp.float32), poses, ICVL.as_array(), 128, 128, 500.0)
    out_u16 = preprocess.preprocess_batch_from_pose(
        jnp.asarray(dms.astype(np.uint16)), poses, ICVL.as_array(),
        128, 128, 500.0)
    for a, b in zip(out_f32, out_u16):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
