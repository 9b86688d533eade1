import jax
import jax.numpy as jnp
import numpy as np

from densereg_tpu import geometry
from densereg_tpu.config import CameraConfig, POSE_NORM_RATIO

ICVL_CFG = CameraConfig(fx=241.42, fy=241.42, cx=160, cy=120, w=320, h=240)


def _np_xyz2uvd(xyz, cfg):
    xyz = xyz.reshape(-1, 3)
    u = xyz[:, 0] * cfg.fx / xyz[:, 2] + cfg.cx
    v = xyz[:, 1] * cfg.fy / xyz[:, 2] + cfg.cy
    return np.stack([u, v, xyz[:, 2]], -1)


def test_xyz2uvd_matches_reference_math(rng):
    xyz = rng.normal(0, 50, (16, 3)).astype(np.float32)
    xyz[:, 2] = rng.uniform(200, 600, 16)
    got = geometry.xyz2uvd(jnp.asarray(xyz.reshape(-1)), ICVL_CFG.as_array())
    np.testing.assert_allclose(np.asarray(got).reshape(-1, 3),
                               _np_xyz2uvd(xyz, ICVL_CFG), rtol=1e-5)


def test_uvd_roundtrip(rng):
    xyz = rng.normal(0, 50, (21, 3)).astype(np.float32)
    xyz[:, 2] = rng.uniform(200, 600, 21)
    cfg = ICVL_CFG.as_array()
    back = geometry.uvd2xyz(geometry.xyz2uvd(xyz, cfg), cfg)
    np.testing.assert_allclose(np.asarray(back), xyz, rtol=1e-4, atol=1e-3)


def test_batched_cfgs(rng):
    xyz = rng.normal(0, 50, (4, 16 * 3)).astype(np.float32)
    xyz.reshape(4, 16, 3)[..., 2] = rng.uniform(200, 600, (4, 16))
    cfgs = np.tile(np.asarray(ICVL_CFG, np.float32), (4, 1))
    cfgs[:, 0] += np.arange(4)  # distinct fx per sample
    got = geometry.xyz2uvd(jnp.asarray(xyz), jnp.asarray(cfgs))
    for i in range(4):
        one = geometry.xyz2uvd(jnp.asarray(xyz[i]), jnp.asarray(cfgs[i]))
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(one), rtol=1e-6)


def test_scale_cfg():
    scaled = geometry.scale_cfg(ICVL_CFG.as_array(), 32, 32)
    s = np.asarray(scaled)
    assert s[4] == 32 and s[5] == 32
    np.testing.assert_allclose(s[0], ICVL_CFG.fx / (ICVL_CFG.w / 32), rtol=1e-6)
    np.testing.assert_allclose(s[3], ICVL_CFG.cy / (ICVL_CFG.h / 32), rtol=1e-6)


def test_pose_norm_roundtrip(rng):
    poses = rng.normal(0, 80, (8, 48)).astype(np.float32)
    coms = rng.normal(0, 30, (8, 3)).astype(np.float32)
    n = geometry.norm_xyz_pose(jnp.asarray(poses), jnp.asarray(coms))
    back = geometry.unnorm_xyz_pose(n, jnp.asarray(coms))
    np.testing.assert_allclose(np.asarray(back), poses, rtol=1e-5, atol=1e-4)
    # definition check on one joint
    np.testing.assert_allclose(
        np.asarray(n)[0, :3], (poses[0, :3] - coms[0]) / POSE_NORM_RATIO,
        rtol=1e-6)


def test_backproject_consistency(rng):
    """A pixel's backprojected uv must project back to that pixel, and valid
    depths must round-trip the normalization."""
    from densereg_tpu.config import D_RANGE

    h = w = 32
    com = np.array([10.0, -5.0, 400.0], np.float32)
    normed = rng.uniform(-0.4, 0.9, (h, w, 1)).astype(np.float32)
    cfg128 = np.asarray(geometry.scale_cfg(ICVL_CFG.as_array(), 128, 128))
    xyz = np.asarray(geometry.backproject_dm(jnp.asarray(normed),
                                             jnp.asarray(cfg128),
                                             jnp.asarray(com)))
    assert xyz.shape == (h, w, 3)
    # z round-trip: normalized z = (depth - com_z)/100 where depth =
    # normed*300 + com_z - 150
    depth = normed[..., 0] * D_RANGE + com[2] - D_RANGE / 2
    np.testing.assert_allclose(xyz[..., 2], (depth - com[2]) / 100.0,
                               rtol=1e-4, atol=1e-4)
    # reprojection: unnormalized point at (r, c) hits pixel (c, r) of the map
    cfg32 = np.asarray(geometry.scale_cfg(jnp.asarray(cfg128), w, h))
    mm = xyz * 100.0 + com
    uvd = np.asarray(geometry.xyz2uvd(jnp.asarray(mm.reshape(-1)),
                                      jnp.asarray(cfg32))).reshape(h, w, 3)
    cols = np.broadcast_to(np.arange(w)[None, :], (h, w))
    rows = np.broadcast_to(np.arange(h)[:, None], (h, w))
    np.testing.assert_allclose(uvd[..., 0], cols, atol=1e-3)
    np.testing.assert_allclose(uvd[..., 1], rows, atol=1e-3)


def test_backproject_invalid_pixels_on_far_plane():
    com = np.array([0.0, 0.0, 400.0], np.float32)
    normed = -np.ones((8, 8, 1), np.float32)
    cfg = np.asarray(geometry.scale_cfg(ICVL_CFG.as_array(), 8, 8))
    xyz = np.asarray(geometry.backproject_dm(jnp.asarray(normed),
                                             jnp.asarray(cfg), jnp.asarray(com)))
    np.testing.assert_allclose(xyz[..., 2], 1.5, atol=1e-5)  # (com+150-com)/100
