import jax.numpy as jnp
import numpy as np

from densereg_tpu import geometry, targets
from densereg_tpu.config import CameraConfig, MAX_DIST_2D, MAX_DIST_3D

CFG128 = np.asarray(geometry.scale_cfg(
    CameraConfig(fx=241.42, fy=241.42, cx=160, cy=120, w=320, h=240).as_array(),
    128, 128))


def _sample_batch(rng, b=2, j=16):
    poses = np.zeros((b, j, 3), np.float32)
    poses[..., 0] = rng.uniform(-60, 60, (b, j))
    poses[..., 1] = rng.uniform(-60, 60, (b, j))
    poses[..., 2] = rng.uniform(350, 450, (b, j))
    coms = np.stack([poses[:, :, 0].mean(1), poses[:, :, 1].mean(1),
                     poses[:, :, 2].mean(1)], -1).astype(np.float32)
    cfgs = np.tile(CFG128, (b, 1)).astype(np.float32)
    return poses.reshape(b, -1), cfgs, coms


def test_hm2d_peak_at_projection(rng):
    poses, cfgs, _ = _sample_batch(rng)
    hm = np.asarray(targets.hm2d(jnp.asarray(poses), jnp.asarray(cfgs), 32, 32))
    assert hm.shape == (2, 32, 32, 16)
    assert hm.min() >= 0.0 and hm.max() <= 1.0
    uvd = np.asarray(geometry.xyz2uvd(
        jnp.asarray(poses), geometry.scale_cfg(jnp.asarray(cfgs), 32, 32))
    ).reshape(2, 16, 3)
    for bidx in range(2):
        for jidx in range(16):
            u, v = uvd[bidx, jidx, :2]
            if 1 <= u < 31 and 1 <= v < 31:
                r, c = np.unravel_index(hm[bidx, :, :, jidx].argmax(), (32, 32))
                # peak within 1 px of the projection
                assert abs(c - u) <= 1.0 and abs(r - v) <= 1.0
                # exact cone value at the peak pixel
                d = np.hypot(c - u, r - v)
                expect = max(0.0, (MAX_DIST_2D - d) / MAX_DIST_2D)
                np.testing.assert_allclose(hm[bidx, r, c, jidx], expect,
                                           atol=1e-4)


def test_hm3_um_om_self_consistency(rng):
    """resume_om(hm3(om), um(om, hm3)) must reproduce om wherever |om| is
    inside the 3D cone (the SURVEY.md §4 consistency invariant)."""
    b, h, w, j = 2, 8, 8, 5
    om = rng.uniform(-1.2, 1.2, (b, h, w, 3 * j)).astype(np.float32)
    hm3 = targets.hm3d(jnp.asarray(om))
    um = targets.unit_offset_maps(jnp.asarray(om), hm3)
    back = np.asarray(targets.resume_offset_maps(hm3, um))

    mag = np.linalg.norm(om.reshape(b, h, w, j, 3), axis=-1)
    inside = np.repeat(mag < MAX_DIST_3D - 1e-2, 3, axis=-1).reshape(om.shape)
    np.testing.assert_allclose(back[inside], om[inside], rtol=1e-4, atol=1e-5)
    # outside the cone everything collapses to the cutoff sphere: um is 0
    np.testing.assert_allclose(back[~inside], 0.0, atol=1e-6)

    # unit vectors are unit where defined
    umr = np.asarray(um).reshape(b, h, w, j, 3)
    norms = np.linalg.norm(umr, axis=-1)
    defined = (mag < MAX_DIST_3D - 1e-2) & (mag > 1e-3)
    np.testing.assert_allclose(norms[defined], 1.0, rtol=1e-3)


def test_hm3_cone_definition(rng):
    om = np.zeros((1, 1, 1, 3), np.float32)
    om[..., 0] = 0.4  # |om| = 0.4
    val = float(np.asarray(targets.hm3d(jnp.asarray(om)))[0, 0, 0, 0])
    np.testing.assert_allclose(val, (MAX_DIST_3D - 0.4) / MAX_DIST_3D, rtol=1e-6)


def test_synthesize_shapes_and_zero_offset_at_joint(rng):
    poses, cfgs, coms = _sample_batch(rng)
    # depth map: every pixel at the com depth -> normalized 0.5
    from densereg_tpu.preprocess import norm_dm
    dms = np.full((2, 128, 128, 1), 1.0, np.float32) * coms[:, 2][:, None, None, None]
    normed = norm_dm(jnp.asarray(dms), jnp.asarray(coms))
    out = targets.synthesize(jnp.asarray(poses), jnp.asarray(cfgs),
                             jnp.asarray(coms), normed, 32, 32)
    assert out["hm2"].shape == (2, 32, 32, 16)
    assert out["hm3"].shape == (2, 32, 32, 16)
    assert out["um"].shape == (2, 32, 32, 48)
    assert out["om"].shape == (2, 32, 32, 48)
    # offset at the joint's own pixel has z == (joint_z - com_z)/100 and the
    # xy offset at the projected pixel is small
    om = np.asarray(out["om"]).reshape(2, 32, 32, 16, 3)
    uvd = np.asarray(geometry.xyz2uvd(
        jnp.asarray(poses), geometry.scale_cfg(jnp.asarray(cfgs), 32, 32))
    ).reshape(2, 16, 3)
    for jidx in range(16):
        u, v = uvd[0, jidx, :2]
        if 0 <= u < 32 and 0 <= v < 32:
            o = om[0, int(round(v)), int(round(u)), jidx]
            assert abs(o[0]) < 0.15 and abs(o[1]) < 0.15


def test_gaussian_heatmaps_peak_and_range(rng):
    uvd = np.array([[5.0, 7.0, 400.0], [20.0, 3.0, 380.0]], np.float32)
    hm = np.asarray(targets.gaussian_heatmaps(
        jnp.asarray(uvd.reshape(-1)), 32, 32, sigma=3.0))
    assert hm.shape == (32, 32, 2)
    # peak of 1 at the (rounded) projection
    assert hm[7, 5, 0] > 0.98 and hm[3, 20, 1] > 0.98
    assert hm.max() <= 1.0 + 1e-6 and hm.min() >= 0.0
    # monotone decay away from the center
    assert hm[7, 5, 0] > hm[7, 9, 0] > hm[7, 14, 0]


def test_um_angle_maps(rng):
    b, h, w, j = 1, 4, 4, 2
    um = np.zeros((b, h, w, 3 * j), np.float32)
    um[..., 0] = 1.0   # joint0: pure +x unit vector
    um[..., 5] = -0.7  # joint1: pure z (the reference NaNs on this case)
    xy = np.asarray(targets.um_xy_angle(jnp.asarray(um)))
    zc = np.asarray(targets.um_z_component(jnp.asarray(um)))
    assert xy.shape == (b, h, w, j) and zc.shape == (b, h, w, j)
    np.testing.assert_allclose(xy[..., 0], np.sin(1.0), rtol=1e-5)
    np.testing.assert_allclose(zc[..., 1], -0.7, rtol=1e-6)
    # pure-z vector: guarded divide gives sin(0) = 0, not NaN
    np.testing.assert_allclose(xy[..., 1], 0.0, atol=1e-6)
    assert np.isfinite(xy).all()
