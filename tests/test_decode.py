import jax.numpy as jnp
import numpy as np

from densereg_tpu import decode, geometry, targets
from densereg_tpu.config import CameraConfig, EvalConfig
from densereg_tpu.preprocess import norm_dm

ICVL = CameraConfig(fx=241.42, fy=241.42, cx=160, cy=120, w=320, h=240)


def _gt_scene(rng, b=2, j=5):
    """Ground-truth heatmaps/offsets for a synthetic flat-depth scene; the
    decoder must recover the pose from them almost exactly (every candidate
    equals the joint by construction since om = pose - xyz)."""
    cfg128 = np.asarray(geometry.scale_cfg(ICVL.as_array(), 128, 128))
    cfgs = np.tile(cfg128, (b, 1)).astype(np.float32)
    coms = np.tile(np.array([[0.0, 0.0, 400.0]], np.float32), (b, 1))
    poses = np.zeros((b, j, 3), np.float32)
    poses[..., 0] = rng.uniform(-35, 35, (b, j))
    poses[..., 1] = rng.uniform(-35, 35, (b, j))
    poses[..., 2] = rng.uniform(380, 420, (b, j))
    poses = poses.reshape(b, -1)
    dms = np.full((b, 128, 128, 1), 400.0, np.float32)
    normed = norm_dm(jnp.asarray(dms), jnp.asarray(coms))
    out = targets.synthesize(jnp.asarray(poses), jnp.asarray(cfgs),
                             jnp.asarray(coms), normed, 32, 32)
    return poses, cfgs, coms, out


def test_decode_recovers_gt_pose(rng):
    poses, cfgs, coms, gt = _gt_scene(rng)
    res = decode.decode_poses(gt["hm2"], gt["hm3"], gt["um"], gt["tiny_dm"],
                              jnp.asarray(cfgs), jnp.asarray(coms))
    err = np.abs(np.asarray(res["xyz"]) - poses).reshape(-1, 3)
    max_mm = np.linalg.norm(err, axis=-1).max()
    assert max_mm < 1.0, f"decode error {max_mm:.3f}mm on perfect maps"


def test_candidates_equal_joint_on_gt(rng):
    poses, cfgs, coms, gt = _gt_scene(rng, b=1, j=3)
    from densereg_tpu.targets import resume_offset_maps
    oms = resume_offset_maps(gt["hm3"], gt["um"])
    xyzs = geometry.backproject_dm(gt["tiny_dm"], jnp.asarray(cfgs),
                                   jnp.asarray(coms))
    cand_xyz = jnp.tile(xyzs, (1, 1, 1, 3)) + oms
    refined = decode.refined_heatmaps(gt["hm2"], gt["hm3"], gt["tiny_dm"])
    _, cans, _ = decode.generate_candidates(refined, cand_xyz, 5)
    normed_pose = np.asarray(geometry.norm_xyz_pose(
        jnp.asarray(poses), jnp.asarray(coms))).reshape(1, 3, 1, 3)
    np.testing.assert_allclose(np.asarray(cans), np.broadcast_to(
        normed_pose, cans.shape), atol=2e-3)


def test_vote_grid_init_last_max_tiebreak():
    # two clusters with equal total weight -> reference picks the LAST
    # maximal cell in row-major (x,y,z) order
    cans = jnp.asarray(np.array(
        [[-0.9, -0.9, -0.9], [-0.9, -0.9, -0.9],
         [0.9, 0.9, 0.9], [0.9, 0.9, 0.9]], np.float32))
    w = jnp.ones((4,), jnp.float32)
    init = np.asarray(decode._vote_grid_init(cans, w))
    np.testing.assert_allclose(init, [0.75, 0.75, 0.75], atol=1e-6)


def test_weighted_mean_shift_converges_to_heavy_cluster():
    pts = np.array([[0.5, 0.5, 0.5]] * 6 + [[-0.5, -0.5, -0.5]] * 4, np.float32)
    w = np.array([1.0] * 6 + [0.2] * 4, np.float32)
    out = np.asarray(decode.weighted_mean_shift(
        jnp.asarray(pts), jnp.asarray(w), 10, 0.4))
    np.testing.assert_allclose(out, [0.5, 0.5, 0.5], atol=0.05)


def test_out_of_image_candidates_get_zero_weight(rng):
    b, h, w, j = 1, 32, 32, 2
    hms = jnp.ones((b, h, w, j), jnp.float32)
    tiny = jnp.zeros((b, h, w, 1), jnp.float32)
    cfgs = jnp.asarray(np.tile(np.asarray(
        geometry.scale_cfg(ICVL.as_array(), 128, 128)), (b, 1)))
    coms = jnp.asarray(np.array([[0.0, 0.0, 400.0]], np.float32))
    # one candidate far off-image (x >> fov), one at center
    cans = jnp.asarray(np.array(
        [[[[50.0, 0.0, 0.0], [0.0, 0.0, 0.0]],
          [[0.0, 0.0, 0.0], [0.0, -50.0, 0.0]]]], np.float32))
    weights, _ = decode.candidate_weights(cans, coms, cfgs, hms, tiny)
    wv = np.asarray(weights)
    assert wv[0, 0, 0] == 0.0 and wv[0, 1, 1] == 0.0
    assert wv[0, 0, 1] == 1.0 and wv[0, 1, 0] == 1.0


def test_uvd_argmax():
    hm = np.zeros((1, 32, 32, 2), np.float32)
    hm[0, 5, 7, 0] = 1.0
    hm[0, 20, 3, 1] = 1.0
    ds = np.full((1, 32, 32, 2), 0.33, np.float32)
    out = np.asarray(decode.uvd_argmax(jnp.asarray(hm), jnp.asarray(ds)))
    np.testing.assert_allclose(out[0], [7, 5, 0.33, 3, 20, 0.33], atol=1e-6)


def test_zero_weight_mean_shift_no_nan():
    """All-zero candidate weights (every reprojection off-image) must not
    produce NaN; the voting-grid init is kept instead (the reference NaNs
    here)."""
    import jax.numpy as jnp
    cans = jnp.asarray(np.full((1, 2, 5, 3), 0.3, np.float32))
    w = jnp.zeros((1, 2, 5), jnp.float32)
    out = np.asarray(decode.weighted_mean_shift(cans, w, 10, 0.4))
    assert np.isfinite(out).all()
    # all-zero votes -> last-max tiebreak picks the final cell (0.75 center)
    np.testing.assert_allclose(out, 0.75, atol=1e-6)
