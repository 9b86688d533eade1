"""Augmentation: the image warp and the pose transform must stay consistent
(a depth marker placed at a joint's pixel must follow the transformed joint),
and parameters must respect the reference's ranges
(/root/reference/data/preprocess.py:238-251)."""

import jax
import jax.numpy as jnp
import numpy as np

from densereg_tpu import augment, geometry
from densereg_tpu.config import CameraConfig

ICVL = CameraConfig(fx=241.42, fy=241.42, cx=160, cy=120, w=320, h=240)


def _setup(rng):
    cfg = np.asarray(geometry.scale_cfg(ICVL.as_array(), 128, 128))
    com = np.array([0.0, 0.0, 400.0], np.float32)
    pose = np.zeros((16, 3), np.float32)
    pose[:, 0] = rng.uniform(-40, 40, 16)
    pose[:, 1] = rng.uniform(-40, 40, 16)
    pose[:, 2] = rng.uniform(380, 420, 16)
    dm = np.full((128, 128, 1), 400.0, np.float32)
    return dm, pose.reshape(-1), cfg, com


def test_pose_image_consistency(rng):
    dm, pose, cfg, com = _setup(rng)
    # stamp distinctive depths at each joint's pixel
    uvd = np.asarray(geometry.xyz2uvd(jnp.asarray(pose), jnp.asarray(cfg))
                     ).reshape(-1, 3)
    markers = 300.0 + 5.0 * np.arange(16)
    for k, (u, v, _) in enumerate(uvd):
        ui, vi = int(round(u)), int(round(v))
        if 2 <= ui < 126 and 2 <= vi < 126:
            dm[vi - 1:vi + 2, ui - 1:ui + 2, 0] = markers[k]

    new_dm, new_pose = augment.augment_one(
        jax.random.key(3), jnp.asarray(dm), jnp.asarray(pose),
        jnp.asarray(cfg), jnp.asarray(com))
    new_uvd = np.asarray(geometry.xyz2uvd(new_pose, jnp.asarray(cfg))
                         ).reshape(-1, 3)
    new_dm = np.asarray(new_dm)[..., 0]

    checked = 0
    for k, (u, v, _) in enumerate(new_uvd):
        ui, vi = int(round(u)), int(round(v))
        if 2 <= ui < 126 and 2 <= vi < 126 and 2 <= int(round(uvd[k][0])) < 126 \
                and 2 <= int(round(uvd[k][1])) < 126:
            patch = new_dm[vi - 2:vi + 3, ui - 2:ui + 3]
            # the marker depth must appear near the transformed joint pixel
            if np.abs(patch - markers[k]).min() < 1e-3:
                checked += 1
    assert checked >= 10, f"only {checked}/16 markers tracked their joints"


def test_depth_values_preserved(rng):
    """nearest-neighbour warp: output contains only input values (plus 0)"""
    dm, pose, cfg, com = _setup(rng)
    dm = rng.uniform(300, 500, (128, 128, 1)).astype(np.float32)
    new_dm, _ = augment.augment_one(jax.random.key(0), jnp.asarray(dm),
                                    jnp.asarray(pose), jnp.asarray(cfg),
                                    jnp.asarray(com))
    vals = set(np.unique(np.asarray(new_dm)))
    src = set(np.unique(dm)) | {0.0}
    assert vals <= src


def test_parameter_ranges():
    angles, ratios = [], []
    for i in range(200):
        a, r = augment._affine_params(jax.random.key(i))
        angles.append(float(a))
        ratios.extend(np.asarray(r).tolist())
    assert -np.pi <= min(angles) and max(angles) <= np.pi
    assert max(angles) > 1.5 and min(angles) < -1.5  # spans the range
    assert 0.9 - 1e-6 <= min(ratios) and max(ratios) <= 1.1 + 1e-6


def test_depth_coordinate_unchanged(rng):
    """the aug transform acts in uv; each joint's depth stays fixed
    (/root/reference/data/preprocess.py:244 keeps d through the rot_mat)"""
    dm, pose, cfg, com = _setup(rng)
    _, new_pose = augment.augment_one(jax.random.key(5), jnp.asarray(dm),
                                      jnp.asarray(pose), jnp.asarray(cfg),
                                      jnp.asarray(com))
    old_d = np.asarray(geometry.xyz2uvd(jnp.asarray(pose),
                                        jnp.asarray(cfg))).reshape(-1, 3)[:, 2]
    new_d = np.asarray(geometry.xyz2uvd(new_pose,
                                        jnp.asarray(cfg))).reshape(-1, 3)[:, 2]
    np.testing.assert_allclose(new_d, old_d, rtol=1e-5)


def test_mxu_warp_matches_gather_warp_exactly(rng):
    """The MXU one-hot warp is a re-expression of the same nearest-neighbour
    map, so it must agree with the 2-D gather form bitwise (VERDICT r1 #3)."""
    import jax
    import jax.numpy as jnp

    from densereg_tpu.augment import (_affine_params, _warp_image,
                                      _warp_image_gather)

    for seed in range(5):
        key = jax.random.key(seed)
        dm = jnp.asarray(
            rng.uniform(300, 500, (48, 48, 1)).astype("float32"))
        angle, ratio = _affine_params(key)
        center = jnp.asarray([23.0, 25.0], jnp.float32)
        a = _warp_image_gather(dm, angle, ratio, center)
        b = _warp_image(dm, angle, ratio, center)
        assert jnp.array_equal(a, b), f"seed {seed}: max |d|={jnp.max(jnp.abs(a - b))}"
