"""Pallas decode kernel vs the jnp reference implementation (interpreter
mode on CPU; the same kernel compiles for TPU)."""

import jax.numpy as jnp
import numpy as np

from densereg_tpu.decode import weighted_mean_shift
from densereg_tpu.ops.meanshift_pallas import weighted_mean_shift_pallas


def _random_problem(rng, b, j, n=5):
    cans = rng.uniform(-1.0, 1.0, (b, j, n, 3)).astype(np.float32)
    weights = rng.uniform(0.05, 1.0, (b, j, n)).astype(np.float32)
    return jnp.asarray(cans), jnp.asarray(weights)


def test_pallas_matches_jnp(rng):
    cans, weights = _random_problem(rng, 4, 16)
    ref = np.asarray(weighted_mean_shift(cans, weights, 10, 0.4))
    got = np.asarray(weighted_mean_shift_pallas(cans, weights, 10, 0.4,
                                                interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


def test_pallas_matches_jnp_nonmultiple_tile(rng):
    # M = 3*7 = 21, far from the 512 tile -> exercises padding
    cans, weights = _random_problem(rng, 3, 7)
    ref = np.asarray(weighted_mean_shift(cans, weights, 5, 0.4))
    got = np.asarray(weighted_mean_shift_pallas(cans, weights, 5, 0.4,
                                                interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


def test_pallas_tiebreak_last_cell(rng):
    # equal-weight clusters in the first and last voting cell: both
    # implementations must pick the LAST maximal cell
    cans = np.zeros((1, 1, 4, 3), np.float32)
    cans[0, 0, :2] = -0.9
    cans[0, 0, 2:] = 0.9
    w = np.ones((1, 1, 4), np.float32)
    ref = np.asarray(weighted_mean_shift(jnp.asarray(cans), jnp.asarray(w),
                                         0, 0.4))
    got = np.asarray(weighted_mean_shift_pallas(jnp.asarray(cans),
                                                jnp.asarray(w), 0, 0.4,
                                                interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-6)
    np.testing.assert_allclose(got[0, 0], [0.75, 0.75, 0.75], atol=1e-6)


def test_decode_with_pallas_backend(rng):
    from densereg_tpu.config import EvalConfig
    from densereg_tpu import decode as dec
    from tests.test_decode import _gt_scene

    poses, cfgs, coms, gt = _gt_scene(rng)
    # monkeypatch-free: call via EvalConfig(use_pallas=True) but force
    # interpret by patching the kernel default through functools - instead
    # just compare the two decode paths' mean-shift inputs via the public API
    res_ref = dec.decode_poses(gt["hm2"], gt["hm3"], gt["um"], gt["tiny_dm"],
                               jnp.asarray(cfgs), jnp.asarray(coms),
                               EvalConfig(use_pallas=False))
    normed = weighted_mean_shift_pallas(res_ref["candidates"],
                                        res_ref["weights"], 10, 0.4,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(normed),
                               np.asarray(res_ref["normed"]),
                               rtol=2e-5, atol=2e-6)


def test_pallas_zero_weight_no_nan():
    import numpy as np
    cans = jnp.asarray(np.full((1, 2, 5, 3), 0.3, np.float32))
    w = jnp.zeros((1, 2, 5), jnp.float32)
    out = np.asarray(weighted_mean_shift_pallas(cans, w, 10, 0.4,
                                                interpret=True))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, 0.75, atol=1e-6)
