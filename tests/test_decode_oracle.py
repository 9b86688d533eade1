"""Property tests: densereg_tpu.decode vs the reference-literal numpy
oracle (tests/ref_decode_oracle.py) on adversarial random inputs.

VERDICT r2 item 2: the crop path is pinned against a literal numpy model
(test_preprocess.py); this gives the decoder — the paper's core
contribution — the same treatment: >= 1000 random joint decodes, including
forced score ties (top-k ordering AND vote-grid tie-break), off-image
reprojections, background-masked pixels, and the all-zero-weight edge
(documented deviation #4 in DEVIATIONS.md).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from densereg_tpu import decode, geometry
from densereg_tpu.config import CameraConfig, EvalConfig

from tests import ref_decode_oracle as oracle

ICVL = CameraConfig(fx=241.42, fy=241.42, cx=160, cy=120, w=320, h=240)


def _random_scene(rng, b=8, j=16, h=32, w=32, tie_quantum=0.25,
                  com_spread=40.0):
    """Adversarial random head outputs: scores quantized to ``tie_quantum``
    (exactly representable -> bit-equal products -> real ties in both the
    top-k ordering and the voting grid), ~15% background pixels, unit
    offset vectors, coms spread so some candidates reproject off-image."""
    hms = (rng.integers(0, 5, (b, h, w, j)) * tie_quantum).astype(np.float32)
    # hm3 capped below 1: hm3 == 1 makes the offset distance 0, so every
    # top candidate would reproject exactly onto its own source pixel —
    # degenerate (no off-image cases).  Levels {0, .2, .4, .6, .8} keep
    # exact ties while giving 16-80 mm candidate displacements.
    hm3s = (rng.integers(0, 5, (b, h, w, j)) * np.float32(0.2)).astype(
        np.float32)
    um = rng.normal(size=(b, h, w, j, 3)).astype(np.float32)
    um /= np.linalg.norm(um, axis=-1, keepdims=True) + 1e-6
    ums = um.reshape(b, h, w, 3 * j)
    tiny = rng.uniform(-0.8, 1.0, (b, h, w, 1)).astype(np.float32)
    tiny[rng.random((b, h, w, 1)) < 0.15] = -1.0  # background
    cfgs = np.tile(np.asarray(geometry.scale_cfg(ICVL.as_array(), 128, 128),
                              np.float32), (b, 1))
    coms = np.stack([rng.uniform(-com_spread, com_spread, b),
                     rng.uniform(-com_spread, com_spread, b),
                     rng.uniform(350, 450, b)], axis=-1).astype(np.float32)
    return hms, hm3s, ums, tiny, cfgs, coms


def _compare(scene, atol_normed=2e-4):
    hms, hm3s, ums, tiny, cfgs, coms = scene
    ref = oracle.decode(hms, hm3s, ums, tiny, cfgs, coms)
    res = decode.decode_poses(jnp.asarray(hms), jnp.asarray(hm3s),
                              jnp.asarray(ums), jnp.asarray(tiny),
                              jnp.asarray(cfgs), jnp.asarray(coms),
                              EvalConfig())
    # oracle NaNs on all-zero-weight joints (reference behavior); ours keeps
    # the grid init there (DEVIATIONS.md #4) — compare only where finite
    finite = np.isfinite(ref["normed"]).all(axis=-1)
    np.testing.assert_allclose(np.asarray(res["candidates"]),
                               ref["candidates"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(res["weights"]), ref["weights"],
                               atol=1e-6)
    got = np.asarray(res["normed"])
    np.testing.assert_allclose(got[finite], ref["normed"][finite],
                               atol=atol_normed)
    return ref, finite


def test_oracle_agreement_1000_random_joints(rng):
    """>= 1000 joint decodes across seeds agree with the literal oracle."""
    total, zero_w, offimg = 0, 0, 0
    for seed in range(8):
        r = np.random.default_rng(1000 + seed)
        scene = _random_scene(r)
        ref, finite = _compare(scene)
        total += finite.size
        zero_w += int((~finite).sum())
        offimg += int((ref["weights"] == 0.0).sum())
    assert total >= 1000
    # adversarial coverage: some candidates really did reproject off-image
    assert offimg > 0


def test_oracle_agreement_extreme_coms(rng):
    """coms near the frustum edge force many off-image reprojections."""
    r = np.random.default_rng(77)
    scene = _random_scene(r, b=4, com_spread=150.0)
    ref, _ = _compare(scene)
    assert (ref["weights"] == 0.0).any()


def test_oracle_candidate_weights_z_clamp_boundary():
    """The z-clamp output (computed then discarded by the reference,
    hourglass_um_crop_tiny.py:774) matches at the clamp boundary for
    in-image points."""
    r = np.random.default_rng(5)
    hms, hm3s, ums, tiny, cfgs, coms = _random_scene(r, b=2, j=4)
    ref = oracle.decode(hms, hm3s, ums, tiny, cfgs, coms)
    w_ref, clamped_ref = oracle.candidate_weights(
        ref["candidates"][0], coms[0], cfgs[0], hms[0], tiny[0])
    w_got, clamped_got = decode.candidate_weights(
        jnp.asarray(ref["candidates"][:1]), jnp.asarray(coms[:1]),
        jnp.asarray(cfgs[:1]), jnp.asarray(hms[:1]), jnp.asarray(tiny[:1]))
    np.testing.assert_allclose(np.asarray(w_got)[0], w_ref[..., 0],
                               atol=1e-6)
    # where the weight is nonzero the reprojection was in-image -> the
    # observed-depth clamp used the same gathered value in both
    inb = w_ref[..., 0] > 0
    np.testing.assert_allclose(np.asarray(clamped_got)[0][inb],
                               clamped_ref[inb], atol=1e-5)


def test_oracle_vote_grid_tie_break_parity():
    """Equal-weight clusters: both pick the LAST maximal cell."""
    cans = np.array([[-0.9, -0.9, -0.9], [0.9, -0.9, 0.9],
                     [0.9, 0.9, 0.9], [-0.9, 0.9, -0.9],
                     [0.1, 0.1, 0.1]], np.float32)
    w = np.array([[1.0], [1.0], [1.0], [1.0], [0.5]], np.float32)
    ref = oracle.weighted_mean_shift_joint(cans, w, num_it=0)
    got = np.asarray(decode._vote_grid_init(jnp.asarray(cans),
                                            jnp.asarray(w[:, 0])))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_oracle_zero_weight_nan_is_documented_deviation():
    """All-zero weights: the reference (and oracle) NaN; the production
    decoder keeps the voting-grid estimate (DEVIATIONS.md #4)."""
    cans = np.full((5, 3), 0.3, np.float32)
    w = np.zeros((5, 1), np.float32)
    ref = oracle.weighted_mean_shift_joint(cans, w)
    assert np.isnan(ref).all()
    got = np.asarray(decode.weighted_mean_shift(
        jnp.asarray(cans), jnp.asarray(w[:, 0]), 10, 0.4))
    assert np.isfinite(got).all()


@pytest.mark.slow
def test_oracle_agreement_fused_pallas_interpret(rng):
    """The fused Pallas kernel (interpret mode on CPU) also matches the
    literal oracle end-to-end, not just the jnp decoder."""
    r = np.random.default_rng(31)
    hms, hm3s, ums, tiny, cfgs, coms = _random_scene(r, b=2, j=16)
    ref = oracle.decode(hms, hm3s, ums, tiny, cfgs, coms)
    res = decode.decode_poses(
        jnp.asarray(hms), jnp.asarray(hm3s), jnp.asarray(ums),
        jnp.asarray(tiny), jnp.asarray(cfgs), jnp.asarray(coms),
        EvalConfig(use_pallas=True, pallas_interpret=True))
    finite = np.isfinite(ref["normed"]).all(axis=-1)
    np.testing.assert_allclose(np.asarray(res["normed"])[finite],
                               ref["normed"][finite], atol=2e-4)
