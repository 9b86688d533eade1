"""Fused int8 GEMM kernel (ops/int8_gemm.py) vs the jnp oracle."""

import jax.numpy as jnp
import numpy as np

from densereg_tpu.ops.int8_gemm import (
    int8_gemm_requant,
    reference_gemm_requant,
)


def _inputs(rng, m=512, k=256, n=256):
    x = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    sc = jnp.asarray(rng.uniform(1e-4, 1e-3, n), np.float32)
    b = jnp.asarray(rng.uniform(-1, 1, n), np.float32)
    return x, w, sc, b, jnp.float32(0.05)


def test_int8_gemm_matches_oracle(rng):
    x, w, sc, b, sy = _inputs(rng)
    q_ref, f_ref = reference_gemm_requant(x, w, sc, b, sy, relu=True)
    for eq, ef in [(True, False), (False, True), (True, True)]:
        q, f = int8_gemm_requant(x, w, sc, b, sy, relu=True, emit_q=eq,
                                 emit_f=ef, f_dtype=jnp.float32, bm=256,
                                 bn=128, interpret=True)
        assert (q is None) == (not eq) and (f is None) == (not ef)
        if eq:
            np.testing.assert_array_equal(np.asarray(q), np.asarray(q_ref))
        if ef:
            # float view: ulp-level fma-ordering differences only
            np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref),
                                       rtol=1e-4, atol=1e-5)


def test_int8_gemm_no_relu_and_bf16_view(rng):
    x, w, sc, b, sy = _inputs(rng)
    q_ref, f_ref = reference_gemm_requant(x, w, sc, b, sy, relu=False)
    q, f = int8_gemm_requant(x, w, sc, b, sy, relu=False, emit_q=True,
                             emit_f=True, f_dtype=jnp.bfloat16, bm=256,
                             bn=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(q), np.asarray(q_ref))
    np.testing.assert_allclose(
        np.asarray(f, np.float32),
        np.asarray(f_ref.astype(jnp.bfloat16), np.float32),
        rtol=1e-2, atol=1e-2)


def test_int8_gemm_rejects_misaligned():
    import pytest
    x = jnp.zeros((100, 256), jnp.int8)
    w = jnp.zeros((256, 256), jnp.int8)
    sc = jnp.ones((256,), jnp.float32)
    b = jnp.zeros((256,), jnp.float32)
    with pytest.raises(AssertionError):
        int8_gemm_requant(x, w, sc, b, 1.0, bm=256, bn=128, interpret=True)
