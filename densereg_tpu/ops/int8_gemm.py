"""Fused int8 GEMM with quantization epilogue (Pallas TPU kernel).

Motivation (v5e trace, 2026-08-17): in the calibrated int8 serving graph
XLA keeps the per-layer activation quantize as standalone
``clamp_convert`` passes — ~10 ms of the 25.6 ms batch-256 step (~40%) —
because it will not fuse the dequantize+relu+requantize chain into a
convolution fusion.  Most of this network's convolutions are 1x1
(pure GEMMs: the um-head 512-wide convs, ll/inter convs, residual
bottleneck 1x1s — /root/reference/network/um_v1.py:18-48,143-169), so
this kernel computes

    y   = relu?( (x_q @ w_q) * scale + bias )          # int32 on the MXU
    out = clip(round(y / s_y), -127, 127).astype(int8)  # fused requant
          and/or y.astype(out_dtype)                    # float view

in ONE pass: int8 in, int8 (and optionally float) out — the bf16
intermediate and its separate clamp_convert pass never touch HBM.

Candidate for ``ConvBR._quantized_call`` (1x1/stride-1 convs with
tile-aligned channel counts) — measured SLOWER than XLA's conv lowering
inside the model and left unwired; kept as a tested engineering record.
See BASELINE.md "where the remaining 40% goes".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, sc_ref, b_ref, sy_ref, *out_refs, relu, emit_q,
            emit_f):
    acc = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sc_ref[...] + b_ref[...]
    if relu:
        y = jnp.maximum(y, 0.0)
    refs = list(out_refs)
    if emit_q:
        s_y = sy_ref[0]
        q_ref = refs.pop(0)
        q_ref[...] = jnp.clip(jnp.round(y / s_y), -127, 127).astype(jnp.int8)
    if emit_f:
        f_ref = refs.pop(0)
        f_ref[...] = y.astype(f_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("relu", "emit_q", "emit_f", "f_dtype", "bm", "bn",
                     "interpret"))
def int8_gemm_requant(x_q, w_q, scale, bias, s_y, *, relu=True, emit_q=True,
                      emit_f=False, f_dtype=jnp.bfloat16, bm=512, bn=256,
                      interpret=False):
    """Fused ``requant(relu(dequant(x_q @ w_q)))``.

    Args:
      x_q: (M, K) int8 — pre-quantized activations (scale folded into
        ``scale``).
      w_q: (K, N) int8 per-output-channel quantized weights.
      scale: (N,) float32 — ``s_x * s_w`` dequantization scale.
      bias: (N,) float32.
      s_y: () float32 output quantization scale (ignored unless emit_q).
      relu: apply max(y, 0) before requantization.
      emit_q / emit_f: which outputs to materialize (int8 and/or float).
    Returns:
      (q, f) with the unrequested side None.
    Constraints: M % bm == 0, N % bn == 0, K % 128 == 0 (int8 lane tiling);
    callers pad or fall back to XLA.
    """
    m, k = x_q.shape
    k2, n = w_q.shape
    assert k == k2, (x_q.shape, w_q.shape)
    assert m % bm == 0 and n % bn == 0 and k % 128 == 0, (m, n, k, bm, bn)
    if not (emit_q or emit_f):
        raise ValueError("need at least one of emit_q / emit_f")

    grid = (m // bm, n // bn)
    in_specs = [
        pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
        pl.BlockSpec((k, bn), lambda i, j: (0, j)),
        pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    out_specs, out_shape = [], []
    if emit_q:
        out_specs.append(pl.BlockSpec((bm, bn), lambda i, j: (i, j)))
        out_shape.append(jax.ShapeDtypeStruct((m, n), jnp.int8))
    if emit_f:
        out_specs.append(pl.BlockSpec((bm, bn), lambda i, j: (i, j)))
        out_shape.append(jax.ShapeDtypeStruct((m, n), jnp.dtype(f_dtype)))
    outs = pl.pallas_call(
        functools.partial(_kernel, relu=relu, emit_q=emit_q, emit_f=emit_f),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(x_q, w_q, scale.reshape(1, n).astype(jnp.float32),
      bias.reshape(1, n).astype(jnp.float32),
      jnp.asarray(s_y, jnp.float32).reshape(1))
    outs = list(outs)
    q = outs.pop(0) if emit_q else None
    f = outs.pop(0) if emit_f else None
    return q, f


def reference_gemm_requant(x_q, w_q, scale, bias, s_y, *, relu=True):
    """jnp oracle for tests: same math, no fusion."""
    y = jax.lax.dot_general(
        x_q, w_q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    y = y * scale[None, :] + bias[None, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    q = jnp.clip(jnp.round(y / s_y), -127, 127).astype(jnp.int8)
    return q, y
