"""Fused Pallas kernel for the weighted mean-shift decode stage.

SURVEY.md §2 designates the decode (voting-grid init + iterative mean shift,
/root/reference/model/hourglass_um_crop_tiny.py:684-741) as the reference's
de-facto "kernel"; this is its TPU-native form.  One kernel fuses:

  1. the 4x4x4 voting-grid scatter + last-max-cell argmax initialization,
  2. all ``num_it`` Gaussian mean-shift iterations,

without materializing any intermediate in HBM.  Data layout is chosen for
the VPU: the ``M = batch * joints`` problem axis rides the 128-wide lane
dimension and the (tiny, n=5) candidate axis rides sublanes, so every
per-iteration op is a dense (n, TILE_M) vector op and the reductions are
cheap sublane reductions.  The jnp reference implementation
(:func:`densereg_tpu.decode.weighted_mean_shift`) is the semantics oracle;
``tests/test_pallas.py`` checks exact agreement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 512
GRID = 4          # 2 * num_quan voting cells per axis
NUM_CELLS = GRID ** 3


def _kernel(xs_ref, ys_ref, zs_ref, ws_ref, out_ref, *, num_it, inv_sigma,
            num_quan):
    xs = xs_ref[:]          # (n, TILE_M)
    ys = ys_ref[:]
    zs = zs_ref[:]
    ws = ws_ref[:]

    # --- voting-grid init -------------------------------------------------
    def quant(v):
        q = jnp.clip((v + 1.0) * num_quan, 0.0, GRID - 0.1)
        return q.astype(jnp.int32)

    qx, qy, qz = quant(xs), quant(ys), quant(zs)
    flat = (qx * GRID + qy) * GRID + qz            # (n, TILE_M) in [0,64)

    # scatter-free vote accumulation + last-max argmax, unrolled over the 64
    # cells in ascending row-major order: ">= running max" keeps the LAST
    # maximal cell, reproducing tf.where(equal(max))[-1].
    m = xs.shape[1]
    best_votes = jnp.full((1, m), -1.0, jnp.float32)
    best_cell = jnp.zeros((1, m), jnp.int32)
    for cell in range(NUM_CELLS):
        votes = jnp.sum(jnp.where(flat == cell, ws, 0.0), axis=0,
                        keepdims=True)
        take = votes >= best_votes
        best_votes = jnp.where(take, votes, best_votes)
        best_cell = jnp.where(take, cell, best_cell)

    iz = best_cell % GRID
    iy = (best_cell // GRID) % GRID
    ix = best_cell // (GRID * GRID)
    offs = 0.5 / num_quan - 1.0
    cx = ix.astype(jnp.float32) / num_quan + offs   # (1, TILE_M)
    cy = iy.astype(jnp.float32) / num_quan + offs
    cz = iz.astype(jnp.float32) / num_quan + offs

    # --- mean-shift iterations -------------------------------------------
    def body(_, carry):
        cx, cy, cz = carry
        d2 = ((xs - cx) ** 2 + (ys - cy) ** 2 + (zs - cz) ** 2)
        s = jnp.exp(inv_sigma * d2) * ws            # (n, TILE_M)
        den = jnp.sum(s, axis=0, keepdims=True)
        ok = den > 0.0                              # guard all-zero weights
        safe = jnp.where(ok, den, 1.0)
        cx = jnp.where(ok, jnp.sum(xs * s, axis=0, keepdims=True) / safe, cx)
        cy = jnp.where(ok, jnp.sum(ys * s, axis=0, keepdims=True) / safe, cy)
        cz = jnp.where(ok, jnp.sum(zs * s, axis=0, keepdims=True) / safe, cz)
        return cx, cy, cz

    cx, cy, cz = jax.lax.fori_loop(0, num_it, body, (cx, cy, cz))
    out_ref[0, :] = cx[0, :]
    out_ref[1, :] = cy[0, :]
    out_ref[2, :] = cz[0, :]


@functools.partial(jax.jit, static_argnames=("num_it", "band_width",
                                             "interpret"))
def weighted_mean_shift_pallas(cans, weights, num_it: int = 10,
                               band_width: float = 0.4,
                               interpret: bool = False):
    """Drop-in replacement for
    :func:`densereg_tpu.decode.weighted_mean_shift`.

    Args: cans (b, j, n, 3); weights (b, j, n).  Returns (b, j, 3).
    Set ``interpret=True`` to run the kernel in interpreter mode (CPU tests).
    """
    b, j, n, _ = cans.shape
    m = b * j
    m_pad = -(-m // TILE_M) * TILE_M

    # (b, j, n, 3) -> three (n, M) planes with M on lanes
    flat = cans.reshape(m, n, 3)
    planes = jnp.moveaxis(flat, 0, -1)              # (n, 3, m)
    xs = jnp.pad(planes[:, 0, :], ((0, 0), (0, m_pad - m)))
    ys = jnp.pad(planes[:, 1, :], ((0, 0), (0, m_pad - m)))
    zs = jnp.pad(planes[:, 2, :], ((0, 0), (0, m_pad - m)))
    # pad weights with 1 so padded columns stay NaN-free (their candidates
    # are all-zero -> they converge to 0 and are sliced away)
    ws = jnp.pad(weights.reshape(m, n).T, ((0, 0), (0, m_pad - m)),
                 constant_values=1.0)

    inv_sigma = -1.0 / (2.0 * band_width * band_width)
    grid = m_pad // TILE_M
    spec = pl.BlockSpec((n, TILE_M), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, num_it=num_it, inv_sigma=inv_sigma,
                          num_quan=GRID // 2),
        out_shape=jax.ShapeDtypeStruct((3, m_pad), jnp.float32),
        grid=(grid,),
        in_specs=[spec, spec, spec, spec],
        out_specs=pl.BlockSpec((3, TILE_M), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xs.astype(jnp.float32), ys.astype(jnp.float32),
      zs.astype(jnp.float32), ws.astype(jnp.float32))

    return out[:, :m].T.reshape(b, j, 3)
