"""Stacked-hourglass dense-regression network ("um_v1").

Flax re-design of /root/reference/network/um_v1.py: the recursive
encoder-decoder hourglass, the three per-stack heads (2D heatmap ``hm``, 3D
closeness heatmap ``hm3``, unit-offset map ``um``), the per-pixel normalized
uvd coordinate concat trick, and the inter-stack re-injection.

TPU notes: all convs run in ``cfg.compute_dtype`` (bfloat16 by default for
benchmarks) with float32 params and float32 batch-renorm statistics; the hot
FLOPs — the width-512 1x1 convs of the um head over 32x32 maps — are plain
batched matmuls that XLA tiles straight onto the MXU.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax.numpy as jnp
from flax import linen as nn

from densereg_tpu.config import NetConfig
from densereg_tpu.models.layers import (
    ConvBR,
    Residual,
    as_float,
    max_pool_same,
    quantize_output,
    upsample_nearest_2x,
)
from densereg_tpu.preprocess import method2_resize


def renorm_clip_schedule(t):
    """The r/d clip schedule of the reference's renorm
    (/root/reference/network/slim/ops.py:141-153), as a pure function of the
    accumulated schedule time ``t`` (incremented by 1e-5 per micro step):

        r_max = 3 / (1 + 2 e^{-t})          (1 -> 3)
        d_max = 1e-3 * e^{2t}               (the reference's algebra:
                                             5 / (5000 e^{-2t}))
    """
    t = jnp.asarray(t, jnp.float32)
    r_max = 3.0 / (1.0 + 2.0 * jnp.exp(-t))
    d_max = 1e-3 * jnp.exp(2.0 * t)
    return r_max, d_max


class Hourglass(nn.Module):
    """Recursive hourglass (/root/reference/network/um_v1.py:51-69): at each
    level ``upper = res(x)``; ``lower = res(pool3x3/2(x))`` -> recurse ->
    ``res`` -> upsample x2; sum.

    ``deconv_up=True`` (the ``um_v1_deconv`` net variant) replaces the
    parameter-free nearest upsample with a learned stride-2 transposed conv
    — the slim ``deconv`` op the reference ships but never wires into a
    network (/root/reference/network/slim/ops.py:480-545); here it is a
    first-class architecture option (the classic learned-upsampling
    alternative in hourglass nets)."""

    depth: int
    kernel_size: int = 3
    dtype: Any = jnp.float32
    axis_name: str | None = None
    use_bn: bool = True
    separable: bool = False
    quantized: bool = False
    deconv_up: bool = False

    @nn.compact
    def __call__(self, x, **kw):
        res = lambda name: Residual(kernel_size=self.kernel_size,
                                    dtype=self.dtype,
                                    axis_name=self.axis_name,
                                    use_bn=self.use_bn,
                                    separable=self.separable,
                                    quantized=self.quantized, name=name)
        upper1 = res("upper")(x, **kw)
        lower1 = max_pool_same(x, self.kernel_size, 2)
        lower1 = res("lower_in")(lower1, **kw)
        if self.depth > 1:
            lower2 = Hourglass(self.depth - 1, self.kernel_size,
                               self.dtype, self.axis_name, self.use_bn,
                               self.separable, self.quantized,
                               self.deconv_up, name="inner")(lower1, **kw)
        else:
            lower2 = lower1
        lower3 = res("lower_out")(lower2, **kw)
        if self.deconv_up:
            from densereg_tpu.models.ops import Deconv
            upper2 = Deconv(lower3.shape[-1],
                            kernel=(self.kernel_size, self.kernel_size),
                            stride=2, activation=None, dtype=self.dtype,
                            name="deconv_up")(lower3)
        else:
            upper2 = upsample_nearest_2x(lower3)
        out = as_float(upper1) + as_float(upper2)
        if self.quantized:
            return quantize_output(self, out, self.dtype)
        return out


class DenseRegNet(nn.Module):
    """``detect_net`` equivalent (/root/reference/network/um_v1.py:71-185).

    Call with the normalized depth maps ``(b, H, W, 1)``; returns a dict of
    per-stack lists ``{"hm": [...], "hm3": [...], "um": [...]}`` each at
    ``(b, H/4, W/4, {J | J | 3J})``.
    """

    cfg: NetConfig
    # mesh axis for synchronized batch-renorm moments under data parallelism
    axis_name: str | None = None

    @nn.compact
    def __call__(self, dms, *, train: bool, r_max=None, d_max=None):
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        j = c.num_joint
        kw = dict(train=train, r_max=r_max, d_max=d_max)
        bnkw = dict(bn_decay=c.bn_decay, bn_epsilon=c.bn_epsilon, dtype=dtype,
                    axis_name=self.axis_name, use_bn=not c.fold_bn,
                    quantized=c.quantize)
        separable = c.net_module == "um_v1_lite"
        deconv_up = c.net_module == "um_v1_deconv"

        def res(name, features=None):
            return Residual(features, kernel_size=c.kernel_size,
                            separable=separable, name=name, **bnkw)

        x = dms.astype(dtype)

        # Stem: 7x7/2 conv(32) -> res(64) -> pool/2 -> res -> res(num_fea)
        # (um_v1.py:84-97), 128x128 -> 32x32.
        y = ConvBR(32, (7, 7), stride=2, name="stem_conv", **bnkw)(x, **kw)
        y = res("stem_res1", 64)(y, **kw)
        y = max_pool_same(y, 2, 2)
        y = res("stem_res2")(y, **kw)
        hg_ins = res("stem_res3", c.num_fea)(y, **kw)

        out_h, out_w = c.output_hw
        # Normalized per-pixel uvd grid + method-2-downsampled depth
        # (um_v1.py:110-121): uu = col/(w/2) - 1, vv = row/(h/2) - 1.
        tiny_dm = method2_resize(dms, out_h, out_w).astype(dtype)
        uu = (jnp.arange(out_w, dtype=dtype) / (out_w / 2) - 1.0)[None, None, :, None]
        vv = (jnp.arange(out_h, dtype=dtype) / (out_h / 2) - 1.0)[None, :, None, None]
        b = dms.shape[0]
        uvd = jnp.concatenate(
            [jnp.broadcast_to(uu, (b, out_h, out_w, 1)),
             jnp.broadcast_to(vv, (b, out_h, out_w, 1)),
             tiny_dm], axis=-1)

        head = lambda f, name: ConvBR(f, (1, 1), use_bn=False,
                                      activation=None, dtype=dtype,
                                      quantized=c.quantize, name=name)
        invalid = tiny_dm < -0.9

        outs: Dict[str, List] = {"hm": [], "hm3": [], "um": []}
        for i in range(c.num_stack):
            sfx = f"_s{i}"
            hg = Hourglass(c.hourglass_depth, c.kernel_size, dtype,
                           self.axis_name, not c.fold_bn, separable,
                           c.quantize, deconv_up,
                           name="hg" + sfx)(hg_ins, **kw)
            ll = res("ll_res" + sfx)(hg, **kw)
            ll = ConvBR(c.num_fea, (1, 1), name="ll_conv" + sfx, **bnkw)(ll, **kw)

            hm_out = as_float(head(j, "hm_head" + sfx)(ll, **kw))

            hm3_in = jnp.concatenate([as_float(ll), uvd], axis=-1)
            hm3_in = res("hm3_res" + sfx, 128)(hm3_in, **kw)
            hm3_out = as_float(head(j, "hm3_head" + sfx)(hm3_in, **kw))

            # um head: dual branch (plain / depth-masked) of stacked
            # residuals, concat, fuse, then two 512-wide 1x1 convs with
            # dropout (um_v1.py:143-169).
            um_cat = jnp.concatenate([as_float(hg), hm_out, hm3_out],
                                     axis=-1)
            um_in = res("um_resA" + sfx, 256)(um_cat, **kw)
            um_in = res("um_resB" + sfx)(um_in, **kw)

            um_mask = jnp.where(invalid, jnp.zeros_like(um_cat), um_cat)
            um_mask = res("umm_resA" + sfx, 256)(um_mask, **kw)
            um_mask = res("umm_resB" + sfx)(um_mask, **kw)

            comb = jnp.concatenate([as_float(um_in), as_float(um_mask)],
                                   axis=-1)
            comb = res("um_comb" + sfx)(comb, **kw)
            comb = jnp.concatenate([as_float(comb), uvd], axis=-1)

            um_full = ConvBR(512, (1, 1), use_bn=False, activation=nn.relu,
                             dtype=dtype, quantized=c.quantize,
                             name="um_fc1" + sfx)(comb, **kw)
            um_full = nn.Dropout(c.dropout_rate, deterministic=not train)(um_full)
            um_full = ConvBR(512, (1, 1), use_bn=False, activation=nn.relu,
                             dtype=dtype, quantized=c.quantize,
                             name="um_fc2" + sfx)(um_full, **kw)
            um_full = nn.Dropout(c.dropout_rate, deterministic=not train)(um_full)
            um_out = as_float(head(3 * j, "um_head" + sfx)(um_full, **kw))

            # Emit heads in float32 — losses/decode are precision-sensitive.
            outs["hm"].append(hm_out.astype(jnp.float32))
            outs["hm3"].append(hm3_out.astype(jnp.float32))
            outs["um"].append(um_out.astype(jnp.float32))

            if i < c.num_stack - 1:
                # inter-stack re-injection (um_v1.py:174-183)
                tmp = jnp.concatenate([hm_out, hm3_out, um_out], axis=-1)
                tmp = head(c.num_fea, "inter_out" + sfx)(tmp, **kw)
                inter = head(c.num_fea, "inter_ll" + sfx)(ll, **kw)
                hg_ins = (as_float(hg_ins) + as_float(tmp)
                          + as_float(inter))

        return outs
