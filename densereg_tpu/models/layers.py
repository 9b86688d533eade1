"""NN building blocks: batch renormalization, conv wrapper, bottleneck residual.

Functional re-design of the vendored slim fork (/root/reference/network/slim/
ops.py).  The reference's batch "norm" is actually Batch RENORM with a
per-step r/d clip schedule held in mutable graph variables (ops.py:42-185);
here the moving statistics live in Flax's ``batch_stats`` collection and the
schedule is a pure function of the global step (see
:func:`densereg_tpu.models.hourglass.renorm_clip_schedule`), threaded through
the jitted train step explicitly — no hidden mutable state.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class QTensor:
    """A quantized activation flowing between calibrated int8 layers.

    ``f`` is the exact float result of the producing layer, ``q`` its int8
    quantization with per-tensor scale ``s`` (the producer's calibrated
    output absmax / 127).  Conv consumers read ``q``/``s`` directly — the
    mathematically identical value the old consumer-side quantize would
    have produced (same scale, same rounding) — so XLA dead-code-eliminates
    the unused ``f`` materialization on conv->conv edges; non-conv consumers
    (adds, concats, heads) read ``f``.  Profiling motivation: at serving
    batch 256 the consumer-side ``clamp_convert`` quantize passes were ~25%
    of device time because each one re-read the producer's bf16 output from
    HBM (trace 2026-08-17).

    Deliberately NOT a pytree/NamedTuple and with no operator overloads:
    it only ever lives inside one traced ``net.apply``, and any op site
    that hasn't been taught about it should fail loudly.
    """

    __slots__ = ("f", "q", "s")

    def __init__(self, f, q, s):
        self.f = f
        self.q = q
        self.s = s

    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim


def as_float(x):
    """The float view of a maybe-:class:`QTensor` value."""
    return x.f if isinstance(x, QTensor) else x


class BatchRenorm(nn.Module):
    """Batch renormalization (Ioffe 2017) exactly as the reference's
    ``slim.ops.batch_norm`` (/root/reference/network/slim/ops.py:42-185):

    train:  y = ((x - mu_B)/sigma_B * r + d) * gamma + beta
            r = sg[clip(sigma_B / sigma_mov, 1/r_max, r_max)]
            d = sg[clip((mu_B - mu_mov) / sigma_mov, -d_max, d_max)]
            moving stats <- decay * moving + (1-decay) * batch
    eval:   y = (x - mu_mov)/sigma_mov * gamma + beta

    ``r_max``/``d_max`` are passed per call (they follow a global schedule,
    ops.py:141-153) instead of living in per-layer non-trainable variables.
    """

    decay: float = 0.99
    epsilon: float = 1e-3
    dtype: Any = jnp.float32
    # When set (inside shard_map/pmap), batch moments are pmean-ed over this
    # mesh axis: synchronized BN across data-parallel replicas.  (The
    # reference's multi-tower trainer instead updated stats from the last
    # tower only — /root/reference/model/train_multi_gpu.py:85-86 — which
    # desyncs replicas; cross-replica moments are the TPU-native fix.)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool, r_max=None, d_max=None):
        c = x.shape[-1]
        beta = self.param("beta", nn.initializers.zeros, (c,), jnp.float32)
        gamma = self.param("gamma", nn.initializers.ones, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))

        xf = x.astype(jnp.float32)
        if train:
            axes = tuple(range(x.ndim - 1))
            sync = self.axis_name is not None and not self.is_initializing()
            # two-pass moments: E[(x - E[x])^2] rather than E[x^2] - E[x]^2,
            # which cancels catastrophically in float32 and makes gradients
            # depend visibly on cross-device reduction order
            mean = jnp.mean(xf, axis=axes)
            if sync:
                mean = jax.lax.pmean(mean, self.axis_name)
            var = jnp.mean(jnp.square(xf - mean), axis=axes)
            if sync:
                var = jax.lax.pmean(var, self.axis_name)

            std = jnp.sqrt(var + self.epsilon)
            mov_std = jnp.sqrt(ra_var.value + self.epsilon)
            if r_max is None:
                r = jnp.ones_like(std)
                d = jnp.zeros_like(mean)
            else:
                r = jax.lax.stop_gradient(
                    jnp.clip(std / mov_std, 1.0 / r_max, r_max))
                d = jax.lax.stop_gradient(
                    jnp.clip((mean - ra_mean.value) / mov_std, -d_max, d_max))

            y = (xf - mean) / std * r + d

            if not self.is_initializing():
                ra_mean.value = (self.decay * ra_mean.value
                                 + (1.0 - self.decay) * mean)
                ra_var.value = (self.decay * ra_var.value
                                + (1.0 - self.decay) * var)
        else:
            mov_std = jnp.sqrt(ra_var.value + self.epsilon)
            y = (xf - ra_mean.value) / mov_std

        y = y * gamma + beta
        return y.astype(self.dtype)


def _trunc_normal(stddev):
    return nn.initializers.truncated_normal(stddev=stddev, lower=-2.0, upper=2.0)


class ConvBR(nn.Module):
    """conv -> [batch renorm | bias] -> [activation], the reference's
    ``slim.ops.conv2d`` (/root/reference/network/slim/ops.py:219-299).

    Weights init: truncated normal stddev=0.01; bias init 0.  Weight decay is
    NOT baked in here — the trainer computes the L2 penalty over conv kernels
    explicitly (see densereg_tpu.train.state.weight_decay_loss), matching the
    reference's REGULARIZATION_LOSSES collection.
    """

    features: int
    kernel: Tuple[int, int] = (3, 3)
    stride: int = 1
    use_bn: bool = True
    activation: Optional[Callable] = nn.relu
    stddev: float = 0.01
    bn_decay: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    feature_group_count: int = 1
    # int8 serving path: expects {kernel_q int8, scale f32 (out,), bias}
    # produced by models.quantize.quantize_weights on a folded graph;
    # activations are quantized dynamically (per-tensor symmetric max).
    quantized: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool, r_max=None, d_max=None):
        if self.quantized:
            return self._quantized_call(x)
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=(self.stride, self.stride),
            padding="SAME",
            use_bias=not self.use_bn,
            feature_group_count=self.feature_group_count,
            kernel_init=_trunc_normal(self.stddev),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        if self.use_bn:
            x = BatchRenorm(decay=self.bn_decay, epsilon=self.bn_epsilon,
                            dtype=self.dtype, axis_name=self.axis_name,
                            name="bn")(
                x, train=train, r_max=r_max, d_max=d_max)
        if self.activation is not None:
            x = self.activation(x)
        return x

    def _quantized_call(self, x):
        """int8 x int8 -> int32 conv on the MXU; dequantize + bias +
        activation in float.

        Input scale: taken from the incoming :class:`QTensor` when the
        producer already quantized (calibrated fast path — the conv reads
        int8 straight from HBM, no consumer-side quantize pass); else static
        per-conv when the ``act_stats`` collection carries a calibrated
        ``amax``; else dynamic per-tensor symmetric max (a full-tensor
        reduction before every conv — correct but slow; round-1 measurement:
        6.3k fps vs 9.1k bf16).

        Output: when calibrated (``out_amax`` present or being recorded)
        the layer ALSO emits its own int8 quantization and returns a
        :class:`QTensor` — producer-side quantization fuses into the conv
        epilogue and the float output is dead-code-eliminated on
        conv->conv edges (same scale and rounding as the consumer-side
        quantize it replaces, so the math is unchanged)."""
        in_ch = x.shape[-1] // 1
        k_h, k_w = self.kernel
        kernel_q = self.param(
            "kernel_q",
            lambda _: jnp.zeros(
                (k_h, k_w, in_ch // self.feature_group_count, self.features),
                jnp.int8))
        scale = self.param("scale",
                           lambda _: jnp.ones((self.features,), jnp.float32))
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)

        calibrating = self.is_mutable_collection("act_stats")
        if isinstance(x, QTensor):
            x_q, s_x = x.q, x.s
        else:
            xf = x.astype(jnp.float32)
            if calibrating or self.has_variable("act_stats", "amax"):
                amax = self.variable("act_stats", "amax",
                                     lambda: jnp.zeros((), jnp.float32))
                if calibrating:
                    cur = jnp.max(jnp.abs(xf))
                    amax.value = jnp.maximum(amax.value, cur)
                    s_x = jnp.maximum(cur, 1e-8) / 127.0
                else:
                    s_x = jnp.maximum(amax.value, 1e-8) / 127.0
            else:
                s_x = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
            x_q = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            x_q, kernel_q,
            window_strides=(self.stride, self.stride),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.feature_group_count,
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * (s_x * scale) + bias
        if self.activation is not None:
            y = self.activation(y)
        return quantize_output(self, y, self.dtype)


def quantize_output(mod: nn.Module, y, dtype):
    """Producer-side activation quantization (calibrated graphs only).

    Records/uses the module's own output absmax in ``act_stats/out_amax``
    and returns a :class:`QTensor`; uncalibrated graphs keep the plain
    float return (consumer-side quantize, unchanged behavior)."""
    calibrating = mod.is_mutable_collection("act_stats")
    if not (calibrating or mod.has_variable("act_stats", "out_amax")):
        return y.astype(dtype)
    oam = mod.variable("act_stats", "out_amax",
                       lambda: jnp.zeros((), jnp.float32))
    yf = y.astype(jnp.float32)
    if calibrating:
        cur = jnp.max(jnp.abs(yf))
        oam.value = jnp.maximum(oam.value, cur)
        s_y = jnp.maximum(cur, 1e-8) / 127.0
    else:
        s_y = jnp.maximum(oam.value, 1e-8) / 127.0
    q_y = jnp.clip(jnp.round(yf / s_y), -127, 127).astype(jnp.int8)
    return QTensor(y.astype(dtype), q_y, s_y)


class Residual(nn.Module):
    """Bottleneck residual (/root/reference/network/um_v1.py:18-48):
    1x1 (in/2) -> kxk (in/2) -> 1x1 (out), each conv+renorm+relu, plus an
    identity shortcut (or a 1x1 conv+renorm+relu projection when the channel
    count changes).  The sum itself has no activation.
    """

    features: Optional[int] = None
    kernel_size: int = 3
    bn_decay: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    # False builds bias-convs instead of renorm-convs (for serving graphs
    # fed by models.fold.fold_batch_norm)
    use_bn: bool = True
    # depthwise-separable middle conv (the "um_v1_lite" variant)
    separable: bool = False
    quantized: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool, r_max=None, d_max=None):
        num_in = x.shape[-1]
        num_out = self.features if self.features is not None else num_in
        half = num_in // 2
        kw = dict(train=train, r_max=r_max, d_max=d_max)
        conv = lambda f, k, name, groups=1: ConvBR(
            f, (k, k), bn_decay=self.bn_decay, bn_epsilon=self.bn_epsilon,
            dtype=self.dtype, axis_name=self.axis_name, use_bn=self.use_bn,
            feature_group_count=groups, quantized=self.quantized, name=name)
        y = conv(half, 1, "conv1")(x, **kw)
        y = conv(half, self.kernel_size, "conv2",
                 groups=half if self.separable else 1)(y, **kw)
        y = conv(num_out, 1, "conv3")(y, **kw)
        if num_out == num_in:
            s = x
        else:
            s = conv(num_out, 1, "shortcut")(x, **kw)
        out = as_float(y) + as_float(s)
        if self.quantized:
            # calibrated graphs re-quantize the sum here (fused into the
            # add) so the following layer reads int8, not bf16
            return quantize_output(self, out, self.dtype)
        return out


def max_pool_same(x, window: int, stride: int):
    """Max pool with SAME padding (slim ``ops.max_pool``,
    /root/reference/network/slim/ops.py:640-670).

    Implemented as an elementwise max over the window^2 strided slices
    rather than ``lax.reduce_window``: the forward is identical, but the
    backward becomes a handful of masked adds instead of TPU's slow
    select-and-scatter.  (Gradient tie-breaking differs on exactly-equal
    window elements — split across ties instead of first-wins — which is
    irrelevant to training.)

    Max pooling commutes with monotone quantization, so a :class:`QTensor`
    is pooled componentwise (both views, same scale) — consumers keep
    reading whichever side they need and XLA drops the other.
    """
    if isinstance(x, QTensor):
        return QTensor(max_pool_same(x.f, window, stride),
                       max_pool_same(x.q, window, stride), x.s)
    h, w = x.shape[-3], x.shape[-2]
    out_h = -(-h // stride)
    out_w = -(-w // stride)
    pad_h = max((out_h - 1) * stride + window - h, 0)
    pad_w = max((out_w - 1) * stride + window - w, 0)
    neg_inf = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
               else jnp.iinfo(x.dtype).min)
    pads = [(0, 0)] * (x.ndim - 3) + [
        (pad_h // 2, pad_h - pad_h // 2),
        (pad_w // 2, pad_w - pad_w // 2),
        (0, 0),
    ]
    xp = jnp.pad(x, pads, constant_values=neg_inf)
    out = None
    for i in range(window):
        for j in range(window):
            s = xp[..., i:i + (out_h - 1) * stride + 1:stride,
                   j:j + (out_w - 1) * stride + 1:stride, :]
            out = s if out is None else jnp.maximum(out, s)
    return out


def upsample_nearest_2x(x):
    """Nearest x2 upsample (slim ``ops.upsampling_nearest``,
    /root/reference/network/slim/ops.py:671-677).  Pure replication, so a
    :class:`QTensor` upsamples componentwise (same scale)."""
    if isinstance(x, QTensor):
        return QTensor(upsample_nearest_2x(x.f), upsample_nearest_2x(x.q),
                       x.s)
    b = x.shape[:-3]
    h, w, c = x.shape[-3:]
    x = jnp.broadcast_to(x[..., :, None, :, None, :], b + (h, 2, w, 2, c))
    return x.reshape(b + (2 * h, 2 * w, c))
