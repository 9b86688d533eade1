"""slim-parity op vocabulary.

The reference vendors a modified TF-Slim fork whose public layer surface is
``conv2d / depthwise_conv2d / deconv / fc / max_pool / avg_pool /
upsampling_nearest / dropout / flatten / one_hot_encoding / repeat_op``
(/root/reference/network/slim/ops.py).  The hourglass model only uses a
subset; this module provides the full vocabulary as functional jnp/flax
equivalents so code written against the reference op library has a direct
target.  Layers that create parameters are flax Modules; stateless ops are
plain functions.

Product consumers: :class:`Deconv` is the learned upsampling of the
``um_v1_deconv`` net variant (models/hourglass.py); ``ConvBR`` /
``BatchRenorm`` / ``max_pool_same`` / ``upsample_nearest_2x`` are the
re-exported core layers every variant uses.  The remainder
(``DepthwiseConv``, ``Fc``, ``avg_pool``, ``dropout``, ``flatten``,
``one_hot_encoding``, ``repeat_op``) is kept as tested reference-parity
vocabulary — see COVERAGE.md "slim op vocabulary" for the explicit
decision.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from densereg_tpu.models.layers import (  # re-exported for completeness
    BatchRenorm,
    ConvBR,
    max_pool_same,
    upsample_nearest_2x,
)

__all__ = [
    "ConvBR", "BatchRenorm", "DepthwiseConv", "Deconv", "Fc",
    "max_pool", "avg_pool", "upsampling_nearest", "dropout",
    "flatten", "one_hot_encoding", "repeat_op",
]


def _trunc_normal(stddev):
    return nn.initializers.truncated_normal(stddev=stddev, lower=-2.0,
                                            upper=2.0)


class DepthwiseConv(nn.Module):
    """Depthwise conv (slim ``depthwise_conv2d``,
    /root/reference/network/slim/ops.py:301-461): per-channel filters via
    ``feature_group_count``."""

    channel_multiplier: int = 1
    kernel: Tuple[int, int] = (3, 3)
    stride: int = 1
    padding: str = "SAME"
    activation: Optional[Callable] = nn.relu
    stddev: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = nn.Conv(c * self.channel_multiplier, self.kernel,
                    strides=(self.stride, self.stride), padding=self.padding,
                    feature_group_count=c,
                    kernel_init=_trunc_normal(self.stddev),
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        return self.activation(y) if self.activation else y


class Deconv(nn.Module):
    """Transposed conv (slim ``deconv``,
    /root/reference/network/slim/ops.py:480-545)."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    stride: int = 2
    activation: Optional[Callable] = nn.relu
    stddev: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.ConvTranspose(self.features, self.kernel,
                             strides=(self.stride, self.stride),
                             padding="SAME",
                             kernel_init=_trunc_normal(self.stddev),
                             dtype=self.dtype, param_dtype=jnp.float32)(x)
        return self.activation(y) if self.activation else y


class Fc(nn.Module):
    """Fully connected (slim ``fc``,
    /root/reference/network/slim/ops.py:548-616)."""

    features: int
    activation: Optional[Callable] = nn.relu
    stddev: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.features, kernel_init=_trunc_normal(self.stddev),
                     dtype=self.dtype, param_dtype=jnp.float32)(x)
        return self.activation(y) if self.activation else y


def max_pool(x, window: int = 2, stride: int = 2):
    return max_pool_same(x, window, stride)


def avg_pool(x, window: int = 2, stride: int = 2):
    """(/root/reference/network/slim/ops.py:680-707)"""
    h, w = x.shape[-3], x.shape[-2]
    out_h, out_w = -(-h // stride), -(-w // stride)
    pad_h = max((out_h - 1) * stride + window - h, 0)
    pad_w = max((out_w - 1) * stride + window - w, 0)
    dims = (1,) * (x.ndim - 3) + (window, window, 1)
    strides = (1,) * (x.ndim - 3) + (stride, stride, 1)
    pads = [(0, 0)] * (x.ndim - 3) + [
        (pad_h // 2, pad_h - pad_h // 2),
        (pad_w // 2, pad_w - pad_w // 2), (0, 0)]
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides, pads)
    counts = jax.lax.reduce_window(jnp.ones_like(x), 0.0, jax.lax.add, dims,
                                   strides, pads)
    return summed / counts


def upsampling_nearest(x, factor: int = 2):
    """(/root/reference/network/slim/ops.py:671-677)"""
    y = x
    for _ in range(factor.bit_length() - 1):
        y = upsample_nearest_2x(y)
    if 2 ** (factor.bit_length() - 1) != factor:
        raise ValueError("factor must be a power of two")
    return y


def dropout(x, rng, rate: float = 0.5, deterministic: bool = False):
    """keep_prob=0.5 default as the reference
    (/root/reference/network/slim/ops.py:710-728)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def flatten(x):
    """(/root/reference/network/slim/ops.py:731-...)"""
    return x.reshape(x.shape[0], -1)


def one_hot_encoding(labels, num_classes: int):
    return jax.nn.one_hot(labels, num_classes)


def repeat_op(repetitions: int, x, fn: Callable, *args, **kwargs):
    """Apply ``fn`` ``repetitions`` times (slim ``repeat_op``)."""
    for _ in range(repetitions):
        x = fn(x, *args, **kwargs)
    return x
