"""Loss/regularizer vocabulary (slim ``losses``,
/root/reference/network/slim/losses.py).

The training stack consumes :func:`l2_loss` (data term, ``--loss_type l2``
default), :func:`l1_loss` (``--loss_type l1``) and :func:`l2_regularizer`
(the 5e-4 conv-kernel weight decay) through
``densereg_tpu.train.state.loss_fn``; ``cross_entropy_loss`` and
``l1_l2_regularizer`` are kept as tested reference-parity vocabulary (see
COVERAGE.md).  Unlike the reference there is no hidden LOSSES_COLLECTION —
callers sum what they use.
"""

from __future__ import annotations

import jax.numpy as jnp


def l2_loss(x, weight: float = 1.0):
    """``weight * sum(x^2) / 2`` (losses.py:100-117 / tf.nn.l2_loss)."""
    return weight * 0.5 * jnp.sum(jnp.square(x))


def l1_loss(x, weight: float = 1.0):
    """``weight * sum(|x|)`` (losses.py:119-135)."""
    return weight * jnp.sum(jnp.abs(x))


def l1_regularizer(weight: float = 1.0):
    """(losses.py:37-55)"""
    return lambda t: weight * jnp.sum(jnp.abs(t))


def l2_regularizer(weight: float = 1.0):
    """(losses.py:57-75) — the only regularizer the reference actually uses
    (weight 5e-4 on conv kernels, /root/reference/network/um_v1.py:35)."""
    return lambda t: weight * 0.5 * jnp.sum(jnp.square(t))


def l1_l2_regularizer(weight_l1: float = 1.0, weight_l2: float = 1.0):
    """(losses.py:77-99)"""
    return lambda t: (weight_l1 * jnp.sum(jnp.abs(t))
                      + weight_l2 * 0.5 * jnp.sum(jnp.square(t)))


def cross_entropy_loss(logits, one_hot_labels, label_smoothing: float = 0.0,
                       weight: float = 1.0):
    """Softmax cross entropy with label smoothing (losses.py:137-174)."""
    n_classes = one_hot_labels.shape[-1]
    if label_smoothing > 0:
        one_hot_labels = (one_hot_labels * (1.0 - label_smoothing)
                          + label_smoothing / n_classes)
    log_p = jnp.log(jnp.clip(jnp.exp(logits - jnp.max(logits, -1,
                                                      keepdims=True))
                             / jnp.sum(jnp.exp(logits - jnp.max(
                                 logits, -1, keepdims=True)),
                                       -1, keepdims=True), 1e-10))
    ce = -jnp.sum(one_hot_labels * log_p, axis=-1)
    return weight * jnp.mean(ce)
