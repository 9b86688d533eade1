"""Inference-time batch-norm folding.

Eval-mode batch renorm is an affine transform in the frozen moving stats
(/root/reference/network/slim/ops.py:173-180):

    y = (conv(x) - mean) / sqrt(var + eps) * gamma + beta

which folds exactly into the convolution:

    kernel' = kernel * s           (s = gamma / sqrt(var + eps), per out-ch)
    bias'   = beta - mean * s

Serving graphs built with ``NetConfig(fold_bn=True)`` contain bias-convs
with the same module names; :func:`fold_batch_norm` converts trained
``{params, batch_stats}`` into their parameter tree.  This removes every
normalize/cast pass (one per conv, ~130 on the flagship) from the serving
path — work XLA cannot fully elide because the stats live in float32 around
bfloat16 activations.
"""

from __future__ import annotations

import jax.numpy as jnp


def fold_batch_norm(variables, eps: float = 1e-3):
    """{params, batch_stats} of a use_bn model -> params of a fold_bn model."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def fold(pnode, snode):
        out = {}
        for key, val in pnode.items():
            if not isinstance(val, dict):
                out[key] = val
                continue
            if "conv" in val and "bn" in val:
                bn = val["bn"]
                sbn = snode[key]["bn"]
                s = bn["gamma"] / jnp.sqrt(sbn["var"] + eps)
                kernel = val["conv"]["kernel"] * s
                bias = bn["beta"] - sbn["mean"] * s
                out[key] = {"conv": {"kernel": kernel, "bias": bias}}
            else:
                out[key] = fold(val, snode.get(key, {}) if isinstance(
                    snode, dict) else {})
        return out

    return {"params": fold(params, stats)}
