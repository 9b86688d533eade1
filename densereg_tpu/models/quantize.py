"""Post-training int8 quantization for serving.

v5e's MXU runs int8 at twice the bf16 rate; this converts a BN-folded
serving graph (see :mod:`densereg_tpu.models.fold`) into the int8 form the
``quantized`` ConvBR path consumes:

  * weights: symmetric per-output-channel int8
    (``kernel_q = round(k / s_w)``, ``s_w = max|k| / 127`` over (h, w, in));
  * activations: per-tensor symmetric scales, STATIC from a calibration
    pass (:func:`calibrate` records each conv input's running absmax into
    the ``act_stats`` collection) — the serving path then has zero
    activation reductions, only a fused elementwise requantize; without
    calibration the layer falls back to dynamic per-batch scaling;
  * accumulation in int32 on the MXU, dequantize+bias+relu in float.

Accuracy contract: decoded poses move by <~1 mm vs the float graph on the
synthetic benchmark scenes (pinned in tests/test_quantize.py).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from densereg_tpu.config import NetConfig


def quantize_weights(folded_variables):
    """params of a fold_bn graph -> params of a quantize graph."""
    def walk(node):
        out = {}
        for key, val in node.items():
            if not isinstance(val, dict):
                out[key] = val
                continue
            if "conv" in val and set(val["conv"]) >= {"kernel", "bias"}:
                k = val["conv"]["kernel"].astype(jnp.float32)
                s_w = jnp.maximum(
                    jnp.max(jnp.abs(k), axis=(0, 1, 2)), 1e-8) / 127.0
                k_q = jnp.clip(jnp.round(k / s_w), -127, 127).astype(jnp.int8)
                out[key] = {"kernel_q": k_q, "scale": s_w,
                            "bias": val["conv"]["bias"]}
            else:
                out[key] = walk(val)
        return out

    return {"params": walk(folded_variables["params"])}


def quantized_net_config(cfg: NetConfig) -> NetConfig:
    return dataclasses.replace(cfg, fold_bn=True, quantize=True)


def calibrate(net, variables, batches):
    """Record per-conv activation absmax over calibration batches.

    Args:
      net: a quantized ``DenseRegNet`` (``quantize=True`` config).
      variables: output of :func:`quantize_weights`.
      batches: iterable of normalized depth maps (the net's input), e.g. a
        few hundred representative frames.
    Returns:
      ``variables`` with the ``act_stats`` collection baked in; serving
      applies then use static activation scales (no per-conv reductions).
    """
    variables = dict(variables)
    for dms in batches:
        _, upd = net.apply(variables, dms, train=False,
                           mutable=["act_stats"])
        variables["act_stats"] = upd["act_stats"]
    return variables
