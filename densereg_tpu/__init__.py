"""densereg_tpu — a TPU-native JAX framework for dense 3D hand-pose regression.

Re-implements the full capability surface of the denseReg reference
(stacked-hourglass depth-to-pose estimation: GT synthesis, network, vote
decoding, train/eval drivers, dataset tooling for ICVL/NYU/MSRA) as an
idiomatic JAX/XLA/Pallas framework:

* all per-sample math is written once, vectorized, and ``vmap``-ed over the
  batch (the reference builds O(points) graph nodes via ``tf.map_fn`` /
  ``tf.unstack`` — see /root/reference/data/util.py:41-56);
* preprocessing (crop/normalize) is a static-shape resampling program that
  jits onto the device instead of dynamic-shape host croppings;
* training steps are single jitted functions with gradient accumulation via
  ``lax.scan`` and data parallelism via ``shard_map`` over a device mesh;
* the vote/mean-shift decoder has a fused Pallas kernel with a jnp fallback.
"""

__version__ = "0.1.0"

from densereg_tpu import geometry, targets, preprocess, augment, decode
from densereg_tpu.config import CameraConfig, NetConfig, TrainConfig, EvalConfig

__all__ = [
    "geometry",
    "targets",
    "preprocess",
    "augment",
    "decode",
    "CameraConfig",
    "NetConfig",
    "TrainConfig",
    "EvalConfig",
]
