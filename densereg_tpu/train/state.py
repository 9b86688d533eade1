"""Train state and loss.

The reference keeps optimizer slots, batch-renorm moving stats and the r/d/t
schedule counters as mutable graph variables restored wholesale by
``tf.train.Saver`` (/root/reference/model/train_single_gpu.py:108).  Here the
same state is one explicit pytree — ``TrainState`` — threaded through a pure
jitted step function and checkpointed with Orbax.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from densereg_tpu import augment, targets
from densereg_tpu.config import NetConfig, TrainConfig
from densereg_tpu.models import DenseRegNet, renorm_clip_schedule
from densereg_tpu.preprocess import norm_dm
from densereg_tpu.train import losses as loss_lib
from densereg_tpu.train.lr import staircase_exponential_decay


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray                 # global (optimizer) step
    params: Any
    batch_stats: Any
    opt_state: Any
    renorm_t: jnp.ndarray             # accumulated renorm schedule time
    # exponential moving average of params (None unless tcfg.ema_decay set)
    ema_params: Any = None
    tx: optax.GradientTransformation = flax.struct.field(
        pytree_node=False, default=None)
    apply_fn: Any = flax.struct.field(pytree_node=False, default=None)


def make_optimizer(tcfg: TrainConfig, steps_per_epoch: float):
    """adam(beta1=0.5) on staircase-decayed LR, with elementwise +-0.2 clip of
    the (accumulated, averaged) gradients
    (/root/reference/model/train_single_gpu.py:45-55,86-89)."""
    decay_steps = int(steps_per_epoch * tcfg.epochs_per_decay)
    schedule = staircase_exponential_decay(
        tcfg.init_lr, decay_steps, tcfg.lr_decay_factor)
    return optax.chain(
        optax.clip(tcfg.grad_clip_value),
        optax.adam(schedule, b1=tcfg.adam_beta1),
    )


def create_train_state(rng, net_cfg: NetConfig, tcfg: TrainConfig,
                       steps_per_epoch: float,
                       axis_name: Optional[str] = None) -> TrainState:
    net = DenseRegNet(net_cfg, axis_name=axis_name)
    h, w = net_cfg.input_hw
    dummy = jnp.zeros((1, h, w, 1), jnp.float32)
    variables = net.init({"params": rng}, dummy, train=False)
    tx = make_optimizer(tcfg, steps_per_epoch)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        renorm_t=jnp.zeros((), jnp.float32),
        ema_params=(jax.tree.map(jnp.copy, variables["params"])
                    if tcfg.ema_decay is not None else None),
        tx=tx,
        apply_fn=net.apply,
    )


def weight_decay_loss(params, weight_decay: float) -> jnp.ndarray:
    """L2 penalty over conv kernels only (biases and renorm beta/gamma are
    exempt), matching slim's REGULARIZATION_LOSSES: ``wd * sum(w^2)/2`` per
    kernel (/root/reference/network/slim/losses.py:83-99, applied at
    /root/reference/network/um_v1.py:35).  The inter-stack re-injection
    convs are excluded — the reference creates them without weight decay
    (/root/reference/network/um_v1.py:176-181)."""
    total = jnp.zeros((), jnp.float32)
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        if not path or getattr(path[-1], "key", None) != "kernel":
            continue
        if any(str(getattr(p, "key", "")).startswith("inter_")
               for p in path):
            continue
        total += loss_lib.l2_regularizer(1.0)(leaf.astype(jnp.float32))
    return weight_decay * total


def loss_fn(params, batch_stats, apply_fn, batch, *, net_cfg: NetConfig,
            tcfg: TrainConfig, renorm_t, dropout_rng, aug_rng=None,
            axis_name=None):
    """Total training loss on one micro-batch
    (/root/reference/model/hourglass_um_crop_tiny.py:323-434).

    ``batch`` is a dict with ``dm (b,H,W,1) raw mm``, ``pose (b,3j)``,
    ``cfg (b,6)``, ``com (b,3)``.
    Returns (loss, (new_batch_stats, metrics)).

    ``axis_name``: inside ``shard_map`` the data terms sum over the LOCAL
    batch while the weight-decay term is replicated — it is divided by the
    axis size here so the caller's gradient/metric ``psum`` reconstitutes it
    exactly once.
    """
    dms, poses = batch["dm"], batch["pose"]
    cfgs, coms = batch["cfg"], batch["com"]

    if aug_rng is not None:
        dms, poses = augment.augment_batch(aug_rng, dms, poses, cfgs, coms)

    out_h, out_w = net_cfg.output_hw
    normed_dms = norm_dm(dms, coms)
    gt = targets.synthesize(poses, cfgs, coms, normed_dms, out_h, out_w)

    r_max, d_max = renorm_clip_schedule(renorm_t)

    def forward(params, batch_stats, normed_dms, r_max, d_max, rng):
        return apply_fn(
            {"params": params, "batch_stats": batch_stats},
            normed_dms, train=True, r_max=r_max, d_max=d_max,
            mutable=["batch_stats"], rngs={"dropout": rng})

    if net_cfg.remat:
        # rematerialize the whole forward on the backward pass: activations
        # never persist in HBM across the loss boundary, buying ~3x larger
        # micro batches for ~1/3 more FLOPs (jax.checkpoint; no reference
        # analogue — TF1 kept every activation)
        forward = jax.checkpoint(forward)
    outs, mutated = forward(params, batch_stats, normed_dms, r_max, d_max,
                            dropout_rng)

    # data-term loss: tf.nn.l2_loss semantics (sum of squares / 2, NOT a
    # mean) by default; "l1" selects the slim vocabulary's l1_loss
    data_loss = (loss_lib.l2_loss if tcfg.loss_type == "l2"
                 else loss_lib.l1_loss)
    hm_loss = sum(data_loss(est - gt["hm2"]) for est in outs["hm"])
    hm3_loss = sum(data_loss(est - gt["hm3"]) for est in outs["hm3"])
    um_loss = sum(data_loss(est - gt["um"]) for est in outs["um"])
    reg_loss = weight_decay_loss(params, tcfg.weight_decay)
    if axis_name is not None:
        reg_loss = reg_loss / jax.lax.axis_size(axis_name)
    total = hm_loss + hm3_loss + um_loss + reg_loss

    metrics = {
        "loss": total,
        "hm_loss": hm_loss,
        "hm3_loss": hm3_loss,
        "um_loss": um_loss,
        "reg_loss": reg_loss,
    }
    return total, (mutated["batch_stats"], metrics)
