"""The jitted training step: gradient accumulation + data parallelism.

The reference runs ``sub_batch`` separate ``sess.run`` round-trips per
optimizer step, accumulating gradients in graph variables
(/root/reference/model/train_single_gpu.py:69-89,144-150), and its multi-GPU
path replicates the graph per device with an in-graph concat/mean reduction
(/root/reference/model/train_multi_gpu.py:16-39).  Here the whole thing is ONE
jitted function:

* micro-batching is a ``lax.scan`` over the leading ``sub_batch`` axis of the
  batch (no host round-trips between micro steps);
* data parallelism is GSPMD: the batch axis carries a
  ``NamedSharding(mesh, P(None, "data"))`` and XLA inserts the gradient
  all-reduce (and cross-replica batch-norm moment reduction) over ICI —
  see :mod:`densereg_tpu.parallel.mesh` for the mesh/sharding helpers.

Semantics preserved from the reference: gradients are SUMMED over each micro
batch (``tf.nn.l2_loss`` sums, never averages), accumulated over micro steps,
divided by ``sub_batch``, clipped elementwise to +-0.2, then applied with
Adam(beta1=0.5); renorm moving stats and the schedule clock advance once per
MICRO step (the reference runs its update ops inside the accumulation loop).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from densereg_tpu.config import NetConfig, TrainConfig
from densereg_tpu.train.state import TrainState, loss_fn


def train_step_single(state: TrainState, batch, rng, *, net_cfg: NetConfig,
                      tcfg: TrainConfig, axis_name=None,
                      with_grads: bool = False):
    """One optimizer step.

    Args:
      state: TrainState.
      batch: dict of arrays with a leading ``(sub_batch, batch, ...)`` pair of
        axes: ``dm``, ``pose``, ``cfg``, ``com``.
      rng: PRNG key for dropout/augmentation, folded per micro step.
      axis_name: set when running inside ``shard_map`` — gradients and
        metrics are ``psum``-ed over this mesh axis (the state's model must
        have been built with the same ``axis_name`` so batch-norm moments
        pmean as well).
    Returns:
      (new_state, metrics dict averaged over micro steps).
    """
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def micro(carry, xs):
        batch_stats, renorm_t, accum = carry
        mb, key = xs
        drop_key, aug_key = jax.random.split(key)
        (loss, (batch_stats, metrics)), grads = grad_fn(
            state.params, batch_stats, state.apply_fn, mb,
            net_cfg=net_cfg, tcfg=tcfg, renorm_t=renorm_t,
            dropout_rng=drop_key,
            aug_rng=aug_key if tcfg.augment else None,
            axis_name=axis_name)
        accum = jax.tree.map(jnp.add, accum, grads)
        renorm_t = renorm_t + net_cfg.renorm_t_delta
        return (batch_stats, renorm_t, accum), metrics

    sub = jax.tree_util.tree_leaves(batch)[0].shape[0]
    keys = jax.random.split(rng, sub)
    zeros = jax.tree.map(jnp.zeros_like, state.params)
    (batch_stats, renorm_t, accum), metrics = jax.lax.scan(
        micro, (state.batch_stats, state.renorm_t, zeros), (batch, keys))

    if axis_name is not None:
        # explicit data parallelism: the loss sums over the LOCAL batch, so
        # the global gradient is the psum of the local sums
        accum = jax.lax.psum(accum, axis_name)
        metrics = jax.tree.map(lambda m: jax.lax.psum(m, axis_name), metrics)

    avg = jax.tree.map(lambda g: g / sub, accum)
    updates, opt_state = state.tx.update(avg, state.opt_state, state.params)
    params = jax.tree.map(jnp.add, state.params, updates)

    # observability: the reference logs weight/grad histograms and the LR to
    # TB (train_single_gpu.py:54,91-95); we log global norms to metrics.jsonl
    grad_norm = optax.global_norm(avg)
    param_norm = optax.global_norm(params)

    ema = state.ema_params
    if ema is not None and tcfg.ema_decay is not None:
        d = tcfg.ema_decay
        ema = jax.tree.map(lambda e, p: e * d + p * (1.0 - d), ema, params)

    new_state = state.replace(
        step=state.step + 1,
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        renorm_t=renorm_t,
        ema_params=ema,
    )
    metrics = jax.tree.map(lambda m: jnp.mean(m, axis=0), metrics)
    metrics["grad_norm"] = grad_norm
    metrics["param_norm"] = param_norm
    if with_grads:
        # for weight/grad histogram summaries (the reference's
        # train_single_gpu.py:91-95); stays on device unless fetched
        metrics["grads"] = avg
    return new_state, metrics


def make_train_step(net_cfg: NetConfig, tcfg: TrainConfig, mesh=None,
                    donate: bool = True, explicit: bool = False,
                    with_grads: bool = False):
    """Build the jitted train step; with ``mesh`` the batch is expected to be
    sharded ``P(None, "data")`` and the returned function carries the output
    shardings so parameters/optimizer state stay replicated.

    ``explicit=True`` uses the ``shard_map`` formulation with hand-placed
    collectives (``lax.psum`` gradients, ``lax.pmean`` batch-norm moments via
    the model's ``axis_name``) instead of GSPMD sharding annotations; the
    TrainState must then come from ``create_train_state(...,
    axis_name=tcfg.data_axis)``.  Both formulations are semantically
    identical (tests/test_parallel.py pins it); GSPMD is the default because
    XLA schedules the collectives itself.
    """
    step = functools.partial(train_step_single, net_cfg=net_cfg, tcfg=tcfg,
                             with_grads=with_grads)
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    if explicit:
        from jax.sharding import PartitionSpec as P

        if tuple(mesh.axis_names) != (tcfg.data_axis,):
            raise ValueError(
                "explicit shard_map path supports only the 1-D "
                f"({tcfg.data_axis},) mesh; use GSPMD (explicit=False) for "
                f"multi-axis meshes, got {mesh.axis_names}")
        inner = functools.partial(train_step_single, net_cfg=net_cfg,
                                  tcfg=tcfg, axis_name=tcfg.data_axis,
                                  with_grads=with_grads)
        smapped = jax.shard_map(
            inner, mesh=mesh,
            in_specs=(P(), P(None, tcfg.data_axis), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(smapped, donate_argnums=(0,) if donate else ())

    from jax.sharding import NamedSharding, PartitionSpec as P

    replicated = NamedSharding(mesh, P())
    # batch splits over EVERY mesh axis (pure data parallelism): on a
    # multi-slice (replica, data) mesh XLA lays the gradient all-reduce as
    # an ICI reduce within slices + a DCN phase across them
    batch_sharding = NamedSharding(mesh, P(None, tuple(mesh.axis_names)))

    def sharded_step(state, batch, rng):
        batch = jax.lax.with_sharding_constraint(
            batch, jax.tree.map(lambda _: batch_sharding, batch))
        new_state, metrics = step(state, batch, rng)
        new_state = jax.lax.with_sharding_constraint(
            new_state, jax.tree.map(lambda _: replicated, new_state))
        return new_state, metrics

    return jax.jit(sharded_step, donate_argnums=(0,) if donate else ())


def make_fused_train_step(net_cfg: NetConfig, tcfg: TrainConfig, cam_cfg,
                          fixed_bg_threshold=None, mesh=None,
                          donate: bool = True):
    """One jitted program from RAW frames to the updated state: crop /
    center-of-mass / normalization (densereg_tpu.preprocess) fused with the
    accumulating train step — a single host->device dispatch per batch
    instead of preprocess + step (the reference overlaps these with queue
    runners, /root/reference/data/dataset_base.py:164-193).

    Signature of the returned fn: ``(state, frames, poses, rng)`` with
    ``frames (sub*batch, H, W, 1)`` raw depth (uint16 or float32 mm) and
    ``poses (sub*batch, 3J)``.  Semantically identical to running
    ``preprocess_batch_from_pose`` then the plain train step on the
    reshaped result (pinned by tests/test_train.py); the win is dispatch /
    transfer-overlap behavior on remote-attached chips (BASELINE.md
    records the measurement).
    """
    from densereg_tpu.preprocess import preprocess_batch_from_pose

    h, w = net_cfg.input_hw
    cam_cfg = jnp.asarray(cam_cfg, jnp.float32)
    step = functools.partial(train_step_single, net_cfg=net_cfg, tcfg=tcfg)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        replicated = NamedSharding(mesh, P())
        raw_sharding = NamedSharding(mesh, P(tuple(mesh.axis_names)))
        batch_sharding = NamedSharding(mesh, P(None, tuple(mesh.axis_names)))

    def fused(state, frames, poses, rng):
        if mesh is not None:
            frames = jax.lax.with_sharding_constraint(frames, raw_sharding)
            poses = jax.lax.with_sharding_constraint(poses, raw_sharding)
        dm, pose, cfgs, coms = preprocess_batch_from_pose(
            frames, poses, cam_cfg, h, w, fixed_bg_threshold)
        sub = tcfg.sub_batch
        batch = {
            "dm": dm.reshape(sub, -1, h, w, 1),
            "pose": pose.reshape(sub, pose.shape[0] // sub, pose.shape[-1]),
            "cfg": cfgs.reshape(sub, -1, 6),
            "com": coms.reshape(sub, -1, 3),
        }
        if mesh is not None:
            batch = jax.lax.with_sharding_constraint(
                batch, jax.tree.map(lambda _: batch_sharding, batch))
        new_state, metrics = step(state, batch, rng)
        if mesh is not None:
            new_state = jax.lax.with_sharding_constraint(
                new_state, jax.tree.map(lambda _: replicated, new_state))
        return new_state, metrics

    return jax.jit(fused, donate_argnums=(0,) if donate else ())
