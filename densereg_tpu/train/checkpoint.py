"""Checkpoint / resume via Orbax.

Mirrors the reference's ``tf.train.Saver`` contract
(/root/reference/model/train_single_gpu.py:108,120-123,168-175): the FULL
training state — params, optimizer slots, batch-renorm moving stats and the
renorm schedule clock — is saved every N steps under the model-name directory
and restorable by step; evaluation restores a ``selected_step`` (the
reference's ``-1`` meaning "downloaded pretrained" maps to "latest").
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from densereg_tpu.train.state import TrainState

log = logging.getLogger(__name__)


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, state: TrainState, step: Optional[int] = None,
             block: bool = True) -> None:
        """Persist the full training state at ``step``.

        ``block=False`` returns as soon as orbax has snapshotted the
        (immutable) arrays and commits in a background thread — the d2h
        fetch and disk write overlap the next training steps instead of
        stalling them (a back-to-back save waits for the previous one, so
        ordering is preserved).  Use the default ``block=True`` wherever
        durability is needed before the process may exit: preemption,
        the final step, emergency checkpoints.
        """
        step = int(state.step) if step is None else int(step)
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
            "renorm_t": np.asarray(state.renorm_t),
        }
        if state.ema_params is not None:
            payload["ema_params"] = state.ema_params
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        if block:
            self._mgr.wait_until_finished()

    def wait(self) -> None:
        """Block until every in-flight async save has committed."""
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def _ema_on_disk(self, step: int) -> Optional[bool]:
        """Whether checkpoint ``step`` contains an ``ema_params`` subtree,
        probed from the saved item structure (None when undeterminable, e.g.
        an orbax version whose metadata does not expose the tree)."""
        try:
            meta = self._mgr.item_metadata(step)
        except Exception:
            return None
        for cand in (meta, getattr(meta, "tree", None),
                     getattr(meta, "item_metadata", None)):
            if isinstance(cand, dict):
                return "ema_params" in cand
            keys = getattr(cand, "keys", None)
            if callable(keys):
                try:
                    return "ema_params" in set(keys())
                except Exception:
                    continue
        return None

    def restore(self, state: TrainState,
                step: Optional[int] = None) -> TrainState:
        """Restore into the structure of ``state`` (template must match);
        ``step=None`` or ``-1`` -> latest."""
        if step is None or step == -1:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
            "renorm_t": np.asarray(state.renorm_t),
        }
        want_ema = state.ema_params is not None
        # Reconcile EMA presence with what's actually on disk: a no-EMA eval
        # template can restore an EMA checkpoint (the shadows are read into
        # a params-shaped slot and discarded), and an EMA template restoring
        # a no-EMA checkpoint re-seeds the shadows from the restored params
        # (an "EMA restart") rather than silently disabling EMA tracking.
        # Orbax enforces exact tree match, so the saved item structure is
        # probed first; the exception-text retry remains only as a fallback
        # for orbax versions whose metadata hides the tree.
        on_disk = self._ema_on_disk(step)
        if on_disk is True and not want_ema:
            template["ema_params"] = state.params
        elif (on_disk is None or on_disk is True) and want_ema:
            template["ema_params"] = state.ema_params
        try:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        except ValueError as e:
            if on_disk is not None or "ema_params" not in str(e):
                raise
            if "ema_params" in template:
                template.pop("ema_params")
            else:
                template["ema_params"] = state.params
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        if want_ema:
            if "ema_params" in restored:
                ema = restored["ema_params"]
            else:
                log.warning(
                    "checkpoint step %s has no ema_params; re-seeding the "
                    "EMA shadows from the restored params (EMA restart — "
                    "the moving average begins again from this point)", step)
                ema = restored["params"]
        else:
            ema = None
        return state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=jax.numpy.asarray(restored["step"]),
            renorm_t=jax.numpy.asarray(restored["renorm_t"]),
            ema_params=ema,
        )

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
