"""Checkpoint / resume via Orbax.

Mirrors the reference's ``tf.train.Saver`` contract
(/root/reference/model/train_single_gpu.py:108,120-123,168-175): the FULL
training state — params, optimizer slots, batch-renorm moving stats and the
renorm schedule clock — is saved every N steps under the model-name directory
and restorable by step; evaluation restores a ``selected_step`` (the
reference's ``-1`` meaning "downloaded pretrained" maps to "latest").
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from densereg_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, state: TrainState, step: Optional[int] = None) -> None:
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
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

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
        if state.ema_params is not None:
            template["ema_params"] = state.ema_params
        # Reconcile EMA presence with what's actually on disk: a no-EMA eval
        # template can restore an EMA checkpoint (the shadows are read into
        # a params-shaped slot and discarded), and an EMA template restoring
        # a no-EMA checkpoint simply gets no shadows.  Orbax enforces exact
        # tree match, so on an ema_params mismatch we flip the template's
        # ema slot and retry once.
        try:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        except ValueError as e:
            if "ema_params" not in str(e):
                raise
            if "ema_params" in template:
                template.pop("ema_params")
            else:
                template["ema_params"] = state.params
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        keep_ema = (state.ema_params is not None
                    and "ema_params" in restored)
        return state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=jax.numpy.asarray(restored["step"]),
            renorm_t=jax.numpy.asarray(restored["renorm_t"]),
            ema_params=restored["ema_params"] if keep_ema else None,
        )

    def close(self):
        self._mgr.close()
