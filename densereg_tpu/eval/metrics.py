"""Pose-error metrics (/root/reference/data/evaluation.py).

The per-frame metrics are also provided as jnp functions so they can run
batched on device during validation; the curve/report helpers are host-side
numpy like the reference.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def max_joint_error(pred, gt):
    """Per-frame max over joints of the euclidean error
    (/root/reference/data/evaluation.py:8-12).  Accepts (..., 3j)."""
    d = (jnp.asarray(pred) - jnp.asarray(gt))
    d = d.reshape(d.shape[:-1] + (-1, 3))
    return jnp.max(jnp.linalg.norm(d, axis=-1), axis=-1)


def mean_joint_error(pred, gt):
    """(/root/reference/data/evaluation.py:14-18)"""
    d = (jnp.asarray(pred) - jnp.asarray(gt))
    d = d.reshape(d.shape[:-1] + (-1, 3))
    return jnp.mean(jnp.linalg.norm(d, axis=-1), axis=-1)


THRESHOLDS_MM = [t * 5.0 + 0.5 for t in range(17)]  # evaluation.py:49,90


def threshold_curve(scores: Sequence[float]) -> Tuple[List[float], List[float]]:
    """Fraction of frames with max-joint-error < tau for tau in 0.5+5k mm
    (/root/reference/data/evaluation.py:49-60)."""
    s = np.sort(np.asarray(scores, np.float64))
    n = max(len(s), 1)
    fractions = [float(np.sum(s < t)) / n for t in THRESHOLDS_MM]
    return list(THRESHOLDS_MM), fractions


def summarize_percentages(scores: Sequence[float]) -> dict:
    """The 10/20/30/40mm report lines (/root/reference/data/evaluation.py:
    25-47), returned as a dict instead of printed."""
    s = np.asarray(scores, np.float64)
    n = max(len(s), 1)
    return {f"{m}mm": float(np.sum(s <= m + 0.5)) / n for m in (10, 20, 30, 40)}
