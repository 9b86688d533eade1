"""Multi-host initialization.

The reference has no distributed backend at all (SURVEY.md §2: its gradient
"all-reduce" is an in-graph concat+mean).  For multi-host TPU slices the
TPU-native equivalent is single-controller JAX: every host calls
``jax.distributed.initialize`` and then sees the global device set; all
cross-chip communication is XLA collectives over ICI/DCN.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Initialize multi-host JAX if requested via args or environment.

    Returns True when running multi-process.  Safe to call on single-host
    (it becomes a no-op, so the same entry points work on 1 chip and on a
    pod slice).
    """
    env_np = os.environ.get("DENSEREG_NUM_PROCESSES")
    if coordinator_address is None and env_np is None:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes or (int(env_np) if env_np else None),
            process_id=process_id,
        )
    except RuntimeError:
        # already initialized
        pass
    return jax.process_count() > 1
