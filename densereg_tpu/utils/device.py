"""Device/environment shim — the L0 layer.

The reference's ``gpu_config.py`` parses an SGE lock file to pick
``CUDA_VISIBLE_DEVICES`` and silently falls back to CPU (SURVEY.md §2 item
1).  The TPU-native equivalent: JAX discovers the accelerator through PJRT;
this module only provides (a) env-driven device restriction, (b) a topology
report, and (c) a uniform "best available platform" helper — so entry points
never hard-code a platform.

Env vars honored:
  DENSEREG_VISIBLE_DEVICES  comma list of local device indices to use
  JAX_PLATFORMS             standard JAX platform override
"""

from __future__ import annotations

import os
from typing import List, Optional


def visible_devices(platform: Optional[str] = None) -> List:
    """jax.devices() filtered by DENSEREG_VISIBLE_DEVICES."""
    import jax

    devices = jax.devices(platform) if platform else jax.devices()
    spec = os.environ.get("DENSEREG_VISIBLE_DEVICES")
    if not spec:
        return devices
    idx = {int(s) for s in spec.split(",") if s.strip() != ""}
    return [d for d in devices if d.id in idx]


def topology_report() -> str:
    """Human-readable device summary (the reference logs its GPU pick at
    import time; we log on demand)."""
    import jax

    lines = [f"process {jax.process_index()}/{jax.process_count()}, "
             f"default backend: {jax.default_backend()}"]
    for d in jax.devices():
        coords = getattr(d, "coords", None)
        lines.append(
            f"  [{d.id}] {d.platform}:{getattr(d, 'device_kind', '?')}"
            + (f" coords={coords}" if coords is not None else ""))
    return "\n".join(lines)


def default_device():
    devs = visible_devices()
    if not devs:
        raise RuntimeError("no visible devices (DENSEREG_VISIBLE_DEVICES "
                           "filtered everything out)")
    return devs[0]
