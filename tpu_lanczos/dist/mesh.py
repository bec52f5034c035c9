"""Mesh construction for the row-sharding axis.

One logical axis, ``"rows"`` — the only distribution axis this problem has
(SURVEY.md §2.3: the reference's two-GPU split is over matrix rows;
DP/PP/EP do not exist for a sparse e^A.x pipeline).  On real hardware the
axis should be laid out over ICI; on CPU test runs it maps over the
``xla_force_host_platform_device_count`` virtual devices.
"""

from __future__ import annotations

import jax
import numpy as np


ROWS = "rows"


def make_mesh(n_devices: int | None = None, devices=None) -> jax.sharding.Mesh:
    """1-D mesh over ``n_devices`` (default: all local devices)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devices)}"
            )
        devices = devices[:n_devices]
    return jax.sharding.Mesh(np.asarray(devices), (ROWS,))
