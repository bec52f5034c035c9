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


def init_distributed(**kw) -> None:
    """Initialize multi-host JAX (DCN) before any backend use.

    Thin wrapper over ``jax.distributed.initialize`` so multi-host runs
    (SURVEY.md §7 step 6) use the same mesh code path: after this,
    ``make_mesh(global_devices=True)`` spans every chip in the slice and
    the row-sharded shard_map program is unchanged — XLA routes the
    all_gather/psum over ICI within hosts and DCN across them.
    """
    jax.distributed.initialize(**kw)


def make_mesh(n_devices: int | None = None, devices=None) -> jax.sharding.Mesh:
    """1-D mesh over ``n_devices`` (default: every device in the slice —
    after ``init_distributed`` that spans all hosts)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devices)}"
            )
        devices = devices[:n_devices]
    return jax.sharding.Mesh(np.asarray(devices), (ROWS,))
