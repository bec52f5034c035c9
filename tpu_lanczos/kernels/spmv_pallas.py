"""Pallas TPU SpMV kernel (row-tiled, slot-major ELL).

Placeholder gate for round-1 bring-up: ``supported`` returns False until
the kernel lands, so dispatch stays on the fused-XLA paths.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu_lanczos.kernels.formats import DeviceGraph


def supported(dg: DeviceGraph, x: jnp.ndarray) -> bool:
    return False


def spmv(dg: DeviceGraph, x: jnp.ndarray) -> jnp.ndarray:
    raise NotImplementedError("pallas spmv kernel not yet implemented")
