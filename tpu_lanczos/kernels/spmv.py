"""SpMV for the value-free adjacency matrix: y = A @ x.

XLA ("jnp") paths for every device format, plus dispatch to the Pallas
CPG kernel (:mod:`tpu_lanczos.kernels.spmv_cpg`) where profitable.
These are the TPU equivalents of the reference's four CUDA SpMV kernels
(parallel-final/lib/cu_SPMV.cu:30-206): instead of choosing a thread/block
mapping per launch, we choose a static layout per graph and let XLA fuse
the gather + mask + reduce.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_lanczos.kernels.formats import DeviceGraph


def _ell_spmv(dg: DeviceGraph, x: jnp.ndarray) -> jnp.ndarray:
    """Slot-major ELL: y[r] = sum_s x[ell[s, r]] for s < degree[r].

    One gather of shape (w, n_pad) — rows on the lane axis — followed by a
    masked reduction over slots, which XLA fuses into a single pass.
    """
    gathered = jnp.take(x, dg.ell_indices, axis=0)  # (w, n_pad)
    w = dg.ell_indices.shape[0]
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (w, dg.n_pad), 0)
    mask = slot_ids < dg.ell_degrees[None, :]
    return jnp.sum(jnp.where(mask, gathered, jnp.zeros((), x.dtype)), axis=0)


def _coo_spmv(dg: DeviceGraph, x: jnp.ndarray) -> jnp.ndarray:
    """Row-sorted COO segment-sum; pad entries land in an extra bucket."""
    vals = jnp.take(x, dg.coo_cols, axis=0)
    out = jax.ops.segment_sum(
        vals,
        dg.coo_rows,
        num_segments=dg.n_pad + 1,
        indices_are_sorted=True,
    )
    return out[: dg.n_pad]


def spmv(dg, x: jnp.ndarray, impl: str = "auto") -> jnp.ndarray:
    """y = A @ x with A in a packed device format.

    ``x`` must be (n_pad,) with zero padding beyond ``dg.n``; the result has
    the same shape/padding invariant.  Pallas formats (CPG, CST) dispatch to
    their kernels; DeviceGraph formats use the XLA paths.
    """
    from tpu_lanczos.kernels.cst import CSTGraph
    from tpu_lanczos.kernels.cpg import CPGGraph
    from tpu_lanczos.kernels.gpg import GPGGraph

    def _interp():
        # Pallas kernels compile only for TPU; interpret elsewhere
        return impl == "interpret" or jax.default_backend() in ("cpu", "gpu")

    if isinstance(dg, GPGGraph):
        from tpu_lanczos.kernels import spmv_gpg

        return spmv_gpg.spmv_gpg(dg, x, interpret=_interp())
    if isinstance(dg, CPGGraph):
        from tpu_lanczos.kernels import spmv_cpg

        return spmv_cpg.spmv_cpg(dg, x, interpret=_interp())
    if isinstance(dg, CSTGraph):
        from tpu_lanczos.kernels import spmv_pallas2

        return spmv_pallas2.spmv_cst(dg, x, interpret=_interp())
    # XLA paths (single dispatch, shared with the cross-check oracle)
    return spmv_xla(dg, x)


def spmv_xla(dg: DeviceGraph, x: jnp.ndarray) -> jnp.ndarray:
    """Pure-XLA SpMV (never Pallas) — the cross-check oracle on device."""
    if dg.fmt == "ell":
        return _ell_spmv(dg, x)
    if dg.fmt == "coo":
        return _coo_spmv(dg, x)
    if dg.fmt == "hyb":
        return _ell_spmv(dg, x) + _coo_spmv(dg, x)
    raise ValueError(f"unknown format {dg.fmt!r}")
