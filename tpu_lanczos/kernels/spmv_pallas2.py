"""Pallas TPU SpMV over the CST format (see kernels/cst.py).

Two tiny kernels, both built on the only fast irregular primitives Mosaic
lowers on TPU (equal-shape lane/sublane dynamic_gather):

  _stage_kernel    G = take_along_axis(xT, IDX1, axis=1)    (lane-gather)
  _deliver_kernel  acc += take_along_axis(G, IDX3, axis=0)   (sublane-gather)

One (stage, deliver) pair per slot; slot count ~2x mean degree (packer's
job).  The XLA graph composes slots with lax.scan, so the whole SpMV —
and the whole Lanczos iteration around it — stays one fused device
program, mirroring the reference's one-stream-of-kernels-per-iteration
discipline (parallel-final/lib/cu_lanczos.cu:97-128) without its kernel
launch overhead.

This replaces the reference's four CUDA SpMV kernels (cu_SPMV.cu:30-206):
where CUDA picks thread mappings per launch, the TPU picks a data layout
per graph and keeps the kernel shape fixed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_lanczos.kernels.cst import CSTGraph, CLASSES


def _stage_kernel(x_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)


def _deliver_kernel(g_ref, idx_ref, acc_ref, o_ref):
    o_ref[:] = acc_ref[:] + jnp.take_along_axis(g_ref[:], idx_ref[:], axis=0)


def _stage(xT, idx1, interpret):
    return pl.pallas_call(
        _stage_kernel,
        out_shape=jax.ShapeDtypeStruct(xT.shape, xT.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xT, idx1)


def _deliver(g, idx3, acc, interpret):
    return pl.pallas_call(
        _deliver_kernel,
        out_shape=jax.ShapeDtypeStruct(acc.shape, acc.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(g, idx3, acc)


@partial(jax.jit, static_argnames=("interpret",))
def spmv_cst(cg: CSTGraph, x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """y = A @ x; x is (n_pad,) in CST-permuted order (zero padded)."""
    xT = x.reshape(CLASSES, cg.n_cols)

    def run_level(src, acc, idx1, idx3):
        def body(acc, slot):
            i1, i3 = slot
            g = _stage(src, i1, interpret)
            return _deliver(g, i3, acc, interpret), None

        acc, _ = jax.lax.scan(body, acc, (idx1, idx3))
        return acc

    acc = jnp.zeros_like(xT)
    acc = run_level(xT, acc, cg.idx1[0], cg.idx3[0])
    # reduce levels fold virtual partial sums into parents; sources are the
    # accumulator itself (virtual cells), so levels run sequentially
    for i1, i3 in zip(cg.idx1[1:], cg.idx3[1:]):
        acc = run_level(acc, acc, i1, i3)
    acc = acc * cg.realmask.astype(acc.dtype)
    return acc.reshape(-1)


def pack(graph):
    from tpu_lanczos.kernels.cst import pack_cst

    return pack_cst(graph)


def available_for(graph) -> bool:
    """CST cannot run on real TPU hardware: its gathers need reach beyond
    one vreg (Mosaic: 'Multiple source vregs along gather dimension' is
    not implemented — lane-gather reach is 128 lanes, sublane-gather
    reach is 8 sublanes).  The CPG kernel (kernels/spmv_cpg.py) is the
    hardware path; CST remains as an interpret-mode cross-check."""
    return False
