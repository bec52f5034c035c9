"""Pallas TPU SpMV kernel over the CPG format (see kernels/cpg.py).

Microbenchmark-driven structure (all numbers measured on v5e via the
axon tunnel, .scratch/probe*.log):

- anything data-dependent at GRID granularity stalls ~1-1.5us/step
  (scalar-prefetch-indexed BlockSpec windows force conservative flushes);
- inside a kernel, `lax.fori_loop` + dynamic VMEM slices cost ~nothing
  (72 cyc per 16K-element slice-add);
- the routing chain lane-gather -> transpose -> lane-gather runs at
  ~500 cyc per (128,128) tile.

Hence: ONE grid step per dest chunk (output window is a pure grid-index
BlockSpec -> exactly one flush per chunk), and an in-kernel fori_loop
over that chunk's tiles, double-buffering the two (128,128) int8 index
tiles from HBM by hand (pltpu.make_async_copy), with x fully VMEM
resident and sliced dynamically per tile.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_lanczos.kernels.cpg import CPGGraph, LANE


def _kernel(starts, counts, s_ids, l1_hbm, l2_hbm, x_ref, o_ref,
            l1_buf, l2_buf, sems):
    """Grid step d: accumulate all tiles of dest chunk d.

    starts/counts/s_ids are scalar-prefetched (SMEM); l1/l2 live in HBM
    and stream through 2-slot VMEM buffers; x_ref is fully resident.
    """
    d = pl.program_id(0)
    start = starts[d]
    count = counts[d]

    def dma(slot, i):
        t = start + i
        return (
            pltpu.make_async_copy(
                l1_hbm.at[pl.ds(t * LANE, LANE), :], l1_buf.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                l2_hbm.at[pl.ds(t * LANE, LANE), :], l2_buf.at[slot],
                sems.at[slot, 1],
            ),
        )

    @pl.when(count > 0)
    def _():
        a, b = dma(0, 0)
        a.start()
        b.start()

    def body(i, acc):
        two = jnp.asarray(2, i.dtype)
        slot = jax.lax.rem(i, two)
        nxt = jax.lax.rem(i + 1, two)

        @pl.when(i + 1 < count)
        def _():
            a, b = dma(nxt, i + 1)
            a.start()
            b.start()

        a, b = dma(slot, i)
        a.wait()
        b.wait()

        s = s_ids[start + i]
        xs = x_ref[pl.ds(s * LANE, LANE), :]
        g1 = jnp.take_along_axis(
            xs, l1_buf[slot].astype(jnp.int32), axis=1
        )
        g2 = g1.T
        g3 = jnp.take_along_axis(
            g2, l2_buf[slot].astype(jnp.int32), axis=1
        )
        return acc + g3

    o_ref[:] = jax.lax.fori_loop(
        0, count, body, jnp.zeros((LANE, LANE), x_ref.dtype)
    )


def _run_level(x2d, level, n_chunks, interpret):
    return pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # starts, counts, s_ids
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # l1 stays in HBM
                pl.BlockSpec(memory_space=pltpu.ANY),  # l2 stays in HBM
                pl.BlockSpec(memory_space=pltpu.VMEM),  # x2d resident
            ],
            out_specs=pl.BlockSpec(
                (LANE, LANE), lambda d, *_: (d, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((2, LANE, LANE), jnp.int8),
                pltpu.VMEM((2, LANE, LANE), jnp.int8),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_chunks * LANE, LANE), x2d.dtype),
        interpret=interpret,
    )(
        level["starts"], level["counts"], level["s_ids"],
        level["l1"], level["l2"], x2d,
    )


@partial(jax.jit, static_argnames=("interpret",))
def spmv_cpg(cg: CPGGraph, x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """y = A @ x; x is (n_pad,) in CPG-permuted order, lane-127 slots zero."""
    C = cg.n_chunks
    n_sub = cg.n_sub
    x2d = x.reshape(n_sub, LANE)

    def untranspose(yt):
        # (C*128, 128) stacked (ld, rd) blocks -> (n_sub, 128) y2d layout
        return yt.reshape(C, LANE, LANE).transpose(0, 2, 1).reshape(n_sub, LANE)

    yt = _run_level(x2d, cg.levels[0], C, interpret)
    y2d = untranspose(yt)
    for level in cg.levels[1:]:
        yt = _run_level(y2d, level, C, interpret)
        y2d = y2d + untranspose(yt)
    y = y2d.reshape(-1) * cg.realmask.astype(x.dtype)
    return y


def available_for(graph) -> bool:
    """VMEM bound: x2d (4B/row) plus one output block must stay resident."""
    try:
        import jax

        if jax.default_backend() in ("cpu", "gpu"):
            return False
    except Exception:
        return False
    return graph.n <= 2_500_000


def pack(graph):
    from tpu_lanczos.kernels.cpg import pack_cpg

    return pack_cpg(graph)
