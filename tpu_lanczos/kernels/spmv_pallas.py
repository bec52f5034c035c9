"""Pallas TPU SpMV kernel over the lane-classed tile format.

The TPU answer to the reference's CUDA SpMV kernel family
(parallel-final/lib/cu_SPMV.cu:30-206, chosen kernel cu_spMV1 at
blocksize 1024).  One grid step per (128, 128) tile:

  1. one sublane-gather pulls 16384 x-values from the VMEM-resident x2d
     (ghost cells read a guaranteed-zero sublane — no masks, no branches),
  2. tiles of the same 128-row block accumulate elementwise into a VMEM
     scratch accumulator (the block's tiles are consecutive in the grid),
  3. on the block's last tile, a single (1,128)x(128,128) MXU contraction
     reduces lanes: y_block[i] = sum_j acc[i, j], written to the block's
     row of the (n_blocks, 128) output.

Scalar-prefetched ``tile_block`` drives both the output index_map and the
first/last-tile predicates — the Pallas analog of the reference's
host-side ``get_blockrows`` block-to-row assignment
(parallel-final/lib/cu_SPMV.cu:210-251), but computed once at pack time.

x must fit in VMEM (n_pad * 4 bytes, ~3M rows on a 16MB-VMEM core); the
dispatcher falls back to the XLA path beyond that.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_lanczos.kernels.tiles import TileGraph, LANE

# keep x2d + double-buffered index tiles + accumulator well under ~16MB
_VMEM_X_LIMIT_BYTES = 12 * 1024 * 1024


def _kernel(tb_ref, colsub_ref, x2d_ref, o_ref, acc_ref):
    # Output blocks are (8, 128) spanning 8 row-blocks (Mosaic requires
    # sublane-divisible output windows); each row-block's result row is
    # written when its last tile is reached.
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    gathered = jnp.take_along_axis(x2d_ref[:], colsub_ref[:], axis=0)

    blk = tb_ref[t]
    is_first = jnp.logical_or(t == 0, tb_ref[jnp.maximum(t - 1, 0)] != blk)
    is_last = jnp.logical_or(
        t == nt - 1, tb_ref[jnp.minimum(t + 1, nt - 1)] != blk
    )

    @pl.when(is_first)
    def _():
        acc_ref[:] = gathered

    @pl.when(jnp.logical_not(is_first))
    def _():
        acc_ref[:] = acc_ref[:] + gathered

    @pl.when(is_last)
    def _():
        # lane reduction on the MXU: row[0, i] = sum_j acc[i, j]
        ones = jnp.ones((1, LANE), dtype=acc_ref.dtype)
        row = jax.lax.dot_general(
            ones,
            acc_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc_ref.dtype,
        )
        o_ref[pl.ds(blk % 8, 1), :] = row


@partial(jax.jit, static_argnames=("interpret",))
def spmv_tiles(tg: TileGraph, x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """y = A @ x with A in lane-classed tiles; x is (n_pad,) zero-padded
    (permuted order). Returns (n_pad,)."""
    n_sub = tg.n_pad // LANE
    x2d = x.reshape(n_sub, LANE)
    n_sb = (tg.n_blocks + 7) // 8  # super-blocks of 8 row-blocks
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tg.n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (LANE, LANE), lambda t, tb: (t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x2d fully resident
        ],
        out_specs=pl.BlockSpec(
            (8, LANE), lambda t, tb: (tb[t] // 8, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((LANE, LANE), x.dtype)],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_sb * 8, LANE), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * tg.n_tiles * LANE * LANE,
            bytes_accessed=tg.n_tiles * LANE * LANE * 4 + tg.n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(tg.tile_block, tg.colsub, x2d)
    return out.reshape(-1)[: tg.n_pad]


def supported(tg) -> bool:
    """Whether the Pallas tile path can run.

    Currently always False on real hardware: Mosaic's dynamic_gather
    requires indices and table to have identical shapes (jax 0.9
    lowering.py:_gather_lowering_rule), which this kernel's
    (128,128)-indices-vs-(n_sub,128)-table gather violates.  The
    chunk-pair kernel in spmv_pallas2 supersedes it; this kernel still
    runs under ``interpret=True`` and documents the design lineage."""
    return False
