"""Lane-classed tile format for the Pallas TPU SpMV kernel.

Why this exists: XLA's 1-D gather on TPU is effectively scalar (~0.06
Gnnz/s measured on v5e), so the jnp ELL path cannot compete with the
reference's CUDA SpMV kernels (parallel-final/lib/cu_SPMV.cu:30-206).
Mosaic's one fast irregular-access primitive is a *sublane* gather:
``out[s, l] = table[idx[s, l], l]`` (``take_along_axis`` along axis 0 of a
(rows, 128) table).  The tile format arranges the whole SpMV around it:

- x is viewed as ``x2d`` of shape (n_pad/128, 128): element c lives at
  [c // 128, c % 128] — its lane is its column id mod 128.
- Each 128-row block b of A gets T_b tiles of shape (128, 128).  Cell
  (i, j) of a tile holds at most one nonzero (r, c) with r = 128 b + i
  and c ≡ j (mod 128), stored as its gather index colsub = c // 128.
  Empty cells point at a dedicated always-zero ghost sublane, so no
  masking is needed anywhere.
- The kernel gathers each tile with one sublane-gather, accumulates tiles
  of a block elementwise in VMEM, and finishes the block with a single
  lane reduction on the MXU: y_block[i] = sum_j acc[i, j].

Collisions (two neighbors of row r in the same lane class j) go to
different tiles of the block, so T_b = max multiplicity over the block's
(i, j) cells.  Degree-aware row permutation (dist/partition.py) groups
similar-degree rows into blocks, keeping fill high for power-law graphs —
the same load-balancing concern the reference solved with nnz-aware
``get_blockrows`` packing (parallel-final/lib/cu_SPMV.cu:210-251).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class TileGraph:
    """Device arrays for the lane-classed tile SpMV.

    n_pad is a multiple of 128 and strictly greater than n, so the last
    sublane of x2d is guaranteed zero — ghost cells gather from it.
    """

    n: int
    n_pad: int
    nnz: int
    n_tiles: int
    n_blocks: int
    colsub: jnp.ndarray      # (n_tiles * 128, 128) int32 gather rows into x2d
    tile_block: jnp.ndarray  # (n_tiles,) int32 block id of each tile (sorted)
    # host permutation metadata (None = identity); aux, not traced
    new_of_old: np.ndarray | None = None

    def tree_flatten(self):
        from tpu_lanczos.utils import HostArray

        return (self.colsub, self.tile_block), (
            self.n, self.n_pad, self.nnz, self.n_tiles, self.n_blocks,
            HostArray(self.new_of_old),
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        n, n_pad, nnz, n_tiles, n_blocks, new_of_old = aux
        new_of_old = new_of_old.a
        colsub, tile_block = leaves
        return cls(n=n, n_pad=n_pad, nnz=nnz, n_tiles=n_tiles,
                   n_blocks=n_blocks, colsub=colsub, tile_block=tile_block,
                   new_of_old=new_of_old)

    @property
    def fill(self) -> float:
        """Fraction of tile cells holding a real nonzero."""
        return self.nnz / float(self.n_tiles * LANE * LANE)

    # ---------------------------------------------------------- vectors

    def permute_in(self, x: np.ndarray, dtype) -> np.ndarray:
        out = np.zeros(self.n_pad, dtype=dtype)
        if self.new_of_old is None:
            out[: self.n] = x
        else:
            out[self.new_of_old] = x
        return out

    def permute_out(self, y: np.ndarray) -> np.ndarray:
        y = np.asarray(y)
        if self.new_of_old is None:
            return y[: self.n]
        return y[self.new_of_old]


def pack_tiles_from_coo(
    rows: np.ndarray, cols: np.ndarray, n: int, n_pad: int,
    new_of_old: np.ndarray | None = None, nnz_true: int | None = None,
) -> TileGraph:
    """Build a TileGraph from (row, col) nonzeros in the (already
    permuted) padded labeling. ``n_pad`` must be a multiple of 128 with
    n_pad > max(rows|cols)."""
    assert n_pad % LANE == 0
    n_blocks = n_pad // LANE
    ghost = np.int32(n_blocks - 1)  # last sublane of x2d is all-zero

    b = (rows // LANE).astype(np.int64)
    i = (rows % LANE).astype(np.int64)
    j = (cols % LANE).astype(np.int64)
    cs = (cols // LANE).astype(np.int32)

    # multiplicity rank within each (b, i, j) cell group
    key = (b * LANE + i) * LANE + j
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    group_start = np.zeros(key_s.size, dtype=bool)
    if key_s.size:
        group_start[0] = True
        group_start[1:] = key_s[1:] != key_s[:-1]
    start_pos = np.where(group_start)[0]
    t_rank = np.arange(key_s.size) - np.repeat(
        start_pos, np.diff(np.append(start_pos, key_s.size))
    )

    b_s = b[order]
    # tiles per block: max rank + 1 within the block (>=1 for every block)
    T = np.ones(n_blocks, dtype=np.int64)
    np.maximum.at(T, b_s, t_rank + 1)
    tile_base = np.zeros(n_blocks, dtype=np.int64)
    tile_base[1:] = np.cumsum(T)[:-1]
    n_tiles = int(T.sum())

    colsub = np.full((n_tiles * LANE, LANE), ghost, dtype=np.int32)
    tile_id = tile_base[b_s] + t_rank
    colsub[tile_id * LANE + i[order], j[order]] = cs[order]

    tile_block = np.repeat(np.arange(n_blocks, dtype=np.int32), T)
    return TileGraph(
        n=n, n_pad=n_pad,
        nnz=int(nnz_true if nnz_true is not None else rows.size),
        n_tiles=n_tiles, n_blocks=n_blocks,
        colsub=jnp.asarray(colsub), tile_block=jnp.asarray(tile_block),
        new_of_old=new_of_old,
    )


def pack_tiles(graph, permute: bool = True) -> TileGraph:
    """Pack a host CSRGraph for the Pallas tile kernel.

    ``permute`` applies the degree-sorting relabeling (heavy rows first)
    so same-degree rows share 128-row blocks — this is what keeps T_b,
    and with it index memory and gather work, near the optimum of
    ceil(row degree / 128) per block.
    """
    n = graph.n
    # a full trailing zero sublane (128 pad positions) for ghost cells
    n_pad = _round_up(n, LANE) + LANE
    rows = graph.row_ids().astype(np.int64)
    cols = graph.indices.astype(np.int64)
    new_of_old = None
    if permute:
        from tpu_lanczos.dist.partition import balanced_permutation

        new_of_old = balanced_permutation(graph, 1, n_loc=n_pad)
        rows = new_of_old[rows]
        cols = new_of_old[cols]
    return pack_tiles_from_coo(
        rows, cols, n, n_pad, new_of_old=new_of_old, nnz_true=graph.nnz
    )
