"""Row-sharded CPG: the Pallas SpMV kernel inside shard_map.

The XLA-format sharded path (dist/lanczos.py) is correct everywhere but
gather-slow on real TPUs; this module shards the CPG format instead:

- positions are the usual CPG layout; chunks are split into contiguous
  blocks of ``C_loc = n_chunks / n_shards`` per device, so the flat
  vector's natural P('rows') sharding IS the chunk sharding;
- each device owns the tiles whose DEST chunk it owns (the kernel's
  d-major tile ordering makes those contiguous ranges), ghost-padded to
  a common per-shard tile count;
- per iteration, q is all_gather'd (the halo exchange) and each device
  runs the unmodified CPG kernel over its local tiles — source chunk ids
  are global into the gathered vector;
- virtual-row reduce levels read partial sums at virtual-cell positions
  only, so each reduce level exchanges just the CHUNKS its tiles
  actually source (computed at pack time; round-1 gathered the whole
  accumulator per level, O(n_pad) extra comm per iteration): each shard
  contributes its owned needed chunks (padded to a common count), the
  all_gather'd compact buffer is identical on every shard, and the
  level's source ids are remapped into it.

This replaces the reference's dual-GPU row-partitioned SpMV
(parallel-two-cards/lib/cu_lanczos.cu:62-168) with its per-iteration
broadcast generalized to an N-chip all_gather over ICI.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpu_lanczos.graphs.csr import CSRGraph
from tpu_lanczos.kernels.cpg import (CPGGraph, GROUP_PAD, LANE,
                                     _round_up, pack_cpg)
from tpu_lanczos.kernels import spmv_cpg as _k
from tpu_lanczos.dist.mesh import ROWS
from tpu_lanczos.utils import HostArray


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ShardedCPG:
    """CPG tiles split by dest chunk over an n_shards mesh.

    Level arrays carry a leading shard axis (sharded P(ROWS, ...)); d
    ids and starts are LOCAL to the shard; s ids stay global.

    With ``overlap=True`` (the default pack) the MAIN level is split in
    two: ``levels[0]`` holds each shard's OWN-source tiles (source chunk
    inside the shard's block; s_ids rebased local, reads q_loc only) and
    ``levels[1]`` its CROSS-source tiles (reads the gathered halo/full
    buffer).  The own pass has no data dependency on the collective, so
    XLA's latency-hiding scheduler can run it while the gather is in
    flight — the TPU equivalent of the reference running both cards'
    local SpMVs before the peer transfer
    (parallel-two-cards/lib/cu_lanczos.cu:120-125).
    """

    n: int
    n_shards: int
    n_chunks: int          # global, divisible by n_shards
    nnz: int
    theta: int
    sub: int
    levels: tuple          # per-level dict of stacked jnp arrays
    realmask: jnp.ndarray  # (n_pad,)
    new_of_old: np.ndarray
    # per-level max REAL tiles on any shard (static): the kernel's
    # unroll heuristic must not see the 256-rounded padded count
    t_reals: tuple = ()
    # per-level static bool: compile the mask-dispatching kernel (see
    # kernels/cpg.py CPGGraph.mask_sparse)
    mask_sparse: tuple = ()
    # main level split into (own, cross) passes for comm/compute overlap
    overlap: bool = False

    def tree_flatten(self):
        return (self.levels, self.realmask), (
            self.n, self.n_shards, self.n_chunks, self.nnz, self.theta,
            self.sub, HostArray(self.new_of_old), self.t_reals,
            self.mask_sparse, self.overlap,
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        (n, n_shards, n_chunks, nnz, theta, sub, noo, t_reals,
         mask_sparse, overlap) = aux
        levels, realmask = leaves
        return cls(n=n, n_shards=n_shards, n_chunks=n_chunks, nnz=nnz,
                   theta=theta, sub=sub, levels=levels, realmask=realmask,
                   new_of_old=noo.a, t_reals=t_reals,
                   mask_sparse=mask_sparse, overlap=overlap)

    @property
    def n_main(self) -> int:
        """Number of main-level passes (2 when overlap-split)."""
        return 2 if self.overlap else 1

    @property
    def n_pad(self) -> int:
        return self.n_chunks * self.sub * LANE

    @property
    def c_loc(self) -> int:
        return self.n_chunks // self.n_shards

    def permute_in(self, x: np.ndarray, dtype) -> np.ndarray:
        out = np.zeros(self.n_pad, dtype=dtype)
        out[self.new_of_old] = x
        return out

    def permute_out(self, y: np.ndarray) -> np.ndarray:
        return np.asarray(y).reshape(-1)[self.new_of_old]


def _stack_level(l1, l2, s_loc, run_ids, pair_mask, d_loc_all, tiles,
                 sub, c_loc, n_shards, l2_dtype):
    """Stack per-shard tile subsets into the kernel's (n_shards, ...)
    arrays.  ``tiles[s]`` are GLOBAL tile indices (d-major sorted within
    the shard), ``s_loc[s]`` the already-remapped source ids for shard
    s's subset, ``d_loc_all`` the global per-tile LOCAL dest chunk ids.
    Returns (numpy level dict, t_real)."""
    t_real = max((int(t.size) for t in tiles), default=0)
    # the kernel's batched group DMA may start at the last real tile;
    # keep >= GROUP_PAD ghost tiles past it on EVERY shard (the
    # single-chip _finalize invariant, kernels/cpg.py)
    t_loc = _round_up(max(t_real, 1) + GROUP_PAD, 256)
    l1_3d = l1.reshape(-1, sub, LANE)
    l2_3d = l2.reshape(-1, LANE, sub)
    L1 = np.full((n_shards, t_loc * sub, LANE), LANE - 1, dtype=np.int8)
    L2 = np.zeros((n_shards, t_loc * LANE, sub), dtype=l2_dtype)
    S = np.zeros((n_shards, t_loc), dtype=np.int32)
    R = np.zeros((n_shards, t_loc), dtype=np.int32)
    PM = np.zeros((n_shards, t_loc), dtype=np.int32)
    ST = np.zeros((n_shards, c_loc), dtype=np.int32)
    CT = np.zeros((n_shards, c_loc), dtype=np.int32)
    for s in range(n_shards):
        ti = tiles[s]
        m = int(ti.size)
        if m:
            L1[s, : m * sub] = l1_3d[ti].reshape(m * sub, LANE)
            L2[s, : m * LANE] = l2_3d[ti].reshape(m * LANE, sub)
            S[s, :m] = s_loc[s]
            # renumber run ids to be CONSECUTIVE along this shard's tile
            # list: the kernel assigns the streamed-x VMEM slot as
            # run_ids[t] % (2*U) with two tile groups of source DMAs in
            # flight, so two live runs must never share an id mod 2U — a
            # guarantee only gap-free numbering gives.  The own/cross
            # overlap subsets are non-contiguous in the global pack, so
            # copying the original ids would leave gaps (and a gap of a
            # multiple of 2U inside one dest chunk's window would let a
            # later run's source-chunk DMA overwrite a live slot).
            # Ownership is constant within a run (it depends only on
            # s_id), so runs are never split and change-points survive.
            r = run_ids[ti]
            chg = np.ones(m, np.int64)
            chg[1:] = (r[1:] != r[:-1]).astype(np.int64)
            R[s, :m] = (np.cumsum(chg) - 1).astype(np.int32)
            PM[s, :m] = pair_mask[ti]
        cnt = np.bincount(d_loc_all[ti] if m else np.zeros(0, np.int64),
                          minlength=c_loc).astype(np.int32)
        CT[s] = cnt
        st = np.zeros(c_loc, np.int32)
        st[1:] = np.cumsum(cnt)[:-1].astype(np.int32)
        ST[s] = st
    return dict(l1=L1, l2=L2, s_ids=S, run_ids=R, pair_mask=PM,
                starts=ST, counts=CT), t_real


def pack_cpg_sharded(
    graph: CSRGraph, n_shards: int, mesh: jax.sharding.Mesh | None = None,
    overlap: bool = True, **kw
) -> ShardedCPG:
    """Pack for an ``n_shards`` mesh by splitting a global CPG pack's
    tiles along their (d-major sorted) dest chunks.

    ``overlap=True`` additionally splits the main level's tiles into
    own-source / cross-source passes (see ShardedCPG) so the halo
    collective can overlap the own-chunk SpMV."""
    # the shard splitter assumes levels = [main, reduce...]; source-split
    # broadcast levels (n_bcast > 0) are a single-chip optimization the
    # sharded path doesn't carry -> reject an explicit source-split cap
    # BEFORE paying for the pack (a broadcast level mislabeled as the
    # main level would silently corrupt the SpMV), and force dest-only.
    ts = kw.get("theta_s")
    if ts is not None and ts != "off":
        raise ValueError(
            "sharded CPG packs are dest-only (source-split broadcast "
            "levels are a single-chip optimization); drop the theta_s "
            "override")
    kw["theta_s"] = None
    # the splitter slices l1 by sub rows/tile and treats s_ids as chunk
    # ids — both wrong for the slab layout (LANE rows, slab ids); catch
    # the request BEFORE paying for the pack
    if kw.get("layout") == "slab":
        raise ValueError(
            "sharded CPG supports the classic layout only (layout='slab' "
            "is a single-chip tile shape); drop the layout override")
    # 'auto' may select slab on some graphs — pin classic for the mesh
    kw["layout"] = "classic"
    cg: CPGGraph = pack_cpg(graph, **kw)
    assert cg.n_bcast == 0
    assert cg.layout != "slab"

    sub = cg.sub
    C = _round_up(cg.n_chunks, n_shards)
    c_loc = C // n_shards

    from tpu_lanczos.kernels.cpg import _mask_is_sparse

    def place(lvd):
        lvd = {k: jnp.asarray(v) for k, v in lvd.items()}
        if mesh is not None:
            P = jax.sharding.PartitionSpec
            NS = jax.sharding.NamedSharding
            lvd = {k: jax.device_put(
                v, NS(mesh, P(ROWS, *([None] * (v.ndim - 1))))
            ) for k, v in lvd.items()}
        return lvd

    levels = []
    t_reals = []
    mask_sparse = []
    for lv_i, lv in enumerate(cg.levels):
        d_ids = np.asarray(lv["d_ids"])
        s_ids = np.asarray(lv["s_ids"])
        t_real_lv = int(np.asarray(lv["counts"]).sum())
        run_ids = np.asarray(lv["run_ids"])
        pair_mask = np.asarray(lv["pair_mask"])
        l1 = np.asarray(lv["l1"])
        l2 = np.asarray(lv["l2"])
        starts = np.asarray(lv["starts"])
        counts = np.asarray(lv["counts"])
        # pad value for starts must be the TOTAL tile count (computed from
        # the un-padded arrays): padded dest chunks own an empty range at
        # the end of the tile list.  Padding counts first and then reading
        # counts[-1] (always 0) put padded shard boundaries at the start of
        # the last real chunk, silently zeroing its rows.
        total_tiles = int(counts.sum())
        starts = np.pad(starts, (0, C - starts.size),
                        constant_values=total_tiles)
        counts = np.pad(counts, (0, C - counts.size))
        # per-shard tile ranges over the d-major-sorted tile list
        sh_start = starts[::c_loc][:n_shards]
        sh_end = np.append(sh_start[1:], total_tiles)
        # local dest chunk per (real) tile — subsets keep d-major order,
        # so bincount/cumsum reproduces per-chunk contiguous spans
        d_loc_all = (d_ids % c_loc).astype(np.int64)
        sp_lv = cg.mask_sparse[lv_i] if cg.mask_sparse else True

        if lv_i >= 1:
            # reduce levels read virtual-cell partials only: compute the
            # union of needed source chunks, each shard's owned share
            # (padded to a common m_pad), and the remap of s_ids into the
            # compact gathered buffer (concat of per-shard slabs)
            needed = np.unique(s_ids[:t_real_lv])
            owner = needed // c_loc
            per_owner = np.bincount(np.minimum(owner, n_shards - 1),
                                    minlength=n_shards)
            m_pad = max(int(per_owner.max()), 1)
            sel = np.zeros((n_shards, m_pad), dtype=np.int32)
            remap = np.zeros(C, dtype=np.int32)
            for sh in range(n_shards):
                own = needed[owner == sh]
                sel[sh, : own.size] = (own % c_loc).astype(np.int32)
                remap[own] = sh * m_pad + np.arange(own.size, dtype=np.int32)
            s_rm = remap[s_ids]
            tiles = [np.arange(int(sh_start[sh]), int(sh_end[sh]))
                     for sh in range(n_shards)]
            s_loc = [s_rm[t].astype(np.int32) for t in tiles]
            lvd, t_real = _stack_level(l1, l2, s_loc, run_ids, pair_mask,
                                       d_loc_all, tiles, sub, c_loc,
                                       n_shards, l2.dtype)
            lvd["sel"] = sel  # (n_shards, m_pad)
            levels.append(place(lvd))
            t_reals.append(max(t_real, 1))
            mask_sparse.append(sp_lv)
            continue

        # MAIN level.  When each shard sources few chunks outside its
        # own block (locality-ordered meshes: near-diagonal tiles ->
        # the halo is a couple of boundary chunks), exchange only the
        # union of cross-shard chunks instead of all_gather'ing the
        # whole vector — the europe-scale comm drops ~50x (the
        # ppermute-halo discipline docs/DESIGN.md derives; power-law
        # packs keep the full gather: their cross set is ~all chunks)
        crosses = []
        own_masks = []
        for sh in range(n_shards):
            a, b = int(sh_start[sh]), int(sh_end[sh])
            seg = s_ids[a:b]
            own = (seg >= sh * c_loc) & (seg < (sh + 1) * c_loc)
            own_masks.append(own)
            ns = np.unique(seg[~own])
            crosses.append(ns)
        union_cross = (np.unique(np.concatenate(crosses))
                       if crosses else np.zeros(0, np.int64))
        sel = None
        halo_bufpos = None
        if union_cross.size:
            owner = np.minimum(union_cross // c_loc, n_shards - 1)
            per_owner = np.bincount(owner, minlength=n_shards)
            h_pad = max(int(per_owner.max()), 1)
            # gate on the REAL transfer — n_shards * h_pad padded
            # chunks — not the raw union size: per-owner skew (all
            # boundary chunks in one shard's block) can inflate the
            # compact buffer to the full gather's size while still
            # paying the per-iteration hsel copy
            if n_shards * h_pad * 2 > C:
                sel = halo_bufpos = None
            else:
                sel = np.zeros((n_shards, h_pad), dtype=np.int32)
                halo_bufpos = np.zeros(C, dtype=np.int32)
                for sh in range(n_shards):
                    own = union_cross[owner == sh]
                    sel[sh, : own.size] = (own % c_loc).astype(np.int32)
                    halo_bufpos[own] = (
                        sh * h_pad + np.arange(own.size, dtype=np.int32))

        if overlap and n_shards > 1:
            # split into own-source (reads q_loc, no collective
            # dependency) and cross-source (reads the gathered buffer)
            # passes; each subset stays d-major sorted
            t_own, t_cross, so, sc = [], [], [], []
            for sh in range(n_shards):
                a, b = int(sh_start[sh]), int(sh_end[sh])
                idx = np.arange(a, b)
                seg = s_ids[a:b]
                own = own_masks[sh]
                t_own.append(idx[own])
                so.append((seg[own] - sh * c_loc).astype(np.int32))
                t_cross.append(idx[~own])
                cs = seg[~own]
                sc.append((halo_bufpos[cs] if halo_bufpos is not None
                           else cs).astype(np.int32))
            lv_own, tr_own = _stack_level(l1, l2, so, run_ids, pair_mask,
                                          d_loc_all, t_own, sub, c_loc,
                                          n_shards, l2.dtype)
            lv_cross, tr_cross = _stack_level(l1, l2, sc, run_ids,
                                              pair_mask, d_loc_all,
                                              t_cross, sub, c_loc,
                                              n_shards, l2.dtype)
            if halo_bufpos is not None:
                lv_cross["halo_sel"] = sel  # (n_shards, h_pad)
            levels += [place(lv_own), place(lv_cross)]
            t_reals += [tr_own, tr_cross]

            def _sp(tiles):
                if not sp_lv:
                    return False
                pm = [pair_mask[t] for t in tiles if t.size]
                return _mask_is_sparse(
                    np.concatenate(pm) if pm else np.zeros(0, np.int32),
                    sub, "classic")

            mask_sparse += [_sp(t_own), _sp(t_cross)]
            continue

        # unsplit main level (overlap off, or a 1-shard mesh)
        tiles = [np.arange(int(sh_start[sh]), int(sh_end[sh]))
                 for sh in range(n_shards)]
        s_loc = []
        for sh in range(n_shards):
            seg = s_ids[tiles[sh]]
            if halo_bufpos is not None:
                # shard-local x addressing: own chunk -> its position in
                # q_loc; cross chunk -> c_loc + slot in the halo buffer
                own = own_masks[sh]
                seg = np.where(own, seg - sh * c_loc,
                               c_loc + halo_bufpos[seg])
            s_loc.append(seg.astype(np.int32))
        lvd, t_real = _stack_level(l1, l2, s_loc, run_ids, pair_mask,
                                   d_loc_all, tiles, sub, c_loc,
                                   n_shards, l2.dtype)
        if halo_bufpos is not None:
            lvd["halo_sel"] = sel  # (n_shards, h_pad)
        levels.append(place(lvd))
        t_reals.append(max(t_real, 1))
        mask_sparse.append(sp_lv)

    realmask = cg.realmask
    pad = C * sub * LANE - cg.n_pad
    if pad:
        realmask = jnp.concatenate(
            [realmask, jnp.zeros(pad, realmask.dtype)]
        )
    if mesh is not None:
        # keep the mask sharded alongside the levels, or every jitted
        # call reshards the (n_pad,) vector from device 0
        realmask = jax.device_put(
            realmask,
            jax.sharding.NamedSharding(mesh,
                                       jax.sharding.PartitionSpec(ROWS)),
        )
    return ShardedCPG(
        n=cg.n, n_shards=n_shards, n_chunks=C, nnz=cg.nnz, theta=cg.theta,
        sub=sub, levels=tuple(levels), realmask=realmask,
        new_of_old=cg.new_of_old, t_reals=tuple(t_reals),
        mask_sparse=tuple(mask_sparse),
        overlap=bool(overlap and n_shards > 1),
    )


def _rows_specs(tree):
    """PartitionSpec(ROWS, None, ...) for every leaf — the leading
    shard axis every stacked level array carries."""
    P = jax.sharding.PartitionSpec
    return jax.tree.map(
        lambda v: P(ROWS, *([None] * (v.ndim - 1))), tree)


def _local_spmv(levels_loc, realmask_loc, q_loc, sub, c_loc, interpret,
                t_reals=(), mask_sparse=(), overlap=False):
    """Per-shard SpMV (runs inside shard_map): all_gather the halo, run
    the CPG kernel over this shard's tiles.

    With ``overlap``, the main level runs as two passes: the own-source
    pass reads only q_loc and is emitted AFTER the all_gather is issued
    but carries no data dependency on it — XLA's async collectives can
    then hide the ICI transfer behind the own-chunk compute (SURVEY.md
    §2.3 halo row: "overlapped with local SpMV")."""
    n_sub_loc = c_loc * sub

    def untranspose(yt):
        return yt.reshape(c_loc, LANE, sub).transpose(0, 2, 1).reshape(
            n_sub_loc, LANE
        )

    def run(level, src_full, t_real=None, sp=True):
        lvl = {k: v[0] for k, v in level.items()
               if k not in ("sel", "halo_sel")}
        x2d = src_full.reshape(-1, LANE)
        # vma marks the kernel output device-varying so the shard_map
        # varying-axes checker stays ON for the whole Lanczos body
        yt = _k._run_level(x2d, lvl, c_loc, sub, interpret,
                           vma=frozenset({ROWS}), t_real=t_real,
                           sparse_dispatch=sp)
        return untranspose(yt)

    def t_real(i):
        return t_reals[i] if t_reals else None

    def sp(i):
        return mask_sparse[i] if mask_sparse else True

    def gather_cross(lv):
        """Issue the halo exchange for a level that reads non-local
        source chunks: compact boundary-chunk buffer when the pack
        found one, the full vector otherwise."""
        if "halo_sel" in lv:
            hsel = lv["halo_sel"][0]
            contrib = q_loc.reshape(c_loc, sub * LANE)[hsel].reshape(-1)
            return jax.lax.all_gather(contrib, ROWS, tiled=True)
        return jax.lax.all_gather(q_loc, ROWS, tiled=True)

    if overlap:
        lv_own, lv_cross = levels_loc[0], levels_loc[1]
        cross_empty = bool(t_reals) and t_reals[1] == 0
        own_empty = bool(t_reals) and t_reals[0] == 0
        # 1) issue the collective first (no consumer yet) ...
        gathered = None if cross_empty else gather_cross(lv_cross)
        # 2) ... own-source pass depends only on q_loc: it fills the
        # gather's flight time
        if own_empty:
            y_loc = jnp.zeros(n_sub_loc * LANE, q_loc.dtype)
            y_loc = jax.lax.pcast(y_loc, (ROWS,), to="varying")
        else:
            y_loc = run(lv_own, q_loc, t_real(0), sp(0)).reshape(-1)
        # 3) cross-source pass consumes the gathered buffer
        if not cross_empty:
            y_loc = y_loc + run(lv_cross, gathered,
                                t_real(1), sp(1)).reshape(-1)
        base = 2
    else:
        lv0 = levels_loc[0]
        if "halo_sel" in lv0:
            # mesh-halo main level: exchange only the union of
            # cross-shard boundary chunks; own chunks are read straight
            # from q_loc (addressed past c_loc in the concat)
            halo_full = gather_cross(lv0)
            halo_full = jax.lax.pcast(halo_full, (ROWS,), to="varying")
            y_loc = run(lv0, jnp.concatenate([q_loc, halo_full]),
                        t_real(0), sp(0)).reshape(-1)
        else:
            q_full = jax.lax.all_gather(q_loc, ROWS, tiled=True)
            y_loc = run(lv0, q_full, t_real(0), sp(0)).reshape(-1)
        base = 1
    for lv_i, level in enumerate(levels_loc[base:]):
        # exchange only the chunks this level's tiles source (the
        # virtual-cell partials): each shard contributes its owned
        # needed chunks; s_ids were remapped into the compact layout
        sel = level["sel"][0]  # (m_pad,) local chunk ids
        contrib = y_loc.reshape(c_loc, sub * LANE)[sel].reshape(-1)
        compact_full = jax.lax.all_gather(contrib, ROWS, tiled=True)
        y_loc = y_loc + run(level, compact_full,
                            t_real(lv_i + base), sp(lv_i + base)).reshape(-1)
    return y_loc * realmask_loc.astype(y_loc.dtype)


from functools import partial

from tpu_lanczos.core.lanczos import LanczosState
from tpu_lanczos.dist.mesh import (sharded_alphabeta_body,
                                   sharded_lanczos_body)


@partial(jax.jit, static_argnames=(
    "mesh", "k", "sub", "c_loc", "interpret", "reorthogonalize",
    "t_reals", "mask_sparse", "overlap"))
def _lanczos_cpg_shmap(mesh, levels, realmask, x, k, sub, c_loc,
                       interpret, reorthogonalize, t_reals=(),
                       mask_sparse=(), overlap=False):
    P = jax.sharding.PartitionSpec
    level_specs = _rows_specs(levels)

    def f(levels_loc, realmask_loc, x_loc):
        def local(q):
            return _local_spmv(levels_loc, realmask_loc, q, sub, c_loc,
                               interpret, t_reals, mask_sparse, overlap)

        return sharded_lanczos_body(local, x_loc, k, reorthogonalize)

    return jax.shard_map(
        f,
        mesh=mesh,
        in_specs=(level_specs, P(ROWS), P(ROWS)),
        out_specs=(P(), P(), P(None, ROWS), P()),
        # On hardware the pallas_call is opaque and its out_shape vma
        # annotation (frozenset({ROWS})) lets the varying-axes checker
        # validate the whole Lanczos body.  Interpret mode decomposes the
        # kernel into raw HLO whose internal dynamic_slices mix varying
        # operands with unvarying loop indices, which the checker rejects
        # spuriously — so it is off only there.
        check_vma=not interpret,
    )(levels, realmask, x)


@partial(jax.jit, static_argnames=(
    "mesh", "k", "sub", "c_loc", "interpret", "t_reals", "mask_sparse",
    "overlap"))
def _alphabeta_cpg_shmap(mesh, levels, realmask, x, k, sub, c_loc,
                         interpret, t_reals=(), mask_sparse=(),
                         overlap=False):
    P = jax.sharding.PartitionSpec
    level_specs = _rows_specs(levels)

    def f(levels_loc, realmask_loc, x_loc):
        def local(q):
            return _local_spmv(levels_loc, realmask_loc, q, sub, c_loc,
                               interpret, t_reals, mask_sparse, overlap)

        return sharded_alphabeta_body(local, x_loc, k)

    return jax.shard_map(
        f,
        mesh=mesh,
        in_specs=(level_specs, P(ROWS), P(ROWS)),
        out_specs=(P(), P(), P()),
        check_vma=not interpret,
    )(levels, realmask, x)


@partial(jax.jit, static_argnames=(
    "mesh", "k", "probes", "sub", "c_loc", "interpret", "t_reals",
    "mask_sparse", "overlap"))
def _diag_probes_cpg_shmap(mesh, levels, realmask, mask, key, u_rows,
                           w_defl, shift, k, probes, sub, c_loc,
                           interpret, t_reals=(), mask_sparse=(),
                           overlap=False):
    """One shard_map program running ALL diagonal probes over the CPG
    kernel (see dist.mesh.sharded_diag_probes_body)."""
    from tpu_lanczos.dist.mesh import sharded_diag_probes_body

    P = jax.sharding.PartitionSpec
    level_specs = _rows_specs(levels)

    def f(levels_loc, realmask_loc, mask_loc, key, u_loc, w_defl, shift):
        def local(q):
            return _local_spmv(levels_loc, realmask_loc, q, sub, c_loc,
                               interpret, t_reals, mask_sparse, overlap)

        return sharded_diag_probes_body(local, mask_loc, key, k, probes,
                                        u_loc, w_defl, shift)

    return jax.shard_map(
        f,
        mesh=mesh,
        in_specs=(level_specs, P(ROWS), P(ROWS), P(), P(None, ROWS),
                  P(), P()),
        out_specs=P(ROWS),
        check_vma=not interpret,
    )(levels, realmask, mask, key, u_rows, w_defl, shift)


def diag_probes_cpg_sharded(sg: ShardedCPG, mask, key, k: int,
                            probes: int, mesh, u_rows, w_defl, shift,
                            interpret: bool = False):
    """Fused diagonal-probe accumulator over the row-sharded CPG kernel.
    Returns the (n_pad,) scaled diagonal estimate, sharded over ROWS."""
    return _diag_probes_cpg_shmap(
        mesh, sg.levels, sg.realmask, mask, key, u_rows, w_defl, shift,
        k=k, probes=probes, sub=sg.sub, c_loc=sg.c_loc,
        interpret=interpret, t_reals=sg.t_reals,
        mask_sparse=sg.mask_sparse, overlap=sg.overlap)


@partial(jax.jit, static_argnames=(
    "mesh", "k", "probes", "sub", "c_loc", "interpret", "t_reals",
    "mask_sparse", "overlap"))
def _trace_probes_cpg_shmap(mesh, levels, realmask, mask, key, u_rows,
                            k, probes, sub, c_loc, interpret,
                            t_reals=(), mask_sparse=(), overlap=False):
    """One shard_map program running ALL trace probes over the CPG
    kernel (see dist.mesh.sharded_trace_probes_body)."""
    from tpu_lanczos.dist.mesh import sharded_trace_probes_body

    P = jax.sharding.PartitionSpec
    level_specs = _rows_specs(levels)

    def f(levels_loc, realmask_loc, mask_loc, key, u_loc):
        def local(q):
            return _local_spmv(levels_loc, realmask_loc, q, sub, c_loc,
                               interpret, t_reals, mask_sparse, overlap)

        return sharded_trace_probes_body(local, mask_loc, key, k, probes,
                                         u_loc)

    return jax.shard_map(
        f,
        mesh=mesh,
        in_specs=(level_specs, P(ROWS), P(ROWS), P(), P(None, ROWS)),
        out_specs=(P(), P(), P(), P()),
        check_vma=not interpret,
    )(levels, realmask, mask, key, u_rows)


def trace_probes_cpg_sharded(sg: ShardedCPG, mask, key, k: int,
                             probes: int, mesh, u_rows,
                             interpret: bool = False):
    """Fused trace-probe runner over the row-sharded CPG kernel.
    Returns replicated (alphas, betas, x_norms, coeffs)."""
    return _trace_probes_cpg_shmap(
        mesh, sg.levels, sg.realmask, mask, key, u_rows, k=k,
        probes=probes, sub=sg.sub, c_loc=sg.c_loc, interpret=interpret,
        t_reals=sg.t_reals, mask_sparse=sg.mask_sparse,
        overlap=sg.overlap)


def lanczos_alphabeta_cpg_sharded(sg: ShardedCPG, x: jnp.ndarray, k: int,
                                  mesh: jax.sharding.Mesh,
                                  interpret: bool = False):
    """Pass-1 Q-free Lanczos with the CPG kernel row-sharded over
    ``mesh``: O(n_loc) device memory per shard, no basis stored — the
    production-kernel twin of dist.lanczos.lanczos_alphabeta_sharded
    (and the f32 subset of the df64 _alphabeta_df_shmap structure).

    Returns (alpha, beta, x_norm) replicated; beta is FULL length k
    (slot k-1 = residual norm, which the deflation convergence filter
    needs).  Used by the sharded stochastic estimators so every trace
    probe rides the same kernel the reference ran on every card
    (parallel-two-cards/lib/cu_lanczos.cu:120-122)."""
    return _alphabeta_cpg_shmap(
        mesh, sg.levels, sg.realmask, x, k=k, sub=sg.sub, c_loc=sg.c_loc,
        interpret=interpret, t_reals=sg.t_reals,
        mask_sparse=sg.mask_sparse, overlap=sg.overlap,
    )


def lanczos_cpg_sharded(
    sg: ShardedCPG,
    x: jnp.ndarray,
    k: int,
    mesh: jax.sharding.Mesh,
    reorthogonalize: bool = False,
    interpret: bool = False,
) -> LanczosState:
    """k-step Lanczos with the CPG kernel row-sharded over ``mesh``.
    ``x`` is (n_pad,) in CPG-permuted order."""
    alpha, beta, q_basis, x_norm = _lanczos_cpg_shmap(
        mesh, sg.levels, sg.realmask, x,
        k=k, sub=sg.sub, c_loc=sg.c_loc,
        interpret=interpret, reorthogonalize=reorthogonalize,
        t_reals=sg.t_reals, mask_sparse=sg.mask_sparse,
        overlap=sg.overlap,
    )
    return LanczosState(
        alpha=alpha, beta=beta[: k - 1], q_basis=q_basis, x_norm=x_norm
    )
