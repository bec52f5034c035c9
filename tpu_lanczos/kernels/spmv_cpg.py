"""Pallas TPU SpMV kernel over the CPG format (see kernels/cpg.py).

Microbenchmark-driven structure (all numbers measured on v5e via the
axon tunnel; full tables in docs/DESIGN.md):

- anything data-dependent at GRID granularity stalls ~1-1.5us/step
  (scalar-prefetch-indexed BlockSpec windows force conservative flushes);
- inside a kernel, `lax.fori_loop` + dynamic VMEM slices cost ~nothing
  (72 cyc per 16K-element slice-add);
- the routing chain lane-gather -> transpose -> lane-gather runs at
  ~400-700 cyc per (128,128)-cell tile.

Hence: ONE grid step per dest chunk (output window is a pure grid-index
BlockSpec -> exactly one flush per chunk), and an in-kernel fori_loop
over that chunk's tiles, double-buffering the int8/uint8 index tiles
from HBM by hand (pltpu.make_async_copy), with x fully VMEM resident and
sliced dynamically per tile.

Chunk height ``sub`` may exceed 128 (denser blocks -> fewer tiles); the
second gather's reach is still one 128-lane vreg, so it runs as
(sub/128)^2 slab-gathers combined with range selects.

Round 3: the second gather is occupancy-masked.  Each tile carries a
pair_mask (kernels/cpg.py) whose unset (dest-slab, staging-slab) bits
mark units holding only ghost cells (structural zeros); the kernel
dispatches once per tile on mask == FULL — the dense path is the exact
branch-free original (a taken in-kernel lax.cond costs ~52 cyc, so
per-unit branching LOSES on mostly-occupied tiles), the sparse path
conds per unit where skipping nets out (deep tiers, reduce levels).
Levels with no sparse tile compile without the dispatch at all
(CPGGraph.mask_sparse, static).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_lanczos.kernels.cpg import CPGGraph, LANE


_N_PIPE = 4  # index-group DMA pipeline depth


def _pick_unroll(avg_tiles_per_chunk: float, idx_bytes: int,
                 xs_bytes: int, resident_x: bool) -> int:
    """Tiles per loop iteration (one batched l1+l2 DMA per group of U
    consecutive tiles — the dominant per-tile cost is DMA issue
    overhead, ~0.7us/tile when issued per tile — plus independent
    chains for VPU ILP).  High unroll only pays when chunks carry many
    tiles; with few tiles the clamped-duplicate padding would dominate
    (mesh graphs).  Capped so the two U-tile group buffers plus the xs
    run slots stay inside ~16MB VMEM."""
    if avg_tiles_per_chunk >= 96:
        u = _U_MAX
    elif avg_tiles_per_chunk >= 24:
        u = 8
    elif avg_tiles_per_chunk >= 6:
        u = 4
    else:
        u = 1
    budget = 7 * 1024 * 1024 if not resident_x else 6_800_000
    u_vmem = max(budget // (_N_PIPE * idx_bytes + 2 * xs_bytes), 1)
    while u > u_vmem:
        u //= 2
    return max(u, 1)


# _finalize pads every level's tile arrays by at least this many ghost
# tiles so a group DMA starting at the last real tile never reads past
# the arrays; enforced against kernels/cpg.py GROUP_PAD below
_U_MAX = 16

from tpu_lanczos.kernels.cpg import GROUP_PAD as _GROUP_PAD  # noqa: E402

# the dma_idx clamp t0 = min(start + g*U, t_total - U) is only safe when
# every pack keeps >= U ghost tiles past its real ones
assert _U_MAX <= _GROUP_PAD, (_U_MAX, _GROUP_PAD)


def _make_kernel(sub: int, resident_x: bool, U: int, n_pipe: int,
                 t_total: int, compensated: bool = False,
                 slab: bool = False, sparse_dispatch: bool = True):
    n_slab = sub // LANE
    # slab layout: each tile reads one (128, 128) source slab (s_ids are
    # global slab ids); l2's high bit flags ghost dest cells
    rows = LANE if slab else sub
    # n_pipe index-group copies stay in flight (the kernel is DMA-
    # throughput bound: 2-deep buffering measured only ~90-100 GB/s of
    # HBM); the x-chunk run stream keeps its own 2-group-deep window
    n_buf = 2 * U  # xs run slots

    def _kernel(starts, counts, s_ids, run_ids, pair_mask, l1_hbm, l2_hbm,
                x_ref, o_ref, *rest):
        if compensated:
            e_ref, l1_buf, l2_buf, xs_buf, sems_idx, sems_xs = rest
        else:
            l1_buf, l2_buf, xs_buf, sems_idx, sems_xs = rest
        d = pl.program_id(0)
        start = starts[d]
        count = counts[d]

        def clamp(i):
            # tile arrays are ghost-padded past every level, so a clamped
            # duplicate read is always safe
            return start + jnp.minimum(i, jnp.maximum(count - 1, 0))

        def is_new_run(i):
            # consecutive tiles of one (D,S) block share their source
            # chunk; only the run's first tile DMAs it.  The first tile of
            # a grid step is always a new run (runs never span D chunks).
            t = clamp(i)
            return jnp.logical_or(i == 0, run_ids[t] != run_ids[t - 1])

        def dma_idx(g):
            # ONE batched copy per group for each index array: tiles are
            # consecutive in HBM (d-major sort); prefetch windows past
            # the level's tiles clamp to the (ghost-padded) array end
            gslot = jnp.asarray(g, jnp.int32) % n_pipe
            t0 = jnp.minimum(start + g * U, t_total - U)
            return [
                pltpu.make_async_copy(
                    l1_hbm.at[pl.ds(t0 * rows, U * rows), :],
                    l1_buf.at[gslot], sems_idx.at[gslot, 0],
                ),
                pltpu.make_async_copy(
                    l2_hbm.at[pl.ds(t0 * LANE, U * LANE), :],
                    l2_buf.at[gslot], sems_idx.at[gslot, 1],
                ),
            ]

        def dma_xs(slot, i):
            t = clamp(i)
            s = s_ids[t]
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(s * rows, rows), :], xs_buf.at[slot],
                sems_xs.at[slot],
            )

        def xs_slot(i):
            return jax.lax.rem(run_ids[clamp(i)], jnp.asarray(n_buf, jnp.int32))

        def start_idx(g):
            for c in dma_idx(g):
                c.start()

        def start_xs(g):
            base = g * U
            for u in range(U):
                i = base + u
                @pl.when(jnp.logical_and(i < count, is_new_run(i)))
                def _():
                    dma_xs(xs_slot(i), i).start()

        n_groups = (count + (U - 1)) // U
        # fill the index pipeline n_pipe - 1 deep; xs stays 1 group deep
        for g0 in range(n_pipe - 1):
            @pl.when(g0 < n_groups)
            def _(g0=g0):
                start_idx(g0)
        @pl.when(count > 0)
        def _():
            if not resident_x:
                start_xs(0)

        def chain(gslot, u, i):
            """One tile's routing chain; ghost/duplicate tiles are zeroed
            by the caller's mask."""
            if resident_x:
                s = s_ids[clamp(i)]
                xs = x_ref[pl.ds(s * rows, rows), :]
            else:
                xs = xs_buf[xs_slot(i)]
            m = pair_mask[clamp(i)]
            zero = jnp.zeros((LANE, LANE), x_ref.dtype)
            l1 = l1_buf[gslot, u * rows:(u + 1) * rows]
            g1 = jnp.take_along_axis(xs, l1.astype(jnp.int32), axis=1)
            g2 = g1.T  # (128, rows)
            l2 = l2_buf[gslot, u * LANE:(u + 1) * LANE].astype(jnp.int32)
            if slab:
                # one (128,128) source slab per tile: per output slab,
                # gather on the low 7 bits and mask ghost cells (bit 7);
                # output slabs with no real entries (pair_mask bit j
                # unset) are all-ghost -> skip to zero
                slabs = []
                for j in range(n_slab):
                    idx = l2[:, j * LANE:(j + 1) * LANE]

                    def deliver(idx=idx):
                        part = jnp.take_along_axis(
                            g2, idx & (LANE - 1), axis=1)
                        return jnp.where(idx < LANE, part, zero)

                    if sparse_dispatch:
                        slabs.append(jax.lax.cond(
                            (m >> j) & 1, deliver, lambda: zero))
                    else:
                        slabs.append(deliver())
                if n_slab == 1:
                    return slabs[0]
                return jnp.concatenate(slabs, axis=1)  # (128, sub)
            if n_slab == 1:
                return jnp.take_along_axis(g2, l2, axis=1)

            def unit_gather(idx, si, q, r, res):
                # slab id + in-slab offset: the offset equals idx - si*128
                # exactly where slab si is selected, so one shared gather
                # index and one equality test per source slab suffice
                part = jnp.take_along_axis(
                    g2[:, si * LANE:(si + 1) * LANE], r, axis=1
                )
                return jnp.where(q == si, part, res)

            def dense():
                # unconditional all-units path: empty units only select
                # ghost zeros, so running them is always correct, and a
                # taken lax.cond costs ~50 cyc (measured bn1M) — for
                # mostly-occupied tiles branches lose, so the pack
                # forces their mask to FULL and they dispatch here
                slabs = []
                for j in range(n_slab):
                    idx = l2[:, j * LANE:(j + 1) * LANE]
                    q = idx >> 7
                    r = idx & (LANE - 1)
                    res = zero
                    for si in range(n_slab):
                        res = unit_gather(idx, si, q, r, res)
                    slabs.append(res)
                return jnp.concatenate(slabs, axis=1)

            # all-dense levels (and masks past int32 capacity) compile
            # the branch-free path with no per-tile dispatch at all
            if not sparse_dispatch or n_slab * n_slab > 30:
                return dense()

            def sparse():
                # per-unit skip path: only tiles whose occupancy is low
                # enough that skipped gathers outweigh branch cost keep
                # their true mask (see cpg._densify_mask)
                full = (1 << n_slab) - 1
                slabs = []
                for j in range(n_slab):  # output slabs along rd
                    idx = l2[:, j * LANE:(j + 1) * LANE]
                    jm = (m >> (j * n_slab)) & full

                    def deliver(idx=idx, jm=jm):
                        q = idx >> 7
                        r = idx & (LANE - 1)
                        res = zero
                        for si in range(n_slab):
                            def unit(res=res, q=q, r=r, si=si, idx=idx):
                                return unit_gather(idx, si, q, r, res)

                            res = jax.lax.cond(
                                (jm >> si) & 1, unit, lambda res=res: res)
                        return res

                    # whole output slab empty -> skip the q/r ops too
                    slabs.append(jax.lax.cond(jm != 0, deliver,
                                              lambda: zero))
                return jnp.concatenate(slabs, axis=1)  # (128, sub)

            return jax.lax.cond(m == (1 << (n_slab * n_slab)) - 1,
                                dense, sparse)

        def body(g, carry):
            acc, err = carry
            @pl.when(g + n_pipe - 1 < n_groups)
            def _():
                start_idx(g + n_pipe - 1)
            if not resident_x:
                @pl.when(g + 1 < n_groups)
                def _():
                    start_xs(g + 1)

            base = g * U
            for c in dma_idx(g):
                c.wait()
            if not resident_x:
                for u in range(U):
                    i = base + u
                    @pl.when(jnp.logical_and(i < count, is_new_run(i)))
                    def _():
                        dma_xs(xs_slot(i), i).wait()
            gslot = jnp.asarray(g, jnp.int32) % n_pipe
            for u in range(U):
                i = base + u
                g3 = chain(gslot, u, i)
                if U > 1:
                    g3 = jnp.where(i < count, g3, jnp.zeros_like(g3))
                if compensated:
                    # Knuth two-sum: acc + g3 = s + e exactly; the error
                    # stream accumulates separately (second-order rounding)
                    s = acc + g3
                    z = s - acc
                    err = err + ((acc - (s - z)) + (g3 - z))
                    acc = s
                else:
                    acc = acc + g3
            return acc, err

        zero = jnp.zeros((LANE, sub), x_ref.dtype)
        acc, err = jax.lax.fori_loop(0, n_groups, body, (zero, zero))
        o_ref[:] = acc
        if compensated:
            e_ref[:] = err

    return _kernel


# x stays fully VMEM-resident below this size; beyond it, source chunks
# stream through a third double-buffered DMA lane from HBM
_RESIDENT_X_LIMIT = 8 * 1024 * 1024


def _run_level(x2d, level, n_chunks, sub, interpret, compensated=False,
               vma=None, slab=False, t_real=None, sparse_dispatch=True):
    resident_x = x2d.size * x2d.dtype.itemsize <= _RESIDENT_X_LIMIT
    l2_dtype = level["l2"].dtype
    rows = LANE if slab else sub
    idx_bytes = rows * LANE + LANE * sub * l2_dtype.itemsize
    xs_bytes = 0 if resident_x else rows * LANE * x2d.dtype.itemsize
    # the tile arrays are bucket-padded for compile caching; the unroll
    # choice must see the REAL tiles-per-chunk or sparse levels (meshes,
    # reduce levels) get clamped-duplicate-dominated groups
    t_for_u = t_real if t_real is not None else level["s_ids"].shape[0]
    U = _pick_unroll(
        t_for_u / max(n_chunks, 1), idx_bytes, xs_bytes,
        resident_x,
    )
    out_block = pl.BlockSpec(
        (LANE, sub), lambda d, *_: (d, 0), memory_space=pltpu.VMEM
    )
    # vma: varying-mesh-axes annotation when called inside a shard_map
    # with the checker on (dist/cpg_sharded.py)
    out_sds = jax.ShapeDtypeStruct((n_chunks * LANE, sub), x2d.dtype,
                                   vma=vma)
    return pl.pallas_call(
        _make_kernel(sub, resident_x, U, _N_PIPE,
                     int(level["s_ids"].shape[0]),
                     compensated=compensated, slab=slab,
                     sparse_dispatch=sparse_dispatch),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            # starts, counts, s_ids, run_ids, pair_mask
            num_scalar_prefetch=5,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # l1 stays in HBM
                pl.BlockSpec(memory_space=pl.ANY),  # l2 stays in HBM
                pl.BlockSpec(
                    memory_space=pltpu.VMEM if resident_x else pl.ANY
                ),
            ],
            out_specs=(out_block, out_block) if compensated else out_block,
            scratch_shapes=[
                pltpu.VMEM((_N_PIPE, U * rows, LANE), jnp.int8),
                pltpu.VMEM((_N_PIPE, U * LANE, sub), l2_dtype),
                # dead when x is resident: keep a dummy so VMEM budget
                # is spent on the index pipeline instead
                pltpu.VMEM(
                    (2 * U, rows, LANE) if not resident_x else (1, 1, 1),
                    x2d.dtype),
                pltpu.SemaphoreType.DMA((_N_PIPE, 2)),
                pltpu.SemaphoreType.DMA((2 * U,)),
            ],
        ),
        out_shape=(out_sds, out_sds) if compensated else out_sds,
        interpret=interpret,
    )(
        level["starts"], level["counts"], level["s_ids"], level["run_ids"],
        level["pair_mask"], level["l1"], level["l2"], x2d,
    )


@partial(jax.jit, static_argnames=("interpret",))
def spmv_cpg(cg: CPGGraph, x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """y = A @ x; x is (n_pad,) in CPG-permuted order, lane-127 slots zero."""
    C = cg.n_chunks
    sub = cg.sub
    n_sub = cg.n_sub
    slab = cg.layout == "slab"
    x2d = x.reshape(n_sub, LANE)

    def untranspose(yt):
        # (C*128, sub) stacked (ld, rd) blocks -> (n_sub, 128) y2d layout
        return yt.reshape(C, LANE, sub).transpose(0, 2, 1).reshape(n_sub, LANE)

    nb = cg.n_bcast

    def t_real(i):
        return cg.t_reals[i] if cg.t_reals else None

    def sp(i):
        return cg.mask_sparse[i] if cg.mask_sparse else True

    for i, level in enumerate(cg.levels[:nb]):
        # broadcast pass: copy split-source parents' x values into their
        # copy slots (exact: copy slots are zero in x, one entry per cell)
        x2d = x2d + untranspose(
            _run_level(x2d, level, C, sub, interpret, slab=slab,
                       t_real=t_real(i), sparse_dispatch=sp(i))
        )
    yt = _run_level(x2d, cg.levels[nb], C, sub, interpret, slab=slab,
                    t_real=t_real(nb), sparse_dispatch=sp(nb))
    y2d = untranspose(yt)
    for i, level in enumerate(cg.levels[nb + 1:]):
        yt = _run_level(y2d, level, C, sub, interpret, slab=slab,
                        t_real=t_real(nb + 1 + i),
                        sparse_dispatch=sp(nb + 1 + i))
        y2d = y2d + untranspose(yt)
    y = y2d.reshape(-1) * cg.realmask.astype(x.dtype)
    return y


@partial(jax.jit, static_argnames=("interpret",))
def spmv_cpg_df(cg: CPGGraph, x_hi: jnp.ndarray, x_lo: jnp.ndarray,
                interpret: bool = False):
    """Double-word SpMV: y = A @ (x_hi + x_lo) as a (hi, lo) f32 pair.

    The routing chain moves values exactly (no arithmetic); the only
    rounding in the plain kernel is the per-tile accumulation, which the
    ``compensated`` kernel variant two-sums, emitting an error stream.
    The lo input rides the plain kernel (its own rounding is ~2^-48
    relative to y).  Reduce levels fold partial (hi, err) pairs with an
    elementwise two-sum outside the kernel.  See core/df64.py."""
    from tpu_lanczos.core.df64 import two_sum

    C = cg.n_chunks
    sub = cg.sub
    n_sub = cg.n_sub
    slab = cg.layout == "slab"
    hi2d = x_hi.reshape(n_sub, LANE)
    lo2d = x_lo.reshape(n_sub, LANE)

    def untranspose(yt):
        return yt.reshape(C, LANE, sub).transpose(0, 2, 1).reshape(n_sub, LANE)

    nb = cg.n_bcast

    def t_real(i):
        return cg.t_reals[i] if cg.t_reals else None

    def sp(i):
        return cg.mask_sparse[i] if cg.mask_sparse else True

    for i, level in enumerate(cg.levels[:nb]):
        # broadcast pass moves values exactly (one entry per dest cell,
        # all other contributions are structural zeros) -> plain kernel
        # on hi and lo separately introduces no rounding
        hi2d = hi2d + untranspose(
            _run_level(hi2d, level, C, sub, interpret, slab=slab,
                       t_real=t_real(i), sparse_dispatch=sp(i))
        )
        lo2d = lo2d + untranspose(
            _run_level(lo2d, level, C, sub, interpret, slab=slab,
                       t_real=t_real(i), sparse_dispatch=sp(i))
        )
    yt, et = _run_level(hi2d, cg.levels[nb], C, sub, interpret,
                        compensated=True, slab=slab, t_real=t_real(nb),
                        sparse_dispatch=sp(nb))
    lt = _run_level(lo2d, cg.levels[nb], C, sub, interpret, slab=slab,
                    t_real=t_real(nb), sparse_dispatch=sp(nb))
    y2d = untranspose(yt)
    e2d = untranspose(et) + untranspose(lt)
    for i, level in enumerate(cg.levels[nb + 1:]):
        yt, et = _run_level(y2d, level, C, sub, interpret,
                            compensated=True, slab=slab,
                            t_real=t_real(nb + 1 + i),
                            sparse_dispatch=sp(nb + 1 + i))
        lt = _run_level(e2d, level, C, sub, interpret, slab=slab,
                        t_real=t_real(nb + 1 + i),
                        sparse_dispatch=sp(nb + 1 + i))
        y2d, t = two_sum(y2d, untranspose(yt))
        e2d = e2d + t + untranspose(et) + untranspose(lt)
    # two_sum (not fast_two_sum): after cancellation in the hi stream a
    # row's |e2d| can exceed |y2d|, where the fast variant is inexact
    hi, lo = two_sum(y2d.reshape(-1), e2d.reshape(-1))
    mask = cg.realmask.astype(x_hi.dtype)  # exact 0/1 multiply
    return hi * mask, lo * mask


def available_for(graph) -> bool:
    """The HBM-streamed-x variant lifts the VMEM bound; the remaining
    limits are HBM capacity for the index tiles and host pack time."""
    if jax.default_backend() in ("cpu", "gpu"):
        return False
    return graph.n <= 80_000_000


def pack(graph):
    from tpu_lanczos.kernels.cpg import pack_cpg

    return pack_cpg(graph)
