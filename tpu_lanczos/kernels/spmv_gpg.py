"""Pallas TPU SpMV kernel over the GPG format (see kernels/gpg.py).

Identical routing chain to the CPG kernel (spmv_cpg.py) — lane-gather ->
transpose -> slab-gathered second stage, one grid step per dest chunk,
in-kernel fori_loop over tiles with hand-rolled double-buffered DMA —
but the staging buffer (sub_s, 128) is assembled from ``n_slots``
granule windows of (g_s, 128) DMA'd from anywhere in x, instead of one
contiguous source chunk.  That decoupling is what buys expander graphs
3-6x the fill (docs/DESIGN.md round-2 notes).

x always streams from HBM (the granule DMAs are the stream); no
resident-x variant is needed because residency no longer helps: every
tile's sources are scattered by design.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_lanczos.kernels.gpg import GPGGraph, LANE


def _pick_unroll(avg_tiles_per_chunk: float, sub_s: int, sub_d: int) -> int:
    """Independent tile chains per loop iteration (VPU ILP), capped so the
    double-buffered scratch stays well inside VMEM."""
    if avg_tiles_per_chunk >= 24:
        u = 8
    elif avg_tiles_per_chunk >= 6:
        u = 4
    elif avg_tiles_per_chunk >= 2:
        u = 2
    else:
        u = 1
    per_slot = sub_s * LANE * (1 + 4) + LANE * sub_d  # l1+xs (f32) + l2 bytes
    u_vmem = max((7 * 1024 * 1024) // (2 * per_slot), 1)
    while u > u_vmem:
        u //= 2
    return max(u, 1)


def _make_kernel(g_s: int, sub_s: int, sub_d: int, U: int):
    n_slots = sub_s // g_s
    n_slab_s = sub_s // LANE
    n_slab_d = sub_d // LANE
    n_buf = 2 * U

    def _kernel(starts, counts, g_ids, l1_hbm, l2_hbm, x_ref,
                o_ref, l1_buf, l2_buf, xs_buf, sems):
        d = pl.program_id(0)
        start = starts[d]
        count = counts[d]

        def clamp(i):
            # tile arrays are ghost-padded past every level: a clamped
            # duplicate read is always safe (masked out of the sum)
            return start + jnp.minimum(i, jnp.maximum(count - 1, 0))

        def dmas(slot, i):
            t = clamp(i)
            copies = [
                pltpu.make_async_copy(
                    l1_hbm.at[pl.ds(t * sub_s, sub_s), :], l1_buf.at[slot],
                    sems.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    l2_hbm.at[pl.ds(t * LANE, LANE), :], l2_buf.at[slot],
                    sems.at[slot, 1],
                ),
            ]
            for s in range(n_slots):
                g = g_ids[t * n_slots + s]
                copies.append(pltpu.make_async_copy(
                    x_ref.at[pl.ds(g * g_s, g_s), :],
                    xs_buf.at[slot, pl.ds(s * g_s, g_s), :],
                    sems.at[slot, 2 + s],
                ))
            return copies

        def start_group(grp):
            base = grp * U
            for u in range(U):
                slot = (base + u) % n_buf
                for c in dmas(slot, base + u):
                    c.start()

        @pl.when(count > 0)
        def _():
            start_group(0)

        def chain(slot):
            """One tile's routing chain."""
            xs = xs_buf[slot]                                  # (sub_s, 128)
            g1 = jnp.take_along_axis(
                xs, l1_buf[slot].astype(jnp.int32), axis=1
            )
            g2 = g1.T                                          # (128, sub_s)
            l2 = l2_buf[slot].astype(jnp.int32)                # (128, sub_d)
            if n_slab_s == 1 and n_slab_d == 1:
                return jnp.take_along_axis(g2, l2, axis=1)
            slabs = []
            for j in range(n_slab_d):
                idx = l2[:, j * LANE:(j + 1) * LANE]
                res = jnp.zeros((LANE, LANE), x_ref.dtype)
                for si in range(n_slab_s):
                    sl_idx = jnp.clip(idx - si * LANE, 0, LANE - 1)
                    part = jnp.take_along_axis(
                        g2[:, si * LANE:(si + 1) * LANE], sl_idx, axis=1
                    )
                    res = jnp.where(
                        (idx >= si * LANE) & (idx < (si + 1) * LANE),
                        part, res,
                    )
                slabs.append(res)
            return jnp.concatenate(slabs, axis=1)              # (128, sub_d)

        n_groups = (count + (U - 1)) // U

        def body(grp, acc):
            @pl.when(grp + 1 < n_groups)
            def _():
                start_group(grp + 1)

            base = grp * U
            for u in range(U):
                slot = (base + u) % n_buf
                for c in dmas(slot, base + u):
                    c.wait()
            for u in range(U):
                i = base + u
                slot = (base + u) % n_buf
                g3 = chain(slot)
                if U > 1:
                    g3 = jnp.where(i < count, g3, jnp.zeros_like(g3))
                acc = acc + g3
            return acc

        o_ref[:] = jax.lax.fori_loop(
            0, n_groups, body, jnp.zeros((LANE, sub_d), x_ref.dtype)
        )

    return _kernel


def _run_level(x2d, level, n_chunks, g_s, sub_s, sub_d, interpret):
    U = _pick_unroll(
        level["d_ids"].shape[0] / max(n_chunks, 1), sub_s, sub_d
    )
    n_slots = sub_s // g_s
    return pl.pallas_call(
        _make_kernel(g_s, sub_s, sub_d, U),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # starts, counts, g_ids (flat)
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # l1 stays in HBM
                pl.BlockSpec(memory_space=pl.ANY),  # l2 stays in HBM
                pl.BlockSpec(memory_space=pl.ANY),  # x streams per granule
            ],
            out_specs=pl.BlockSpec(
                (LANE, sub_d), lambda d, *_: (d, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((2 * U, sub_s, LANE), jnp.int8),
                pltpu.VMEM((2 * U, LANE, sub_d), jnp.uint8),
                pltpu.VMEM((2 * U, sub_s, LANE), x2d.dtype),
                pltpu.SemaphoreType.DMA((2 * U, 2 + n_slots)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_chunks * LANE, sub_d), x2d.dtype),
        interpret=interpret,
    )(
        level["starts"], level["counts"], level["g_ids"],
        level["l1"], level["l2"], x2d,
    )


@partial(jax.jit, static_argnames=("interpret",))
def spmv_gpg(gg: GPGGraph, x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """y = A @ x; x is (n_pad,) in GPG-permuted order, lane-127 slots zero."""
    C = gg.n_chunks
    g_s, sub_s, sub_d = gg.g_s, gg.sub_s, gg.sub_d
    n_sub = gg.n_sub
    x2d = x.reshape(n_sub, LANE)

    def untranspose(yt):
        # (C*128, sub_d) stacked (ld, rd) blocks -> (n_sub, 128) layout
        return yt.reshape(C, LANE, sub_d).transpose(0, 2, 1).reshape(n_sub, LANE)

    yt = _run_level(x2d, gg.levels[0], C, g_s, sub_s, sub_d, interpret)
    y2d = untranspose(yt)
    for level in gg.levels[1:]:
        yt = _run_level(y2d, level, C, g_s, sub_s, sub_d, interpret)
        y2d = y2d + untranspose(yt)
    return y2d.reshape(-1) * gg.realmask.astype(x.dtype)


def available_for(graph) -> bool:
    try:
        import jax

        if jax.default_backend() in ("cpu", "gpu"):
            return False
    except Exception:
        return False
    return graph.n <= 80_000_000


def pack(graph):
    from tpu_lanczos.kernels.gpg import pack_gpg

    return pack_gpg(graph)
