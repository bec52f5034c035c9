"""Measure the MXU dense-block route for the SpMV hybrid experiment.

Round-3 verdict asked for one measurement: can (128,128) 0/1 adjacency
blocks beat the 496+ cyc/tile gather-chain fabric when routed as MXU
matmuls?  The open hardware questions this probe answers:

  1. cyc/block of a chained ``acc += x_row @ A_block`` where A blocks
     stream from HBM (bf16, 32 KB each) under the same double-buffered
     DMA discipline as the production kernel — the matvec shape is
     (m, 128) @ (128, 128) with m << 128, so the MXU runs at 1/16-1/128
     of its matmul throughput and the real cost is weight-load bound,
     not FLOP bound.  DESIGN.md's 206 cyc figure was measured for a
     full (128,128,128) matmul; a matvec may cost the same (weight
     load dominates) or less — nobody measured it.
  2. whether the hi/lo split (two matmuls against bf16(x) and
     bf16(x - hi), exact for 0/1 A) doubles that cost or pipelines.
  3. the DMA floor: 32 KB/block at ~850 B/cyc is ~38 cyc — confirm the
     matmul hides it.

Economics if cyc/block comes back ~206-412: a ba-4M-class block at 5%
fill carries ~820 entries -> 0.25-0.5 cyc/entry vs the measured 0.65
cyc/entry gather floor (DESIGN.md round-2).  If it comes back >=900
(weight load not amortizable at m=8), the hybrid is dead on arrival
and the negative gets recorded with these numbers.

Run: ``python -m tpu_lanczos.eval.mxu_probe [--blocks 16384]``
(interpret-mode self-check first, then hardware timing).
Prints one JSON line per variant.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_N_PIPE = 2


def _make_kernel(U: int, n_groups: int, m_rows: int, variant: str):
    """One grid step loops all B = n_groups*U blocks: group-DMA U blocks
    (U*128 rows of bf16) n_pipe deep, then per block accumulate either a
    cheap touch (dma baseline) or x_row @ A on the MXU."""

    def _kernel(a_hbm, xh_ref, xl_ref, o_ref, a_buf, sems):
        def start(g):
            slot = jnp.asarray(g, jnp.int32) % _N_PIPE
            pltpu.make_async_copy(
                a_hbm.at[pl.ds(g * (U * LANE), U * LANE), :],
                a_buf.at[slot], sems.at[slot],
            ).start()

        for g0 in range(_N_PIPE - 1):
            if g0 < n_groups:
                start(g0)

        def body(g, acc):
            slot = jnp.asarray(g, jnp.int32) % _N_PIPE
            pltpu.make_async_copy(
                a_hbm.at[pl.ds(g * (U * LANE), U * LANE), :],
                a_buf.at[slot], sems.at[slot],
            ).wait()

            @pl.when(g + (_N_PIPE - 1) < n_groups)
            def _():
                start(g + (_N_PIPE - 1))

            for u in range(U):
                a_blk = a_buf[slot, u * LANE:(u + 1) * LANE, :]
                if variant == "dma":
                    # touch one vreg row-band so the copy can't be elided
                    acc += a_blk[:m_rows, :].astype(jnp.float32)
                elif variant == "mxu1":
                    acc += jnp.dot(xh_ref[:m_rows, :], a_blk,
                                   preferred_element_type=jnp.float32)
                elif variant == "mxu2":
                    acc += jnp.dot(xh_ref[:m_rows, :], a_blk,
                                   preferred_element_type=jnp.float32)
                    acc += jnp.dot(xl_ref[:m_rows, :], a_blk,
                                   preferred_element_type=jnp.float32)
                else:
                    raise ValueError(variant)
            return acc

        acc = jnp.zeros((m_rows, LANE), jnp.float32)
        acc = jax.lax.fori_loop(0, n_groups, body, acc)
        o_ref[:m_rows, :] = acc

    return _kernel


@functools.partial(jax.jit,
                   static_argnames=("u", "n_groups", "m_rows", "variant",
                                    "interpret"))
def _run(a, xh, xl, u, n_groups, m_rows, variant, interpret=False):
    return pl.pallas_call(
        _make_kernel(u, n_groups, m_rows, variant),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),     # A blocks stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x hi row
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x lo row
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((max(8, m_rows), LANE),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_N_PIPE, u * LANE, LANE), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((_N_PIPE,)),
        ],
        interpret=interpret,
    )(a, xh, xl)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=16384)
    ap.add_argument("--u", type=int, default=4)
    ap.add_argument("--m-rows", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--interpret-only", action="store_true")
    args = ap.parse_args(argv)

    rng = np.random.default_rng(7)
    B = args.blocks
    n_groups = B // args.u
    B = n_groups * args.u

    # 0/1 blocks at ~5% fill (the ba-4M regime), exact in bf16
    a_np = (rng.random((B * LANE, LANE)) < 0.05).astype(np.float32)
    x_np = rng.standard_normal(LANE).astype(np.float32)
    import ml_dtypes
    bf16 = ml_dtypes.bfloat16
    xh_np = x_np.astype(bf16)
    xl_np = (x_np - xh_np.astype(np.float32)).astype(bf16)
    mr = max(8, args.m_rows)
    xh = jnp.broadcast_to(jnp.asarray(xh_np), (mr, LANE))
    xl = jnp.broadcast_to(jnp.asarray(xl_np), (mr, LANE))

    # interpret-mode self-check on a small slice (CPU, no tunnel risk)
    Bs = 8
    a_s = jnp.asarray(a_np[: Bs * LANE].astype(bf16))
    out = _run(a_s, xh, xl, 2, Bs // 2, args.m_rows, "mxu2",
               interpret=True)
    want = np.zeros(LANE, np.float64)
    for b in range(Bs):
        blk = a_np[b * LANE:(b + 1) * LANE]
        want += (xh_np.astype(np.float64) @ blk
                 + xl_np.astype(np.float64) @ blk)
    err = float(np.max(np.abs(np.asarray(out[0], np.float64) - want)
                       / (np.abs(want) + 1e-30)))
    print(f"interpret self-check rel err {err:.2e}", file=sys.stderr)
    assert err < 1e-5, err
    if args.interpret_only:
        return 0

    a = jnp.asarray(a_np.astype(bf16))
    del a_np
    ghz = 0.94
    for variant in ("dma", "mxu1", "mxu2"):
        f = lambda: jax.block_until_ready(
            _run(a, xh, xl, args.u, n_groups, args.m_rows, variant))
        f()  # compile
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            f()
            ts.append(time.time() - t0)
        wall = float(np.median(ts))
        cyc = wall * ghz * 1e9 / B
        print(json.dumps(dict(
            study="mxu_block_probe", variant=variant, blocks=B,
            u=args.u, m_rows=args.m_rows, wall_s=round(wall, 4),
            cyc_per_block=round(cyc, 1),
            note="streamed bf16 (128,128) block + x_row matvec chain; "
                 "dma = copy-only baseline; mxu2 = hi/lo split",
        )), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
