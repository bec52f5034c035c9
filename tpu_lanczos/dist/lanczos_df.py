"""Row-sharded df64 Lanczos: f64-grade e^A.x over an N-chip mesh.

The reference's WHOLE pipeline is templated double everywhere,
including the dual-GPU path (parallel-two-cards/lib/cu_lanczos.cu —
templated <T>; eigen.cu:17 dstevd).  Round 3 delivered df64 only on
the single-chip surface; this module closes the gap: the two-pass
Q-free df64 scheme (core/lanczos_df.py) runs inside shard_map over the
row mesh, with

- the sharded CPG SpMV in compensated arithmetic: the hi stream rides
  the two-sum kernel variant (emits an error stream), the lo stream
  the plain kernel, reduce levels fold with elementwise two-sums —
  exactly the single-chip spmv_cpg_df structure per shard
  (kernels/spmv_cpg.py:420), with the halo/compact collectives
  transporting BOTH (hi, lo) streams;
- cross-shard dots done EXACTLY in df arithmetic: each shard computes
  its local Ogita-Rump-Oishi df dot, the (hi, lo) scalar pairs are
  all_gather'd (2·n_shards floats) and folded with a chain of df_adds
  — a plain psum of hi and lo separately would round the hi partials
  at f32 and throw away the compensation (contrast mesh.pdot, which is
  fine for the f32 path);
- the main level keeps the round-4 own/cross-source overlap split:
  the own-source passes (hi+lo) depend only on q_loc and fill the halo
  collective's flight time (dist/cpg_sharded.py pack_cpg_sharded).

Accuracy is the same ~2^-48 class as single-chip df64 (hardware
k-sweep: plateau ~1e-14, bench_results/k_sweep_df64.jsonl); the
cross-shard fold changes summation order, so results differ from
single-chip df64 at the df roundoff level, not above it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpu_lanczos.core import df64 as df
from tpu_lanczos.core.df64 import two_sum
from tpu_lanczos.dist.cpg_sharded import ShardedCPG, pack_cpg_sharded
from tpu_lanczos.dist.mesh import ROWS, make_mesh
from tpu_lanczos.kernels import spmv_cpg as _k
from tpu_lanczos.kernels.cpg import LANE


def _df_allsum(pair, n_shards: int):
    """Exact cross-shard sum of a df scalar: gather the (hi, lo) pairs
    (2·n_shards floats over ICI) and fold with df_adds — the df64
    analog of mesh.pdot's psum epilogue."""
    h = jax.lax.all_gather(pair[0][None], ROWS, tiled=True)
    l_ = jax.lax.all_gather(pair[1][None], ROWS, tiled=True)
    acc = (h[0], l_[0])
    for i in range(1, n_shards):
        acc = df.df_add(acc, (h[i], l_[i]))
    return acc


def _df_pdot(x, y, n_shards: int):
    return _df_allsum(df.df_dot(x, y), n_shards)


def _local_spmv_df(levels_loc, realmask_loc, q_hi, q_lo, sub, c_loc,
                   interpret, t_reals=(), mask_sparse=(), overlap=False):
    """Per-shard df64 SpMV (runs inside shard_map).  Mirrors
    cpg_sharded._local_spmv's collective structure with each level run
    twice (compensated hi + plain lo) and two-sum folds between levels
    — the sharded twin of kernels.spmv_cpg.spmv_cpg_df."""
    n_sub_loc = c_loc * sub

    def untranspose(yt):
        return yt.reshape(c_loc, LANE, sub).transpose(0, 2, 1).reshape(
            n_sub_loc, LANE)

    def run(level, src2d, t_real=None, sp=True, compensated=False):
        lvl = {k: v[0] for k, v in level.items()
               if k not in ("sel", "halo_sel")}
        out = _k._run_level(src2d, lvl, c_loc, sub, interpret,
                            compensated=compensated,
                            vma=frozenset({ROWS}), t_real=t_real,
                            sparse_dispatch=sp)
        if compensated:
            return untranspose(out[0]), untranspose(out[1])
        return untranspose(out)

    def t_real(i):
        return t_reals[i] if t_reals else None

    def sp(i):
        return mask_sparse[i] if mask_sparse else True

    def gather_cross(lv, vec_loc):
        """Halo exchange of one stream (compact boundary chunks when
        the pack found a sel, full vector otherwise)."""
        if "halo_sel" in lv:
            hsel = lv["halo_sel"][0]
            contrib = vec_loc.reshape(c_loc, sub * LANE)[hsel].reshape(-1)
            return jax.lax.all_gather(contrib, ROWS, tiled=True)
        return jax.lax.all_gather(vec_loc, ROWS, tiled=True)

    def zeros2d():
        z = jnp.zeros((n_sub_loc, LANE), jnp.float32)
        return jax.lax.pcast(z, (ROWS,), to="varying")

    if overlap:
        lv_own, lv_cross = levels_loc[0], levels_loc[1]
        cross_empty = bool(t_reals) and t_reals[1] == 0
        own_empty = bool(t_reals) and t_reals[0] == 0
        # 1) issue both halo collectives first (no consumer yet)
        if cross_empty:
            g_hi = g_lo = None
        else:
            g_hi = gather_cross(lv_cross, q_hi)
            g_lo = gather_cross(lv_cross, q_lo)
        # 2) own-source passes depend only on q_loc: they fill the
        # gathers' flight time
        if own_empty:
            y2d, e2d = zeros2d(), zeros2d()
        else:
            y2d, et = run(lv_own, q_hi.reshape(-1, LANE), t_real(0),
                          sp(0), compensated=True)
            lt = run(lv_own, q_lo.reshape(-1, LANE), t_real(0), sp(0))
            e2d = et + lt
        # 3) cross-source passes consume the gathered buffers
        if not cross_empty:
            yt, et = run(lv_cross, g_hi.reshape(-1, LANE), t_real(1),
                         sp(1), compensated=True)
            lt = run(lv_cross, g_lo.reshape(-1, LANE), t_real(1), sp(1))
            y2d, t = two_sum(y2d, yt)
            e2d = e2d + t + et + lt
        base = 2
    else:
        lv0 = levels_loc[0]
        if "halo_sel" in lv0:
            h_hi = gather_cross(lv0, q_hi)
            h_lo = gather_cross(lv0, q_lo)
            h_hi = jax.lax.pcast(h_hi, (ROWS,), to="varying")
            h_lo = jax.lax.pcast(h_lo, (ROWS,), to="varying")
            src_hi = jnp.concatenate([q_hi, h_hi]).reshape(-1, LANE)
            src_lo = jnp.concatenate([q_lo, h_lo]).reshape(-1, LANE)
        else:
            src_hi = jax.lax.all_gather(
                q_hi, ROWS, tiled=True).reshape(-1, LANE)
            src_lo = jax.lax.all_gather(
                q_lo, ROWS, tiled=True).reshape(-1, LANE)
        y2d, et = run(lv0, src_hi, t_real(0), sp(0), compensated=True)
        lt = run(lv0, src_lo, t_real(0), sp(0))
        e2d = et + lt
        base = 1

    y_flat, e_flat = y2d.reshape(-1), e2d.reshape(-1)
    for lv_i, level in enumerate(levels_loc[base:]):
        # compact reduce-level exchange, now of BOTH partial streams
        sel = level["sel"][0]
        c_hi = y_flat.reshape(c_loc, sub * LANE)[sel].reshape(-1)
        c_lo = e_flat.reshape(c_loc, sub * LANE)[sel].reshape(-1)
        f_hi = jax.lax.all_gather(c_hi, ROWS, tiled=True).reshape(-1, LANE)
        f_lo = jax.lax.all_gather(c_lo, ROWS, tiled=True).reshape(-1, LANE)
        yt, et = run(level, f_hi, t_real(lv_i + base), sp(lv_i + base),
                     compensated=True)
        lt = run(level, f_lo, t_real(lv_i + base), sp(lv_i + base))
        y_flat, t = two_sum(y_flat, yt.reshape(-1))
        e_flat = e_flat + t + et.reshape(-1) + lt.reshape(-1)
    # two_sum (not fast_two_sum): after cancellation |e| can exceed |y|
    hi, lo = two_sum(y_flat, e_flat)
    mask = realmask_loc.astype(jnp.float32)
    return hi * mask, lo * mask


def _body_core_sh(local_df, q, q_prev, beta_prev, n_shards):
    """Shared df64 recurrence step inside shard_map: returns
    (alpha_j, beta_j, q_next) — the sharded twin of
    core.lanczos_df._body_core with psum'd (exact-fold) dots."""
    v = local_df(q)
    a = _df_pdot(v, q, n_shards)
    v = df.df_sub(v, df.df_add(df.df_scale(a, q),
                               df.df_scale(beta_prev, q_prev)))
    b = df.df_sqrt(_df_pdot(v, v, n_shards))
    ok = b[0] > 0
    safe_b = (jnp.where(ok, b[0], 1.0), jnp.where(ok, b[1], 0.0))
    inv_b = df.df_div(df.df_from(jnp.float32(1.0)), safe_b)
    q_next = df.df_scale(inv_b, v)
    q_next = (jnp.where(ok, q_next[0], 0.0), jnp.where(ok, q_next[1], 0.0))
    return a, b, q_next


@partial(jax.jit, static_argnames=(
    "mesh", "k", "sub", "c_loc", "interpret", "t_reals", "mask_sparse",
    "overlap", "n_shards"))
def _alphabeta_df_shmap(mesh, levels, realmask, x_hi, x_lo, k, sub,
                        c_loc, interpret, t_reals, mask_sparse, overlap,
                        n_shards):
    from tpu_lanczos.dist.cpg_sharded import _rows_specs

    P = jax.sharding.PartitionSpec
    level_specs = _rows_specs(levels)

    def f(levels_loc, realmask_loc, xh_loc, xl_loc):
        def local(q):
            return _local_spmv_df(levels_loc, realmask_loc, q[0], q[1],
                                  sub, c_loc, interpret, t_reals,
                                  mask_sparse, overlap)

        x = (xh_loc, xl_loc)
        x_norm = df.df_sqrt(_df_pdot(x, x, n_shards))
        inv = df.df_div(df.df_from(jnp.float32(1.0)), x_norm)
        q0 = df.df_scale(inv, x)
        zk = jnp.zeros((k,), jnp.float32)
        zv = jax.lax.pcast(jnp.zeros_like(xh_loc), (ROWS,), to="varying")

        def body(j, carry):
            qh, ql, ph, pl_, ah, al, bh, bl = carry
            jm = jnp.maximum(j - 1, 0)
            b_prev = (jnp.where(j > 0, bh[jm], 0.0),
                      jnp.where(j > 0, bl[jm], 0.0))
            a, b, q_next = _body_core_sh(local, (qh, ql), (ph, pl_),
                                         b_prev, n_shards)
            ah = ah.at[j].set(a[0])
            al = al.at[j].set(a[1])
            bh = bh.at[j].set(b[0])
            bl = bl.at[j].set(b[1])
            return (q_next[0], q_next[1], qh, ql, ah, al, bh, bl)

        init = (q0[0], q0[1], zv, zv, zk, zk, zk, zk)
        _, _, _, _, ah, al, bh, bl = jax.lax.fori_loop(0, k, body, init)
        return ah, al, bh, bl, x_norm[0], x_norm[1]

    return jax.shard_map(
        f, mesh=mesh,
        in_specs=(level_specs, P(ROWS), P(ROWS), P(ROWS)),
        out_specs=(P(), P(), P(), P(), P(), P()),
        check_vma=not interpret,
    )(levels, realmask, x_hi, x_lo)


@partial(jax.jit, static_argnames=(
    "mesh", "k", "sub", "c_loc", "interpret", "t_reals", "mask_sparse",
    "overlap", "n_shards"))
def _recombine_df_shmap(mesh, levels, realmask, x_hi, x_lo, coeff_hi,
                        coeff_lo, k, sub, c_loc, interpret, t_reals,
                        mask_sparse, overlap, n_shards):
    from tpu_lanczos.dist.cpg_sharded import _rows_specs

    P = jax.sharding.PartitionSpec
    level_specs = _rows_specs(levels)

    def f(levels_loc, realmask_loc, xh_loc, xl_loc, ch, cl):
        def local(q):
            return _local_spmv_df(levels_loc, realmask_loc, q[0], q[1],
                                  sub, c_loc, interpret, t_reals,
                                  mask_sparse, overlap)

        x = (xh_loc, xl_loc)
        x_norm = df.df_sqrt(_df_pdot(x, x, n_shards))
        inv = df.df_div(df.df_from(jnp.float32(1.0)), x_norm)
        q0 = df.df_scale(inv, x)
        zv = jax.lax.pcast(jnp.zeros_like(xh_loc), (ROWS,), to="varying")
        zk = jnp.zeros((k,), jnp.float32)

        def body(j, carry):
            qh, ql, ph, pl_, ansh, ansl, bh, bl = carry
            c = (ch[j], cl[j])
            ansh, ansl = df.df_add((ansh, ansl),
                                   df.df_scale(c, (qh, ql)))
            jm = jnp.maximum(j - 1, 0)
            b_prev = (jnp.where(j > 0, bh[jm], 0.0),
                      jnp.where(j > 0, bl[jm], 0.0))
            _, b, q_next = _body_core_sh(local, (qh, ql), (ph, pl_),
                                         b_prev, n_shards)
            bh = bh.at[j].set(b[0])
            bl = bl.at[j].set(b[1])
            return (q_next[0], q_next[1], qh, ql, ansh, ansl, bh, bl)

        init = (q0[0], q0[1], zv, zv, zv, zv, zk, zk)
        carry = (jax.lax.fori_loop(0, k - 1, body, init)
                 if k > 1 else init)
        qh, ql, _, _, ansh, ansl, _, _ = carry
        c = (ch[k - 1], cl[k - 1])
        ansh, ansl = df.df_add((ansh, ansl), df.df_scale(c, (qh, ql)))
        return ansh, ansl

    return jax.shard_map(
        f, mesh=mesh,
        in_specs=(level_specs, P(ROWS), P(ROWS), P(ROWS), P(), P()),
        out_specs=(P(ROWS), P(ROWS)),
        check_vma=not interpret,
    )(levels, realmask, x_hi, x_lo, coeff_hi, coeff_lo)


def expm_action_df_sharded(graph, x: np.ndarray | None = None,
                           k: int = 50, *, n_shards: int | None = None,
                           mesh: jax.sharding.Mesh | None = None,
                           sg: ShardedCPG | None = None,
                           log_scale: bool = False,
                           interpret: bool | None = None, **pack_kw):
    """f64-grade e^A.x row-sharded over ``n_shards`` chips: df64
    two-pass Lanczos under shard_map + host LAPACK eig — the TPU-native
    equivalent of the reference's templated-double dual-GPU pipeline
    (parallel-two-cards/lib/cu_lanczos.cu).  Returns a LanczosResult
    with float64 host arrays."""
    from tpu_lanczos.core import expmv, tridiag
    from tpu_lanczos.core.lanczos_df import split_f64
    from tpu_lanczos.core.pipeline import LanczosResult

    k = int(max(min(k, graph.n - 1), 1))
    if mesh is None:
        mesh = make_mesh(n_shards)
    n_shards = mesh.devices.size
    if sg is None:
        sg = pack_cpg_sharded(graph, n_shards, mesh=mesh, **pack_kw)
    if interpret is None:
        interpret = jax.default_backend() in ("cpu", "gpu")

    P = jax.sharding.PartitionSpec
    rows_sharding = jax.sharding.NamedSharding(mesh, P(ROWS))
    if x is None:
        x_hi = sg.realmask.astype(jnp.float32)
        x_lo = jnp.zeros_like(x_hi)
        x_lo = jax.device_put(x_lo, rows_sharding)
    else:
        hi, lo = split_f64(sg.permute_in(np.asarray(x, np.float64),
                                         np.float64))
        x_hi = jax.device_put(jnp.asarray(hi), rows_sharding)
        x_lo = jax.device_put(jnp.asarray(lo), rows_sharding)

    ah, al, bh, bl, xh, xl = _alphabeta_df_shmap(
        mesh, sg.levels, sg.realmask, x_hi, x_lo, k=k, sub=sg.sub,
        c_loc=sg.c_loc, interpret=interpret, t_reals=sg.t_reals,
        mask_sparse=sg.mask_sparse, overlap=sg.overlap,
        n_shards=n_shards)
    ah, al, bh, bl, xh, xl = jax.device_get((ah, al, bh, bl, xh, xl))
    alpha64 = df.df_to_f64((ah, al))
    beta64 = df.df_to_f64((bh, bl))[: k - 1]
    xn64 = float(df.df_to_f64((xh, xl)))

    evals, evecs = tridiag.eigh_host(alpha64, beta64)
    coeff, shift = expmv.coefficients(evals, evecs, xn64, xp=np)
    ch, cl = split_f64(coeff)
    ansh, ansl = _recombine_df_shmap(
        mesh, sg.levels, sg.realmask, x_hi, x_lo,
        jnp.asarray(ch), jnp.asarray(cl), k=k, sub=sg.sub,
        c_loc=sg.c_loc, interpret=interpret, t_reals=sg.t_reals,
        mask_sparse=sg.mask_sparse, overlap=sg.overlap,
        n_shards=n_shards)
    ansh_h, ansl_h = jax.device_get((ansh, ansl))
    ans64 = df.df_to_f64((ansh_h, ansl_h))
    if not log_scale:
        ans64 = ans64 * np.exp(shift)
    return LanczosResult(
        ans=sg.permute_out(ans64),
        log_scale=float(shift) if log_scale else None,
        alpha=alpha64, beta=beta64, x_norm=xn64, k=k,
    )
