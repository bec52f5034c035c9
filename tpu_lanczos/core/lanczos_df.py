"""Double-word (two-f32) Lanczos: f64-grade e^A.x on TPU hardware.

The round-1 f32 pipeline floored at ~1e-7 relative error vs the f64
oracle; the reference's CUDA pipeline ran hardware f64 at 3e-16..9e-13
(parallel-final/output/final_output1.txt:31).  This module runs the
whole recurrence in df64 arithmetic (core/df64.py):

- the SpMV is exact routing + compensated accumulation
  (kernels/spmv_cpg.py spmv_cpg_df) — requires the CPG format;
- dots/norms use exact two-products with a pairwise two-sum tree;
- the recurrence updates are elementwise df ops on (hi, lo) vectors.

Memory-light by construction: the same two-pass Q-free scheme as
core/lanczos.py (alpha/beta pass, then a regeneration pass accumulating
ans), so df64 runs cost ~2 sweeps x ~3x f32 work and O(n) memory.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpu_lanczos.core import df64 as df
from tpu_lanczos.kernels.cpg import CPGGraph
from tpu_lanczos.kernels.spmv_cpg import spmv_cpg_df


def _body_core(cg, q, q_prev, beta_prev, interpret):
    """Shared recurrence step: returns (alpha_j, beta_j, q_next)."""
    v = spmv_cpg_df(cg, q[0], q[1], interpret=interpret)
    a = df.df_dot(v, q)
    v = df.df_sub(v, df.df_add(df.df_scale(a, q),
                               df.df_scale(beta_prev, q_prev)))
    b = df.df_norm(v)
    ok = b[0] > 0
    safe_b = (jnp.where(ok, b[0], 1.0), jnp.where(ok, b[1], 0.0))
    inv_b = df.df_div(df.df_from(jnp.float32(1.0)), safe_b)
    q_next = df.df_scale(inv_b, v)
    q_next = (jnp.where(ok, q_next[0], 0.0), jnp.where(ok, q_next[1], 0.0))
    return a, b, q_next


@partial(jax.jit, static_argnames=("k", "interpret"))
def lanczos_alphabeta_df(cg: CPGGraph, x_hi, x_lo, k: int,
                         interpret: bool = False):
    """Pass 1: df64 alpha/beta (each a (hi, lo) pair of (k,) arrays)."""
    x = (x_hi, x_lo)
    x_norm = df.df_norm(x)
    inv = df.df_div(df.df_from(jnp.float32(1.0)), x_norm)
    q0 = df.df_scale(inv, x)
    zk = jnp.zeros((k,), jnp.float32)
    zv = jnp.zeros_like(x_hi)

    def body(j, carry):
        qh, ql, ph, pl_, ah, al, bh, bl = carry
        jm = jnp.maximum(j - 1, 0)
        b_prev = (jnp.where(j > 0, bh[jm], 0.0),
                  jnp.where(j > 0, bl[jm], 0.0))
        a, b, q_next = _body_core(cg, (qh, ql), (ph, pl_), b_prev, interpret)
        ah = ah.at[j].set(a[0])
        al = al.at[j].set(a[1])
        bh = bh.at[j].set(b[0])
        bl = bl.at[j].set(b[1])
        return (q_next[0], q_next[1], qh, ql, ah, al, bh, bl)

    init = (q0[0], q0[1], zv, zv, zk, zk, zk, zk)
    _, _, _, _, ah, al, bh, bl = jax.lax.fori_loop(0, k, body, init)
    return (ah, al), (bh, bl), x_norm


@jax.jit
def _alphabeta_df_init_dev(x_hi, x_lo):
    """Normalized df64 start state (q0_hi, q0_lo, xn_hi, xn_lo) — the
    init stage of lanczos_alphabeta_df, exposed for the checkpointed
    chunked runner (core/checkpoint.py)."""
    x = (x_hi, x_lo)
    x_norm = df.df_norm(x)
    inv = df.df_div(df.df_from(jnp.float32(1.0)), x_norm)
    q0 = df.df_scale(inv, x)
    return q0[0], q0[1], x_norm[0], x_norm[1]


@partial(jax.jit, static_argnames=("interpret",))
def lanczos_alphabeta_df_range(cg: CPGGraph, carry, j0, j1,
                               interpret: bool = False):
    """Iterations [j0, j1) of the df64 alpha/beta recurrence on a carry
    ``(qh, ql, ph, pl, ah, al, bh, bl)`` with k-sized coefficient
    buffers — the df64 twin of core.lanczos.lanczos_range, used by
    checkpoint/resume for europe-scale df64 runs (the two-pass mode's
    pass 1 is the long sequential stage).  ``j0``/``j1`` may be traced:
    one compilation serves any chunk.  Identical ops in identical order
    to lanczos_alphabeta_df's body, so a chunked run reproduces the
    one-shot pass bit-for-bit."""
    def body(j, carry):
        qh, ql, ph, pl_, ah, al, bh, bl = carry
        jm = jnp.maximum(j - 1, 0)
        b_prev = (jnp.where(j > 0, bh[jm], 0.0),
                  jnp.where(j > 0, bl[jm], 0.0))
        a, b, q_next = _body_core(cg, (qh, ql), (ph, pl_), b_prev,
                                  interpret)
        ah = ah.at[j].set(a[0])
        al = al.at[j].set(a[1])
        bh = bh.at[j].set(b[0])
        bl = bl.at[j].set(b[1])
        return (q_next[0], q_next[1], qh, ql, ah, al, bh, bl)

    return jax.lax.fori_loop(j0, j1, body, carry)


@partial(jax.jit, static_argnames=("k", "interpret"))
def lanczos_recombine_df(cg: CPGGraph, x_hi, x_lo, coeff_hi, coeff_lo,
                         k: int, interpret: bool = False):
    """Pass 2: regenerate q_j identically, accumulate
    ans = sum_j coeff[j] * q_j in df64.  Returns an (ans_hi, ans_lo) pair."""
    x = (x_hi, x_lo)
    x_norm = df.df_norm(x)
    inv = df.df_div(df.df_from(jnp.float32(1.0)), x_norm)
    q0 = df.df_scale(inv, x)
    zv = jnp.zeros_like(x_hi)
    zk = jnp.zeros((k,), jnp.float32)

    def body(j, carry):
        qh, ql, ph, pl_, ansh, ansl, bh, bl = carry
        c = (coeff_hi[j], coeff_lo[j])
        ansh, ansl = df.df_add((ansh, ansl), df.df_scale(c, (qh, ql)))
        jm = jnp.maximum(j - 1, 0)
        b_prev = (jnp.where(j > 0, bh[jm], 0.0),
                  jnp.where(j > 0, bl[jm], 0.0))
        _, b, q_next = _body_core(cg, (qh, ql), (ph, pl_), b_prev, interpret)
        bh = bh.at[j].set(b[0])
        bl = bl.at[j].set(b[1])
        return (q_next[0], q_next[1], qh, ql, ansh, ansl, bh, bl)

    # run the recurrence only k-1 times: the final q_{k-1} needs no
    # further SpMV/dots — accumulate its coefficient term directly
    init = (q0[0], q0[1], zv, zv, zv, zv, zk, zk)
    carry = jax.lax.fori_loop(0, k - 1, body, init) if k > 1 else init
    qh, ql, _, _, ansh, ansl, _, _ = carry
    c = (coeff_hi[k - 1], coeff_lo[k - 1])
    ansh, ansl = df.df_add((ansh, ansl), df.df_scale(c, (qh, ql)))
    return ansh, ansl


@partial(jax.jit, static_argnames=("k", "interpret"))
def lanczos_recombine_df_multi(cg: CPGGraph, x_hi, x_lo, coeff_hi,
                               coeff_lo, k: int, interpret: bool = False):
    """Multi-answer pass 2: ``coeff_*`` is (n_ks, k) — row m holds the
    coefficient vector for Krylov dimension ks[m], ZERO-PADDED beyond
    its own k.  One q_j regeneration sweep accumulates every answer
    simultaneously (ans[m] += coeff[m, j] * q_j), so a whole
    convergence study costs one extra O(n_ks * n) accumulator instead
    of n_ks recombine sweeps.  Returns (ans_hi, ans_lo) of (n_ks, n)."""
    x = (x_hi, x_lo)
    x_norm = df.df_norm(x)
    inv = df.df_div(df.df_from(jnp.float32(1.0)), x_norm)
    q0 = df.df_scale(inv, x)
    n_ks = coeff_hi.shape[0]
    zv = jnp.zeros_like(x_hi)
    za = jnp.zeros((n_ks,) + x_hi.shape, jnp.float32)
    zk = jnp.zeros((k,), jnp.float32)

    def accum(ansh, ansl, j, qh, ql):
        shape = ansh.shape
        c = (jnp.broadcast_to(coeff_hi[:, j][:, None], shape),
             jnp.broadcast_to(coeff_lo[:, j][:, None], shape))
        qb = (jnp.broadcast_to(qh[None, :], shape),
              jnp.broadcast_to(ql[None, :], shape))
        return df.df_add((ansh, ansl), df.df_mul(c, qb))

    def body(j, carry):
        qh, ql, ph, pl_, ansh, ansl, bh, bl = carry
        ansh, ansl = accum(ansh, ansl, j, qh, ql)
        jm = jnp.maximum(j - 1, 0)
        b_prev = (jnp.where(j > 0, bh[jm], 0.0),
                  jnp.where(j > 0, bl[jm], 0.0))
        _, b, q_next = _body_core(cg, (qh, ql), (ph, pl_), b_prev, interpret)
        bh = bh.at[j].set(b[0])
        bl = bl.at[j].set(b[1])
        return (q_next[0], q_next[1], qh, ql, ansh, ansl, bh, bl)

    init = (q0[0], q0[1], zv, zv, za, za, zk, zk)
    carry = jax.lax.fori_loop(0, k - 1, body, init) if k > 1 else init
    qh, ql, _, _, ansh, ansl, _, _ = carry
    ansh, ansl = accum(ansh, ansl, k - 1, qh, ql)
    return ansh, ansl


def split_f64(a: np.ndarray):
    """Host: f64 array -> (hi, lo) f32 pair with hi + lo == a (to f32x2
    precision)."""
    hi = a.astype(np.float32)
    lo = (a - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def expm_action_df(graph, x: np.ndarray | None = None, k: int = 50, *,
                   dg: CPGGraph | None = None, log_scale: bool = False,
                   interpret: bool | None = None,
                   checkpoint_path: str | None = None,
                   checkpoint_chunk: int = 16):
    """f64-grade e^A.x on TPU: df64 two-pass Lanczos + host LAPACK eig.

    Returns a :class:`tpu_lanczos.core.pipeline.LanczosResult` whose
    ``ans``/``alpha``/``beta`` are float64 (hi + lo collapsed on host).

    ``checkpoint_path`` persists pass 1's O(n) carry every
    ``checkpoint_chunk`` iterations and resumes from a compatible
    snapshot (core/checkpoint.py lanczos_alphabeta_df_checkpointed) —
    for europe-scale runs on preemptible devices.  Pass 2 restarts
    fresh; see the checkpoint module docstring for scope.
    """
    from tpu_lanczos.core import expmv, tridiag
    from tpu_lanczos.core.pipeline import LanczosResult
    from tpu_lanczos.kernels.cpg import pack_cpg

    k = int(max(min(k, graph.n - 1), 1))
    if dg is None:
        dg = pack_cpg(graph)
    if interpret is None:
        interpret = jax.default_backend() in ("cpu", "gpu")
    if x is None:
        # default all-ones start vector: exactly the realmask, already on
        # device — skips two n-sized H2D transfers through the tunnel
        x_hi = dg.realmask.astype(jnp.float32)
        x_lo = jnp.zeros_like(x_hi)
    else:
        hi, lo = split_f64(dg.permute_in(np.asarray(x, np.float64),
                                         np.float64))
        x_hi, x_lo = jnp.asarray(hi), jnp.asarray(lo)

    if checkpoint_path is not None:
        from tpu_lanczos.core.checkpoint import (
            lanczos_alphabeta_df_checkpointed,
        )

        alpha, beta, x_norm = lanczos_alphabeta_df_checkpointed(
            dg, x_hi, x_lo, k, checkpoint_path=checkpoint_path,
            chunk=checkpoint_chunk, interpret=interpret)
    else:
        alpha, beta, x_norm = lanczos_alphabeta_df(dg, x_hi, x_lo, k,
                                                   interpret=interpret)
    alpha64 = df.df_to_f64((np.asarray(alpha[0]), np.asarray(alpha[1])))
    beta64 = df.df_to_f64((np.asarray(beta[0]), np.asarray(beta[1])))[: k - 1]
    xn64 = float(df.df_to_f64((np.asarray(x_norm[0]), np.asarray(x_norm[1]))))

    evals, evecs = tridiag.eigh_host(alpha64, beta64)
    coeff, shift = expmv.coefficients(evals, evecs, xn64, xp=np)
    ch, cl = split_f64(coeff)
    ansh, ansl = lanczos_recombine_df(
        dg, x_hi, x_lo, jnp.asarray(ch), jnp.asarray(cl), k,
        interpret=interpret,
    )
    ans64 = df.df_to_f64((np.asarray(ansh), np.asarray(ansl)))
    if not log_scale:
        ans64 = ans64 * np.exp(shift)
    return LanczosResult(
        ans=dg.permute_out(ans64),
        log_scale=float(shift) if log_scale else None,
        alpha=alpha64, beta=beta64, x_norm=xn64, k=k,
    )


def expm_action_ks_df(graph, ks, x: np.ndarray | None = None, *,
                      dg: CPGGraph | None = None, log_scale: bool = False,
                      interpret: bool | None = None):
    """df64 answers for EVERY requested Krylov dimension from one
    decomposition — the df64 analog of pipeline.expm_action_ks, i.e.
    the reference's convergence study (serial/tests/numerical_test.sh
    k-grid; writeup Table 5) at hardware-f64 accuracy on TPU.

    One alpha/beta pass + ONE multi-answer recombine pass (the pass-2
    sweep accumulates all |ks| answers simultaneously).  Returns
    ``(results, diffs)`` exactly like expm_action_ks: ``results[k]`` a
    LanczosResult (float64 host arrays), ``diffs[k]`` the Table-5
    self-consistency metric ||ans_k - ans_kmax|| / ||ans_kmax|| on a
    common log-scale shift."""
    from tpu_lanczos.core import expmv, tridiag
    from tpu_lanczos.core.pipeline import LanczosResult
    from tpu_lanczos.kernels.cpg import pack_cpg

    ks = sorted({max(min(int(k), graph.n - 1), 1) for k in ks})
    k_max = ks[-1]
    if dg is None:
        dg = pack_cpg(graph)
    if interpret is None:
        interpret = jax.default_backend() in ("cpu", "gpu")
    if x is None:
        x_hi = dg.realmask.astype(jnp.float32)
        x_lo = jnp.zeros_like(x_hi)
    else:
        hi, lo = split_f64(dg.permute_in(np.asarray(x, np.float64),
                                         np.float64))
        x_hi, x_lo = jnp.asarray(hi), jnp.asarray(lo)

    alpha, beta, x_norm = lanczos_alphabeta_df(dg, x_hi, x_lo, k_max,
                                               interpret=interpret)
    # one host sync for the pass-1 outputs
    ah, al, bh, bl, xh, xl = jax.device_get(
        (alpha[0], alpha[1], beta[0], beta[1], x_norm[0], x_norm[1]))
    alpha64 = df.df_to_f64((ah, al))
    beta64 = df.df_to_f64((bh, bl))
    xn64 = float(df.df_to_f64((xh, xl)))

    coeff = np.zeros((len(ks), k_max), np.float64)
    shifts = {}
    for m, k in enumerate(ks):
        evals, evecs = tridiag.eigh_host(alpha64[:k], beta64[: k - 1])
        c, shift = expmv.coefficients(evals, evecs, xn64, xp=np)
        coeff[m, :k] = c
        shifts[k] = float(shift)
    ch, cl = split_f64(coeff)
    ansh, ansl = lanczos_recombine_df_multi(
        dg, x_hi, x_lo, jnp.asarray(ch), jnp.asarray(cl), k_max,
        interpret=interpret,
    )
    ansh_h, ansl_h = jax.device_get((ansh, ansl))
    results = {}
    for m, k in enumerate(ks):
        ans64 = df.df_to_f64((ansh_h[m], ansl_h[m]))
        if not log_scale:
            ans64 = ans64 * np.exp(shifts[k])
        results[k] = LanczosResult(
            ans=dg.permute_out(ans64),
            log_scale=shifts[k] if log_scale else None,
            alpha=alpha64[:k], beta=beta64[: k - 1], x_norm=xn64, k=k,
        )
    ref = results[k_max].ans
    ref_norm = np.linalg.norm(ref)
    diffs = {}
    for k in ks:
        a = results[k].ans
        if log_scale:
            a = a * np.exp(shifts[k] - shifts[k_max])
        diffs[k] = float(np.linalg.norm(a - ref) / ref_norm)
    return results, diffs
