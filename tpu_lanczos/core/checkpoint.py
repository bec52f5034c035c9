"""Checkpoint / resume for the Lanczos decomposition.

The reference has no in-algorithm checkpointing — its closest analog is
persisting final answer vectors with ``write_ans``
(parallel-final/lib/write_ans.h:9-16; SURVEY.md §5 'Checkpoint / resume:
none in-algorithm ... a genuine improvement slot').  Here the full loop
carry (q, q_prev, partial Q/alpha/beta and the iteration cursor) is
persisted, so a long decomposition on a preemptible TPU can restart from
the last completed chunk, bit-identically to an uninterrupted run.

Scope:

- ``lanczos_checkpointed`` — the single-chip STORED-Q path (f32/f64),
  O(k*n) snapshot.
- ``lanczos_alphabeta_df_checkpointed`` — pass 1 of the df64 two-pass
  mode (the long sequential stage of a europe-scale f64-grade run),
  O(n) snapshot: two (hi, lo) vector pairs + the coefficient buffers.
  Pass 2 (the recombine sweep) restarts fresh on resume — it is the
  same length but needs pass 1's full coefficients first, so a pass-1
  checkpoint already halves the worst-case lost work; its carry could
  be persisted the same way if the need arises.
- Sharded (multi-chip) runs do NOT checkpoint: each shard would need a
  coordinated snapshot of its local carry; restart them from scratch.
"""

from __future__ import annotations

import dataclasses
import os
import tempfile

import jax.numpy as jnp
import numpy as np

from tpu_lanczos.core.lanczos import (
    LanczosState,
    lanczos_init,
    lanczos_range,
)


def _structure_probe(dg) -> int:
    """Hash of one SpMV of a fixed pseudo-random vector: captures the
    packed adjacency structure (same-shaped packs of different graphs
    collide with negligible probability) at O(1) host transfer.  A false
    mismatch only forces a safe restart, never a wrong resume."""
    import zlib

    from tpu_lanczos.kernels.spmv import spmv

    r = ((np.arange(dg.n_pad, dtype=np.int64) * 2654435761) % 1000003
         ).astype(np.float32) / 1000003.0
    y = np.asarray(spmv(dg, jnp.asarray(r)))
    return zlib.crc32(np.ascontiguousarray(y[:65536]).tobytes())


def run_fingerprint(dg, dtype, k: int, reorthogonalize: bool,
                    spmv_impl: str, x=None) -> str:
    """Identity of a decomposition run: the graph (n, nnz, pack permutation
    hash, structural SpMV probe), the dtype, the START VECTOR, and every
    setting that changes the recurrence.  A checkpoint written under a
    different fingerprint must not be resumed — same-shaped snapshots of a
    different graph/dtype/x/flags would silently produce a wrong
    decomposition."""
    import zlib

    noo = getattr(dg, "new_of_old", None)
    perm_crc = (
        zlib.crc32(np.ascontiguousarray(noo).tobytes()) if noo is not None else 0
    )
    x_crc = (
        zlib.crc32(np.ascontiguousarray(np.asarray(x)).tobytes())
        if x is not None else 0
    )
    return (
        f"{type(dg).__name__}:n={dg.n}:nnz={dg.nnz}:n_pad={dg.n_pad}:"
        f"perm={perm_crc:08x}:probe={_structure_probe(dg):08x}:"
        f"dtype={np.dtype(dtype).name}:k={k}:x={x_crc:08x}:"
        f"reorth={bool(reorthogonalize)}:spmv={spmv_impl}"
    )


@dataclasses.dataclass
class LanczosCheckpoint:
    """Host-side snapshot of the loop carry after ``j_done`` iterations."""

    j_done: int
    k: int
    q: np.ndarray
    q_prev: np.ndarray
    q_basis: np.ndarray
    alpha: np.ndarray
    beta: np.ndarray
    x_norm: float
    fingerprint: str = ""

    def save(self, path: str) -> None:
        tmp_fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(os.path.abspath(path)) or ".", suffix=".tmp"
        )
        os.close(tmp_fd)
        np.savez(
            tmp,
            j_done=self.j_done, k=self.k, q=self.q, q_prev=self.q_prev,
            q_basis=self.q_basis, alpha=self.alpha, beta=self.beta,
            x_norm=self.x_norm, fingerprint=self.fingerprint,
        )
        os.replace(tmp + ".npz", path)  # atomic: no torn checkpoints
        os.unlink(tmp) if os.path.exists(tmp) else None

    @staticmethod
    def load(path: str) -> "LanczosCheckpoint":
        z = np.load(path)
        return LanczosCheckpoint(
            j_done=int(z["j_done"]), k=int(z["k"]), q=z["q"],
            q_prev=z["q_prev"], q_basis=z["q_basis"], alpha=z["alpha"],
            beta=z["beta"], x_norm=float(z["x_norm"]),
            fingerprint=str(z["fingerprint"]) if "fingerprint" in z else "",
        )

    def carry(self):
        return (
            jnp.asarray(self.q), jnp.asarray(self.q_prev),
            jnp.asarray(self.q_basis), jnp.asarray(self.alpha),
            jnp.asarray(self.beta),
        )


def lanczos_checkpointed(
    dg,
    x: jnp.ndarray,
    k: int,
    *,
    checkpoint_path: str,
    chunk: int = 16,
    reorthogonalize: bool = False,
    spmv_impl: str = "auto",
) -> LanczosState:
    """k-step Lanczos, persisting the carry every ``chunk`` iterations.

    If ``checkpoint_path`` holds a compatible snapshot, resumes from it;
    the result is bit-identical to an uninterrupted run because the carry
    captures the exact device state between chunks.
    """
    if chunk < 1:
        raise ValueError(f"chunk must be >= 1, got {chunk}")
    fp = run_fingerprint(dg, x.dtype, k, reorthogonalize, spmv_impl, x=x)
    ckpt = None
    if os.path.exists(checkpoint_path):
        try:
            cand = LanczosCheckpoint.load(checkpoint_path)
        except Exception:
            # a truncated/corrupt snapshot must force a fresh run, never
            # abort the decomposition (module guarantee)
            cand = None
        if (cand is not None and cand.fingerprint == fp and cand.k == k
                and cand.q.shape[0] == dg.n_pad):
            ckpt = cand

    if ckpt is None:
        carry, x_norm = lanczos_init(dg, x, k)
        x_norm = float(x_norm)
        j = 0
    else:
        carry = ckpt.carry()
        x_norm = ckpt.x_norm
        j = ckpt.j_done

    while j < k:
        j1 = min(j + chunk, k)
        carry = lanczos_range(
            dg, carry, j, j1,
            reorthogonalize=reorthogonalize, spmv_impl=spmv_impl,
        )
        j = j1
        LanczosCheckpoint(
            j_done=j, k=k,
            q=np.asarray(carry[0]), q_prev=np.asarray(carry[1]),
            q_basis=np.asarray(carry[2]), alpha=np.asarray(carry[3]),
            beta=np.asarray(carry[4]), x_norm=x_norm, fingerprint=fp,
        ).save(checkpoint_path)

    _, _, q_basis, alpha, beta = carry
    return LanczosState(
        alpha=alpha, beta=beta[: k - 1], q_basis=q_basis,
        x_norm=jnp.asarray(x_norm, dtype=alpha.dtype),
    )


@dataclasses.dataclass
class AlphaBetaDFCheckpoint:
    """Host snapshot of the df64 alpha/beta carry after ``j_done``
    iterations: (q, q_prev) as (hi, lo) f32 pairs + the coefficient
    buffers + the df x_norm.  O(n) on disk (no basis is stored — the
    two-pass mode's defining property)."""

    j_done: int
    k: int
    qh: np.ndarray
    ql: np.ndarray
    ph: np.ndarray
    pl: np.ndarray
    ah: np.ndarray
    al: np.ndarray
    bh: np.ndarray
    bl: np.ndarray
    xnh: float
    xnl: float
    fingerprint: str = ""

    _FIELDS = ("qh", "ql", "ph", "pl", "ah", "al", "bh", "bl")

    def save(self, path: str) -> None:
        tmp_fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(os.path.abspath(path)) or ".", suffix=".tmp"
        )
        os.close(tmp_fd)
        np.savez(
            tmp, j_done=self.j_done, k=self.k,
            xnh=self.xnh, xnl=self.xnl, fingerprint=self.fingerprint,
            **{f: getattr(self, f) for f in self._FIELDS},
        )
        os.replace(tmp + ".npz", path)  # atomic: no torn checkpoints
        os.unlink(tmp) if os.path.exists(tmp) else None

    @staticmethod
    def load(path: str) -> "AlphaBetaDFCheckpoint":
        z = np.load(path)
        return AlphaBetaDFCheckpoint(
            j_done=int(z["j_done"]), k=int(z["k"]),
            xnh=float(z["xnh"]), xnl=float(z["xnl"]),
            fingerprint=str(z["fingerprint"]) if "fingerprint" in z else "",
            **{f: z[f] for f in AlphaBetaDFCheckpoint._FIELDS},
        )

    def carry(self):
        return tuple(jnp.asarray(getattr(self, f)) for f in self._FIELDS)


def lanczos_alphabeta_df_checkpointed(
    cg,
    x_hi: jnp.ndarray,
    x_lo: jnp.ndarray,
    k: int,
    *,
    checkpoint_path: str,
    chunk: int = 16,
    interpret: bool = False,
):
    """df64 pass 1 (alpha/beta) persisting the O(n) carry every
    ``chunk`` iterations — checkpoint/resume for the long sequential
    stage of a europe-scale f64-grade run (the reference's closest case
    is the EuropeOSM streaming-Q study, writeup §9.2, which had to run
    uninterrupted).  Returns ``(alpha, beta, x_norm)`` as (hi, lo)
    pairs, exactly like ``lanczos_alphabeta_df``; a resumed run is
    bit-identical to an uninterrupted one (same ops in the same order —
    the df64 EFTs are contraction-proof, core/df64.py)."""
    from tpu_lanczos.core.lanczos_df import (
        _alphabeta_df_init_dev,
        lanczos_alphabeta_df_range,
    )

    if chunk < 1:
        raise ValueError(f"chunk must be >= 1, got {chunk}")

    import zlib

    # start-vector identity without an O(n) D2H: crc of the head slice
    # plus the exact df norm (computed on device either way — the init
    # program is tiny).  A different x with identical head AND norm is
    # negligible; a false mismatch only forces a safe restart.
    q0h, q0l, xnh0, xnl0 = _alphabeta_df_init_dev(x_hi, x_lo)
    head = min(int(cg.n_pad), 65536)
    x_crc = (zlib.crc32(np.ascontiguousarray(x_hi[:head]).tobytes())
             ^ zlib.crc32(np.ascontiguousarray(x_lo[:head]).tobytes()))
    fp = (run_fingerprint(cg, np.float32, k, False, "cpg-df64")
          + f":xdf={x_crc:08x}:xn={float(xnh0):.9e}")
    ckpt = None
    if os.path.exists(checkpoint_path):
        try:
            cand = AlphaBetaDFCheckpoint.load(checkpoint_path)
        except Exception:
            cand = None  # corrupt snapshot -> fresh run (module guarantee)
        if (cand is not None and cand.fingerprint == fp and cand.k == k
                and cand.qh.shape[0] == cg.n_pad):
            ckpt = cand

    if ckpt is None:
        zk = jnp.zeros((k,), jnp.float32)
        zv = jnp.zeros_like(q0h)
        carry = (q0h, q0l, zv, zv, zk, zk, zk, zk)
        xnh, xnl = float(xnh0), float(xnl0)
        j = 0
    else:
        carry = ckpt.carry()
        xnh, xnl = ckpt.xnh, ckpt.xnl
        j = ckpt.j_done

    while j < k:
        j1 = min(j + chunk, k)
        carry = lanczos_alphabeta_df_range(cg, carry, j, j1,
                                           interpret=interpret)
        j = j1
        host = [np.asarray(c) for c in carry]
        AlphaBetaDFCheckpoint(
            j_done=j, k=k,
            **dict(zip(AlphaBetaDFCheckpoint._FIELDS, host)),
            xnh=xnh, xnl=xnl, fingerprint=fp,
        ).save(checkpoint_path)

    _, _, _, _, ah, al, bh, bl = carry
    xn = (jnp.asarray(xnh, jnp.float32), jnp.asarray(xnl, jnp.float32))
    return (ah, al), (bh, bl), xn
