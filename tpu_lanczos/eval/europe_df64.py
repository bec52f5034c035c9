"""Europe-OSM-scale df64 on ONE chip: n=50.9M, f64-grade, restartable.

The reference's largest run was EuropeOSM (n=50,893,956) at k=20 only,
double precision, via the 2-column streaming-Q design after the full-Q
version spilled host RAM into swap (writeup §9.1-9.2).  This script runs
the SAME scale at k=50 in df64 (f64-grade on a chip with no hardware
f64) through the two-pass Q-free pipeline — O(n) device memory — plus:

- df64 k-self-consistency ||ans_50 - ans_60|| / ||ans_60|| from one
  multi-answer decomposition (the reference's Table-5 metric);
- the pass-1 checkpoint (core/checkpoint.py
  lanczos_alphabeta_df_checkpointed) exercised at full scale, including
  a resume from the penultimate snapshot, with the snapshot D2H cost
  reported separately (it rides the testbed tunnel at ~100 MB/s; a
  host-local chip pays ~1% of that).

Run: ``python -m tpu_lanczos.eval.europe_df64`` — JSON lines out.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

SIDE = 7134  # 7134^2 = 50,893,956 = EuropeOSM's exact node count


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", type=int, default=SIDE)
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--cache", default=".bench_cache")
    ap.add_argument("--ckpt-chunk", type=int, default=25)
    args = ap.parse_args(argv)

    from tpu_lanczos.core.checkpoint import (
        AlphaBetaDFCheckpoint, lanczos_alphabeta_df_checkpointed,
    )
    from tpu_lanczos.core.lanczos_df import expm_action_df, expm_action_ks_df
    from tpu_lanczos.eval.bench_suite import build, pack_cache_path, \
        save_pack_cache
    from tpu_lanczos.kernels.cpg import load_cpg, pack_cpg
    from tpu_lanczos.utils import enable_compile_cache, enable_heap_reuse

    import jax

    enable_compile_cache()
    enable_heap_reuse()
    interpret = jax.default_backend() in ("cpu", "gpu")
    cfg = dict(name=f"europe_{args.side}", kind="stencil", side=args.side)

    t0 = time.time()
    g = build(cfg, args.cache)
    t_build = time.time() - t0
    t0 = time.time()
    cpath = pack_cache_path(cfg, args.cache)
    dg = None
    if os.path.exists(cpath):
        try:
            dg = load_cpg(cpath)
        except Exception:
            dg = None
    if dg is None:
        dg = pack_cpg(g)
        try:
            save_pack_cache(dg, cpath, round(time.time() - t0, 1))
        except Exception:
            pass
    t_pack = time.time() - t0
    base = dict(n=g.n, nnz=g.nnz, k=args.k, build_s=round(t_build, 1),
                pack_s=round(t_pack, 1))

    # whole df64 pipeline (warm the compile first)
    r = expm_action_df(g, None, args.k, dg=dg, log_scale=True)
    t0 = time.time()
    r = expm_action_df(g, None, args.k, dg=dg, log_scale=True)
    t_whole = time.time() - t0
    print(json.dumps(dict(base, study="europe_df64_whole",
                          whole_s=round(t_whole, 2),
                          ans_norm=float(np.linalg.norm(r.ans)),
                          log_scale=round(float(r.log_scale), 4),
                          note="two-pass Q-free df64, one chip, O(n) "
                               "device memory; ref ran this scale at "
                               "k=20 f64 via streaming-Q")), flush=True)

    # self-consistency k vs k+10 from ONE decomposition
    t0 = time.time()
    _, diffs = expm_action_ks_df(g, [args.k, args.k + 10], dg=dg,
                                 log_scale=True)
    t_ks = time.time() - t0
    print(json.dumps(dict(base, study="europe_df64_self_consistency",
                          rel_diff=float(f"{diffs[args.k]:.3e}"),
                          vs_k=args.k + 10, wall_s=round(t_ks, 2))),
          flush=True)

    # checkpointed pass 1 at full scale + a genuine resume
    import jax.numpy as jnp

    x_hi = dg.realmask.astype(jnp.float32)
    x_lo = jnp.zeros_like(x_hi)
    ckpt = os.path.join(args.cache, "europe_df64_ck.npz")
    if os.path.exists(ckpt):
        os.unlink(ckpt)
    t0 = time.time()
    a1, b1, _ = lanczos_alphabeta_df_checkpointed(
        dg, x_hi, x_lo, args.k, checkpoint_path=ckpt,
        chunk=args.ckpt_chunk, interpret=interpret)
    t_ck = time.time() - t0
    snap = AlphaBetaDFCheckpoint.load(ckpt)
    snap_mb = sum(getattr(snap, f).nbytes
                  for f in AlphaBetaDFCheckpoint._FIELDS) / 1e6
    # rewind to the penultimate snapshot boundary and resume (skipped
    # when the run fits in one chunk — there is no mid-run state)
    n_chunks = -(-args.k // args.ckpt_chunk)
    j_mid = (n_chunks - 1) * args.ckpt_chunk
    if j_mid <= 0:
        print(json.dumps(dict(
            base, study="europe_df64_checkpoint",
            ckpt_chunk=args.ckpt_chunk,
            pass1_checkpointed_s=round(t_ck, 2),
            snapshot_mb=round(snap_mb, 1),
            note="single-chunk run: no mid-run snapshot to resume from")),
            flush=True)
        os.unlink(ckpt)
        return 0
    a_mid, b_mid, _ = lanczos_alphabeta_df_checkpointed(
        dg, x_hi, x_lo, j_mid, checkpoint_path=ckpt + ".mid",
        chunk=args.ckpt_chunk, interpret=interpret)
    mid = AlphaBetaDFCheckpoint.load(ckpt + ".mid")
    mid.k = args.k
    mid.ah = np.pad(mid.ah, (0, args.k - j_mid))
    mid.al = np.pad(mid.al, (0, args.k - j_mid))
    mid.bh = np.pad(mid.bh, (0, args.k - j_mid))
    mid.bl = np.pad(mid.bl, (0, args.k - j_mid))
    # fingerprint embeds k; recompute by writing under the full-k run's
    mid.fingerprint = snap.fingerprint
    mid.save(ckpt)
    t0 = time.time()
    a2, b2, _ = lanczos_alphabeta_df_checkpointed(
        dg, x_hi, x_lo, args.k, checkpoint_path=ckpt,
        chunk=args.ckpt_chunk, interpret=interpret)
    t_resume = time.time() - t0
    identical = bool(
        np.array_equal(np.asarray(a1[0]), np.asarray(a2[0]))
        and np.array_equal(np.asarray(a1[1]), np.asarray(a2[1]))
        and np.array_equal(np.asarray(b1[0]), np.asarray(b2[0]))
        and np.array_equal(np.asarray(b1[1]), np.asarray(b2[1])))
    print(json.dumps(dict(
        base, study="europe_df64_checkpoint",
        ckpt_chunk=args.ckpt_chunk,
        pass1_checkpointed_s=round(t_ck, 2),
        snapshot_mb=round(snap_mb, 1),
        resume_from_j=j_mid,
        resume_s=round(t_resume, 2),
        resume_bit_identical=identical,
        note="snapshot D2H rides the testbed tunnel (~100 MB/s); a "
             "host-local chip pays ~1% of the snapshot wall")),
        flush=True)
    for p in (ckpt, ckpt + ".mid"):
        if os.path.exists(p):
            os.unlink(p)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
