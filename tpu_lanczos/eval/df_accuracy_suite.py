"""Per-class df64 hardware accuracy: one committed row per suite config.

The reference committed an f64 CUDA-vs-serial rel-norm for EVERY graph
it benchmarked (parallel-final/output/final_output1.txt:31,63,95,127,
223,255,287 — 3e-16..9e-13).  The suite's rel_err column is f32
(1e-5..5e-4); this runner produces the f64-grade twin for every class:

- n <= ORACLE_N_MAX: the df64 pipeline (core/lanczos_df.expm_action_df)
  vs the host f64 oracle, on the oracle's shifted scale (finite even
  when e^lambda_max overflows f64).  Reuses the suite's cached oracle
  answers (same file key).
- larger classes (no affordable f64 oracle): df64 k-self-consistency
  ||ans_k - ans_{k+10}|| / ||ans_{k+10}|| from ONE multi-answer df64
  decomposition (expm_action_ks_df) — the reference's own Table-5
  convergence metric (write_ans diffs) evaluated at df64 precision.

Run: ``python -m tpu_lanczos.eval.df_accuracy_suite [--k 50] [--only X]``
— one JSON line per class, appendable to bench_results.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def run_one(cfg, k: int, cache_dir: str):
    import jax

    from tpu_lanczos.core.lanczos_df import expm_action_df, expm_action_ks_df
    from tpu_lanczos.eval.bench_suite import (
        ORACLE_N_MAX, build, oracle_cache_path, pack_cache_path,
        save_pack_cache,
    )
    from tpu_lanczos.kernels.cpg import load_cpg, pack_cpg

    t0 = time.time()
    g = build(cfg, cache_dir)
    t_build = time.time() - t0

    t0 = time.time()
    cpath = pack_cache_path(cfg, cache_dir)
    dg = None
    if os.path.exists(cpath):
        try:
            dg = load_cpg(cpath)
        except Exception:
            dg = None
    if dg is None:
        dg = pack_cpg(g, **(cfg.get("pack") or {}))
        try:
            save_pack_cache(dg, cpath, round(time.time() - t0, 1))
        except Exception:
            pass
    t_pack = time.time() - t0

    row = dict(name=cfg["name"], n=g.n, nnz=g.nnz, k=k,
               backend=jax.default_backend(),
               build_s=round(t_build, 1), pack_s=round(t_pack, 1))

    if g.n <= ORACLE_N_MAX:
        t0 = time.time()
        opath = oracle_cache_path(cfg, k, cache_dir)
        if os.path.exists(opath):
            z = np.load(opath)
            ref, s_ref = z["ans"], float(z["shift"])
        else:
            from tpu_lanczos.eval import oracle as _oracle

            ref, s_ref = _oracle.expm_action_shifted(g, np.ones(g.n), k)
            np.savez(opath + ".tmp.npz", ans=ref, shift=s_ref)
            os.replace(opath + ".tmp.npz", opath)
        t_oracle = time.time() - t0
        t0 = time.time()
        rdf = expm_action_df(g, None, k, dg=dg, log_scale=True)
        t_df = time.time() - t0
        a = rdf.ans * np.exp(float(rdf.log_scale) - s_ref)
        err = float(np.linalg.norm(a - ref) / np.linalg.norm(ref))
        row.update(pipeline="df64_two_pass", df64_rel_err=float(f"{err:.3e}"),
                   err_ref="oracle_f64_shifted", oracle_s=round(t_oracle, 1),
                   df64_s=round(t_df, 2))
    else:
        t0 = time.time()
        _, diffs = expm_action_ks_df(g, [k, k + 10], dg=dg, log_scale=True)
        t_df = time.time() - t0
        row.update(pipeline="df64_two_pass",
                   df64_rel_err=float(f"{diffs[k]:.3e}"),
                   err_ref=f"df64_self_k{k + 10}", df64_s=round(t_df, 2))
    return row


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--only", default=None,
                    help="substring filter on config names")
    ap.add_argument("--cache", default=".bench_cache")
    args = ap.parse_args(argv)

    from tpu_lanczos.eval.bench_suite import CONFIGS
    from tpu_lanczos.utils import enable_compile_cache, enable_heap_reuse

    enable_compile_cache()
    enable_heap_reuse()
    os.makedirs(args.cache, exist_ok=True)
    for cfg in CONFIGS:
        if args.only and args.only not in cfg["name"]:
            continue
        row = run_one(cfg, args.k, args.cache)
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
