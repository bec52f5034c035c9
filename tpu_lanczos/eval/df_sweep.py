"""df64 convergence-vs-k sweep on TPU hardware.

The reference's signature accuracy artifact is its k-sweep on
NotreDame_yeast (n=2114, E=2277): rel error 2.14 at k=5 -> 9.3e-4 at
k=10 -> 3.5e-11 at k=20 -> ~4e-15 plateau at k>=25
(serial/output/numerical_test_output.txt; grid in
tests/numerical_test.sh:5).  This reproduces the study on hardware with
the df64 (two-float32) pipeline: same-scale generated graph, ground
truth by dense f64 eigendecomposition of A itself (the data/ eigenpairs
are not redistributable), every k answered from ONE decomposition
(expm_action_ks_df's multi-answer recombine).

The f32 pipeline's curve is recorded alongside: it plateaus at its
~1e-7 arithmetic floor, which is precisely the gap df64 exists to
close (k_sweep_r3.jsonl measured 4.9e-7 at the same scale).

Run: ``python -m tpu_lanczos.eval.df_sweep``; one JSON line per k.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

KS = [5, 10, 15, 20, 25, 30, 40, 50, 75, 100]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2114)
    ap.add_argument("--e", type=int, default=2277)
    ap.add_argument("--seed", type=int, default=1234)
    args = ap.parse_args(argv)

    from tpu_lanczos.core.lanczos_df import expm_action_ks_df
    from tpu_lanczos.core.pipeline import expm_action_ks
    from tpu_lanczos.eval import oracle
    from tpu_lanczos.graphs import generators
    from tpu_lanczos.kernels.cpg import pack_cpg
    from tpu_lanczos.utils import enable_compile_cache

    enable_compile_cache()
    g = generators.uniform_random(args.n, args.e, seed=args.seed)
    x = np.ones(g.n)
    truth = oracle.expm_action_dense(g, x)  # exact to f64 roundoff
    tn = np.linalg.norm(truth)
    dg = pack_cpg(g)

    t0 = time.time()
    res_df, diffs_df = expm_action_ks_df(g, KS, dg=dg)
    t_df = time.time() - t0
    t0 = time.time()
    res_f32, _ = expm_action_ks(g, KS, dg=dg)
    t_f32 = time.time() - t0

    import jax

    backend = jax.default_backend()
    for k in KS:
        err_df = float(np.linalg.norm(res_df[k].ans - truth) / tn)
        err_f32 = float(
            np.linalg.norm(res_f32[k].ans.astype(np.float64) - truth) / tn)
        print(json.dumps(dict(
            study="k_sweep_df64", k=k, n=g.n, nnz=g.nnz,
            rel_err_df64=float(f"{err_df:.3e}"),
            rel_err_f32=float(f"{err_f32:.3e}"),
            diff_vs_kmax_df64=float(f"{diffs_df[k]:.3e}"),
            backend=backend,
        )), flush=True)
    print(f"df64 sweep {t_df:.2f}s, f32 sweep {t_f32:.2f}s "
          f"(one decomposition each, incl. compile)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
