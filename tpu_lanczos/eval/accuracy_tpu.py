"""TPU-hardware accuracy study: f32 vs df64 pipelines vs the f64 oracle.

The reference's accuracy record is the CUDA-vs-serial rel-norm at f64,
3e-16..9e-13 (parallel-final/output/final_output1.txt:31,63,95); the
north-star target is <=1e-10 (BASELINE.json).  This module measures, on
the real TPU chip, the end-to-end relative error of

- the f32 two-pass pipeline (``expm_action(..., low_mem=True)``), and
- the df64 double-word pipeline (``core.lanczos_df.expm_action_df``)

against the host float64 oracle (eval/oracle.py), plus the wall cost of
each so the accuracy/means trade is recorded honestly (docs/ACCURACY.md).

Run: ``python -m tpu_lanczos.eval.accuracy_tpu [--n 1000000] [--m 10]
[--k 50]`` — one JSON line per pipeline.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--m", type=int, default=10)
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cache", default=".bench_cache")
    args = ap.parse_args(argv)

    import sys

    from tpu_lanczos.eval import oracle
    from tpu_lanczos.core.pipeline import expm_action
    from tpu_lanczos.core.lanczos_df import expm_action_df
    from tpu_lanczos.utils import enable_heap_reuse

    enable_heap_reuse()

    os.makedirs(args.cache, exist_ok=True)
    # delegate to bench.py's cached loader (one flagship-graph key)
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if root not in sys.path:
        sys.path.insert(0, root)
    import bench

    g = bench.load_graph(args.n, args.m, args.seed)

    x = np.ones(g.n, np.float64)
    t0 = time.time()
    # shifted oracle: the compare below stays finite for any spectrum
    ref_s, shift_ref = oracle.expm_action_shifted(g, x, args.k)
    t_oracle = time.time() - t0

    dg = None
    from tpu_lanczos.kernels.cpg import PACK_VERSION, load_cpg, pack_cpg

    cpath = os.path.join(
        args.cache,
        f"cpg_{args.n}_{args.m}_{args.seed}_v{PACK_VERSION}_sub512.npz")
    import jax

    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if on_tpu and os.path.exists(cpath):
        dg = load_cpg(cpath)
    if dg is None:
        dg = pack_cpg(g, sub=512)
        if on_tpu:
            from tpu_lanczos.kernels.cpg import save_cpg

            try:
                save_cpg(dg, cpath)  # the check above can now ever hit
            except Exception:
                pass

    base = dict(backend=jax.default_backend(), n=g.n, nnz=g.nnz, k=args.k,
                oracle_s=round(t_oracle, 1))

    # f32 two-pass (compile, then timed run); compare on the oracle's
    # SHIFTED scale — full_ans() materializes e^shift in f32 and
    # overflows past lambda_max ~ 88 under value-based casting
    r32 = expm_action(g, None, args.k, dg=dg, low_mem=True, log_scale=True)
    t0 = time.time()
    r32 = expm_action(g, None, args.k, dg=dg, low_mem=True, log_scale=True)
    t32 = time.time() - t0
    a32 = r32.ans.astype(np.float64) * np.exp(
        float(r32.log_scale) - shift_ref)
    err32 = oracle.rel_error(a32, ref_s)
    print(json.dumps(dict(base, pipeline="f32_two_pass", wall_s=round(t32, 3),
                          rel_err=float(f"{err32:.3e}"))), flush=True)

    # df64 two-pass (same shifted-scale compare)
    rdf = expm_action_df(g, None, args.k, dg=dg, log_scale=True)
    t0 = time.time()
    rdf = expm_action_df(g, None, args.k, dg=dg, log_scale=True)
    tdf = time.time() - t0
    adf = rdf.ans * np.exp(float(rdf.log_scale) - shift_ref)
    errdf = oracle.rel_error(adf, ref_s)
    print(json.dumps(dict(base, pipeline="df64_two_pass", wall_s=round(tdf, 3),
                          rel_err=float(f"{errdf:.3e}"))), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
