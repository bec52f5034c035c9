"""Fused single-query serving measurement: the whole-pipeline number
with ZERO mid-pipeline host syncs.

Round-4 stage table (docs/DESIGN.md): after Lanczos the host-eig split
pays a coefficient fetch sync (0.028 s) AND a separate GEMV
dispatch+fence (0.027 s) through the tunnel; the full-answer D2H adds
0.25 s.  ``expm_action_summary(eig_impl="device")`` folds Lanczos +
device eigensolve + GEMV + top-k into ONE program with a single O(topk)
sync — this script measures that path on the headline graph under the
single-run protocol (every host sync billed) and records the accuracy
delta against the host-LAPACK path alongside.

Run: ``python -m tpu_lanczos.eval.fused_serving [--k 50] [--reps 5]``
— prints one JSON line (appendable to bench_results/suite_full.jsonl as
the ``whole_fused_topk_k50`` row).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

REF_WHOLE_S = 0.455634  # 'Entire algorithm' CUDA, final_output1.txt:20


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--m", type=int, default=10)
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--topk", type=int, default=20)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cache", default=".bench_cache")
    args = ap.parse_args(argv)

    import sys

    from tpu_lanczos.core.pipeline import expm_action_summary
    from tpu_lanczos.utils import enable_compile_cache, enable_heap_reuse

    enable_compile_cache()
    enable_heap_reuse()

    # delegate to bench.py's cached loader (ONE definition of the
    # flagship graph key, like eval/stochastic_bench does)
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if root not in sys.path:
        sys.path.insert(0, root)
    import bench

    g = bench.load_graph(args.n, args.m, 0)

    import jax

    from tpu_lanczos.kernels.cpg import PACK_VERSION, load_cpg, pack_cpg

    dg = None
    cpath = os.path.join(
        args.cache,
        f"cpg_{args.n}_{args.m}_0_v{PACK_VERSION}_sub512.npz")
    if jax.default_backend() not in ("cpu", "gpu") and os.path.exists(cpath):
        dg = load_cpg(cpath)
    if dg is None:
        dg = pack_cpg(g, sub=512)

    # warm both paths (compile + pack H2D)
    s_dev = expm_action_summary(g, k=args.k, topk=args.topk, dg=dg,
                                eig_impl="device")
    s_host = expm_action_summary(g, k=args.k, topk=args.topk, dg=dg,
                                 eig_impl="host")

    # single-run protocol: full wall per query, every sync billed
    walls_dev, walls_host = [], []
    for _ in range(args.reps):
        t0 = time.time()
        s_dev = expm_action_summary(g, k=args.k, topk=args.topk, dg=dg,
                                    eig_impl="device")
        walls_dev.append(time.time() - t0)
        t0 = time.time()
        s_host = expm_action_summary(g, k=args.k, topk=args.topk, dg=dg,
                                     eig_impl="host")
        walls_host.append(time.time() - t0)

    # accuracy delta: device eigh (f32 QDWH) vs host LAPACK f64 on the
    # SAME decomposition's outputs — compare on a common log-scale
    v_dev = np.asarray(s_dev.top_values, np.float64) * np.exp(
        s_dev.log_scale - s_host.log_scale)
    v_host = np.asarray(s_host.top_values, np.float64)
    val_rel = float(np.linalg.norm(v_dev - v_host)
                    / np.linalg.norm(v_host))
    node_overlap = len(set(s_dev.top_nodes.tolist())
                       & set(s_host.top_nodes.tolist()))

    med_dev = float(np.median(walls_dev))
    med_host = float(np.median(walls_host))
    row = dict(
        study=f"bn1M_whole_fused_topk_k{args.k}",
        whole_s=round(med_dev, 4),
        whole_s_all=[round(w, 4) for w in walls_dev],
        host_eig_whole_s=round(med_host, 4),
        host_eig_whole_s_all=[round(w, 4) for w in walls_host],
        ref_cuda_whole_s=REF_WHOLE_S,
        vs_ref=round(REF_WHOLE_S / med_dev, 3),
        topk=args.topk,
        topk_value_rel_diff=float(f"{val_rel:.3e}"),
        topk_node_overlap=f"{node_overlap}/{args.topk}",
        top_node=int(s_dev.top_nodes[0]),
        includes_compile=False,
        note=("ONE fused program (Lanczos + device eigh + GEMV + top-k),"
              " single O(topk) sync; single-run protocol incl. tunnel"
              " RTT; accuracy delta = device-eigh f32 floor vs host"
              " LAPACK f64 on the same pack"),
    )
    print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
