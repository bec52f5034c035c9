"""Economics of the MXU dense-block hybrid, measured on real packs.

Verdict-6 experiment: route (128,128) adjacency blocks that are dense
enough as MXU matvecs (y_dslab += x_sslab @ A_blk, bf16 hi/lo split,
exact for 0/1 A) and keep the CPG gather fabric for the residual.

This scanner answers, per config and block threshold T, WITHOUT
building the kernel:
  - how many blocks carry >= T entries under the production pack's
    permutation, and what fraction of entries they cover;
  - how many tiles the CPG pack of the residual graph needs (real
    pack_cpg run, not a model);
  - the predicted iteration time: tiles * cyc_tile(sub) (DESIGN.md
    fitted model) + blocks * cyc_block (from eval/mxu_probe hardware
    measurement, ~250 cyc default) vs the production pack's tiles *
    cyc_tile.

Run: ``JAX_PLATFORMS=cpu python -m tpu_lanczos.eval.hybrid_scan
--config rmat_540k_e15M --T 256 512 1024``
Prints one JSON line per T.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _cyc_tile(sub):
    # the ONE fitted per-tile cost model lives in pack_scan (classic
    # layout); importing it keeps the two scanners comparable
    from tpu_lanczos.eval.pack_scan import cyc_per_tile

    return cyc_per_tile(sub)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="rmat_540k_e15M")
    ap.add_argument("--T", type=int, nargs="+", default=[256, 512, 1024])
    ap.add_argument("--cyc-block", type=float, default=250.0,
                    help="measured MXU+DMA cost per dense block "
                         "(eval/mxu_probe)")
    args = ap.parse_args(argv)

    from tpu_lanczos.eval.bench_suite import CONFIGS, build, pack_cache_path
    from tpu_lanczos.graphs.csr import CSRGraph
    from tpu_lanczos.kernels.cpg import pack_cpg
    from tpu_lanczos.utils import enable_heap_reuse

    enable_heap_reuse()
    cfg = next(c for c in CONFIGS if c["name"] == args.config)
    g = build(cfg)
    z = np.load(pack_cache_path(cfg))
    p = z["new_of_old"]
    n_pad = int(z["realmask"].shape[0])
    sub = int(z["sub"])
    layout = str(z["layout"]) if "layout" in z else "classic"
    assert layout == "classic", (
        "hybrid_scan's cost model and tile semantics are classic-layout "
        f"only (pack is {layout!r})")
    prod_tiles = sum(
        int(z[f"lv{i}_counts"].sum()) for i in range(int(z["n_levels"])))
    cyc_t = _cyc_tile(sub)
    base_cyc = prod_tiles * cyc_t

    deg = np.diff(g.indptr)
    dest = np.repeat(np.arange(g.n, dtype=np.int64), deg)
    src = g.indices.astype(np.int64)
    nb = (n_pad + 127) // 128
    key = (p[dest].astype(np.int64) // 128) * nb + (
        p[src].astype(np.int64) // 128)

    order = np.argsort(key, kind="stable")
    key_s = key[order]
    uniq, start_idx, cnt = np.unique(
        key_s, return_index=True, return_counts=True)

    for T in args.T:
        dense_m = cnt >= T
        n_blocks = int(dense_m.sum())
        covered = int(cnt[dense_m].sum())
        # mark the entries living in dense blocks
        in_dense = np.zeros(len(key_s), bool)
        for s, c in zip(start_idx[dense_m], cnt[dense_m]):
            in_dense[s:s + c] = True
        keep = np.ones(len(key), bool)
        keep[order[in_dense]] = False
        rd, rs = dest[keep], src[keep]
        # rebuild a CSR residual graph (entries already symmetric in
        # the expanded form; from_entries keeps them as-is)
        indptr = np.zeros(g.n + 1, np.int64)
        np.add.at(indptr, rd + 1, 1)
        np.cumsum(indptr, out=indptr)
        idx = np.empty(len(rd), g.indices.dtype)
        o2 = np.argsort(rd, kind="stable")
        idx[:] = rs[o2]
        res = CSRGraph(n=g.n, indptr=indptr.astype(g.indptr.dtype),
                       indices=idx)
        t0 = time.time()
        dgr = pack_cpg(res, sub=sub,
                       **{k: v for k, v in (cfg.get("pack") or {}).items()
                          if k != "sub"})
        pack_s = time.time() - t0
        res_tiles = int(dgr.total_tiles)
        hyb_cyc = res_tiles * cyc_t + n_blocks * args.cyc_block
        row = dict(
            study=f"{args.config}_hybrid_scan_T{T}",
            T=T, dense_blocks=n_blocks, entries_covered=covered,
            covered_pct=round(100 * covered / len(key), 1),
            prod_tiles=prod_tiles, residual_tiles=res_tiles,
            cyc_tile=round(cyc_t, 0), cyc_block=args.cyc_block,
            base_Mcyc=round(base_cyc / 1e6, 2),
            hybrid_Mcyc=round(hyb_cyc / 1e6, 2),
            speedup=round(base_cyc / hyb_cyc, 3),
            residual_pack_s=round(pack_s, 1),
            note="residual re-packed fresh (its own permutation); "
                 "dense blocks counted under the production permutation",
        )
        print(json.dumps(row), flush=True)
        del dgr
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
