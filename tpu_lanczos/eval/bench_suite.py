"""Benchmark suite mirroring the reference's graph classes.

The reference benchmarked nine graphs (BASELINE.md): power-law
(Barabasi), social (coPapers/LiveJournal), and mesh/road-class
(adaptive, channel, hugetrace, road_central, europe_osm).  Their data
files are not redistributable, so this suite *generates* class-matched
stand-ins at matched n/nnz scales and reports the same headline
quantity: Lanczos decomposition time at k=50 (plus effective nnz/s and
% of the v5e HBM roofline for the SpMV's index traffic).

Run: ``python -m tpu_lanczos.eval.bench_suite [--quick]``; each result
is one JSON line, human table at the end.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

# (name, builder kwargs, reference analog + its CUDA seconds at k=50 and
#  k=100 where the reference recorded them: final_output1.txt:16-272
#  (k=50) and :289-480 (k=100))
CONFIGS = [
    dict(name="ba_1M_m10", kind="barabasi", n=1_000_000, m=10,
         analog="bn1000000e9999944", ref_s=0.4166, ref_s_k100=0.8096,
         pack=dict(sub=512, theta=150)),
    dict(name="uniform_1M_e10M", kind="uniform", n=1_000_000, e=10_000_000,
         analog=None, ref_s=None, pack=dict(sub=512, order="degree")),
    dict(name="stencil_1400", kind="stencil", side=1400,
         analog="mesh-class (California-adaptive scale)", ref_s=None),
    dict(name="stencil_2600", kind="stencil", side=2600,
         analog="adaptive n=6.8M nnz=27M", ref_s=1.2654, ref_s_k100=2.4555),
    dict(name="stencil_4000", kind="stencil", side=4000,
         analog="road_central n=14M nnz=34M / hugetrace n=16M nnz=48M",
         ref_s=2.9778),  # mean of road_central 2.7427 and hugetrace 3.2129
    dict(name="channel_3d", kind="stencil3d", nx=500, ny=100, nz=100,
         analog="channel-500x100x100-b050 n=4.8M nnz=85M (CFD mesh, "
                "uniform degree ~18)",
         ref_s=0.4809, ref_s_k100=1.8055),
    dict(name="copapers_540k", kind="clique", n=540_000, papers=1_240_000,
         analog="coPapersDBLP n=540K nnz=30M deg~56 — clique-union "
                "co-authorship with community locality, the graph class "
                "the reference actually benchmarked (its best GPU case)",
         ref_s=0.1200, ref_s_k100=0.3276, pack=dict(sub=128)),
    dict(name="rmat_540k_e15M", kind="rmat", n=540_000, e=15_250_000,
         analog="coPapersDBLP scale with R-MAT social-graph skew instead "
                "of clique locality (strictly harder layout stress case)",
         # sub=256 wins even with the masked second gather: sub=512 cut
         # tiles only 1.6x here while cyc/tile doubled (measured 0.2096s
         # vs 0.1638s, round 3)
         ref_s=0.1200, ref_s_k100=0.3276, pack=dict(sub=256, theta=300)),
    dict(name="rmat_4M_e35M", kind="rmat", n=4_000_000, e=34_700_000,
         analog="com-LiveJournal n=4.0M nnz=69M (social; R-MAT carries "
                "the real graph's skew + community structure)",
         ref_s=1.3245, ref_s_k100=2.5756, pack=dict(sub=512, theta=300)),
    dict(name="ba_4M_m9", kind="barabasi", n=4_000_000, m=9,
         analog="com-LiveJournal scale, pure preferential-attachment "
                "expander (no community structure: adversarial stress "
                "case, strictly harder than the real graph)",
         ref_s=1.3245, ref_s_k100=2.5756, pack=dict(sub=512, theta=200)),
]

HBM_GBPS = 819.0  # v5e

# per-row accuracy: the f64 numpy oracle is affordable up to ~2M nodes
# (bn1M measured 84-108 s host-side, cached per (config, k)); beyond it
# the df64 hardware pipeline is the truth (9.7e-14..2.7e-13 vs the f64
# oracle where both exist — bench_results/accuracy_tpu.jsonl)
ORACLE_N_MAX = 2_000_000


def _accuracy(cfg, g, dg, k, cache_dir):
    """Hardware rel-norm-of-diff for this row — the reference committed
    one for every graph it benchmarked (final_output1.txt:31,63,95,127,
    223,255,287).  Returns (rel_err, err_ref, err_s).

    n <= ORACLE_N_MAX: f32 pipeline vs the host f64 oracle (cached).
    Larger: f32 vs the df64 double-word pipeline on the same chip
    (self-check; df64 itself is oracle-validated at 1M scale)."""
    import os

    from tpu_lanczos.core.pipeline import expm_action

    t0 = time.time()
    r32 = expm_action(g, None, k, dg=dg, low_mem=True, log_scale=True)
    a32 = r32.ans.astype(np.float64)
    s32 = float(r32.log_scale)
    if g.n <= ORACLE_N_MAX:
        from tpu_lanczos.eval import oracle as _oracle

        # shifted oracle: ref = e^{A-sI}.x with s returned separately, so
        # the compare stays finite even when lambda_max > 709 and e^A.x
        # itself overflows f64 (rmat hubs reach lambda_max ~ sqrt(d_max)
        # well past that; the reference's own double pipeline printed
        # inf/nan in this regime, final_output1.txt:154-159)
        opath = oracle_cache_path(cfg, k, cache_dir)
        if os.path.exists(opath):
            z = np.load(opath)
            ref, s_ref = z["ans"], float(z["shift"])
        else:
            ref, s_ref = _oracle.expm_action_shifted(g, np.ones(g.n), k)
            np.savez(opath + ".tmp.npz", ans=ref, shift=s_ref)
            os.replace(opath + ".tmp.npz", opath)
        ref_norm = float(np.linalg.norm(ref))
        # rescale the f32 answer onto the oracle's shifted scale: the
        # exponent difference s32 - s_ref is O(roundoff in lambda_max),
        # so the factor is O(1) and finite by construction
        a = a32 * np.exp(s32 - s_ref)
        err = float(np.linalg.norm(a - ref) / ref_norm)
        return err, "oracle_f64", round(time.time() - t0, 1)
    from tpu_lanczos.core.lanczos_df import expm_action_df

    rdf = expm_action_df(g, None, k, dg=dg, log_scale=True)
    adf = rdf.ans
    sdf = float(rdf.log_scale)
    a = a32 * np.exp(s32 - sdf)  # common log-scale
    err = float(np.linalg.norm(a - adf) / np.linalg.norm(adf))
    return err, "df64_selfcheck", round(time.time() - t0, 1)


def oracle_cache_path(cfg, k: int, cache_dir: str) -> str:
    """Oracle-answer cache key: carries every generator parameter like
    the graph cache (build()) does, so retuning a config's size under
    the same name cannot serve a stale oracle."""
    import os

    gen_keys = ("kind", "n", "m", "e", "side", "nx", "ny", "nz", "papers")
    tag = "_".join(f"{key}{cfg[key]}" for key in gen_keys if key in cfg)
    return os.path.join(cache_dir,
                        f"oracle_{cfg['name']}_{tag}_k{k}_s.npz")


def pack_cache_path(cfg, cache_dir=".bench_cache"):
    """Canonical pack-cache file for a suite config — the single source
    of the filename template (prewarm writes it, run_one reads it)."""
    import os

    from tpu_lanczos.kernels.cpg import PACK_VERSION

    pack_kw = cfg.get("pack") or {}
    tag = "".join(f"_{key}{val}" for key, val in sorted(pack_kw.items()))
    return os.path.join(
        cache_dir, f"suite_{cfg['name']}_cpg_v{PACK_VERSION}{tag}.npz")


def save_pack_cache(dg, path, pack_s):
    """save_cpg + embed the uncached pack wall time for reporting."""
    from tpu_lanczos.kernels.cpg import save_cpg

    save_cpg(dg, path)
    z = dict(np.load(path))
    z["pack_s"] = pack_s
    np.savez(path, **z)


def build(cfg, cache_dir=".bench_cache"):
    """Generate the config's graph, cached as raw CSR — generation is
    deterministic per config (seed=0 throughout) and the 4M-node
    power-law graphs cost minutes to regenerate.  The cache key carries
    every generator parameter, so retuning a config's size under the
    same name cannot serve the stale graph."""
    import os

    from tpu_lanczos.graphs.csr import CSRGraph

    gen_keys = ("kind", "n", "m", "e", "side", "nx", "ny", "nz", "papers")
    tag = "_".join(f"{k}{cfg[k]}" for k in gen_keys if k in cfg)
    path = os.path.join(cache_dir, f"graph_{cfg['name']}_{tag}.npz")
    if os.path.exists(path):
        try:
            z = np.load(path)
            return CSRGraph(indptr=z["indptr"], indices=z["indices"],
                            n=int(z["n"]))
        except Exception:
            pass  # truncated/corrupt cache: regenerate and overwrite
    g = _generate(cfg)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        # tmp + atomic replace: an interrupted save must not leave a
        # truncated .npz that poisons every later run
        np.savez(path + ".tmp.npz", indptr=g.indptr, indices=g.indices,
                 n=g.n)
        os.replace(path + ".tmp.npz", path)
    except Exception:
        pass
    return g


def _generate(cfg):
    from tpu_lanczos.graphs import generators

    if cfg["kind"] == "barabasi":
        return generators.barabasi_albert(cfg["n"], cfg["m"], seed=0)
    if cfg["kind"] == "uniform":
        return generators.uniform_random(cfg["n"], cfg["e"], seed=0,
                                         use_native=True)
    if cfg["kind"] == "stencil":
        return generators.stencil_2d(cfg["side"])
    if cfg["kind"] == "stencil3d":
        return generators.stencil_3d(cfg["nx"], cfg["ny"], cfg["nz"])
    if cfg["kind"] == "rmat":
        return generators.rmat(cfg["n"], cfg["e"], seed=0)
    if cfg["kind"] == "clique":
        return generators.clique_union(cfg["n"], cfg["papers"], seed=0)
    raise ValueError(cfg["kind"])


def run_one(cfg, k=50, reps=3, cache_dir=".bench_cache", accuracy=True):
    import os

    import jax
    import jax.numpy as jnp

    from tpu_lanczos.core.pipeline import best_device_pack
    from tpu_lanczos.core.lanczos import lanczos
    from tpu_lanczos.utils import enable_heap_reuse

    enable_heap_reuse()  # multi-GB pack loads/builds fault pages once
    t0 = time.time()
    g = build(cfg, cache_dir)
    t_build = time.time() - t0
    t0 = time.time()
    # pack cache: packing is deterministic per (config, code version), so
    # k-sweeps and re-runs reuse it; pack_s is reported from the original
    # uncached pack (recorded beside the cache)
    os.makedirs(cache_dir, exist_ok=True)
    pack_kw = cfg.get("pack") or {}
    cpath = pack_cache_path(cfg, cache_dir)
    dg = None
    t_pack = None
    if os.path.exists(cpath) and jax.default_backend() not in ("cpu", "gpu"):
        try:
            from tpu_lanczos.kernels.cpg import load_cpg

            dg = load_cpg(cpath)
            z = np.load(cpath)
            t_pack = float(z["pack_s"]) if "pack_s" in z else -1.0
        except Exception:
            dg = None
    if dg is None:
        if pack_kw and jax.default_backend() not in ("cpu", "gpu"):
            from tpu_lanczos.kernels.cpg import pack_cpg

            dg = pack_cpg(g, **pack_kw)
        else:
            dg = best_device_pack(g)
        t_pack = time.time() - t0
        if type(dg).__name__ == "CPGGraph":
            try:
                save_pack_cache(dg, cpath, t_pack)
            except Exception:
                pass
    x = jnp.asarray(dg.permute_in(np.ones(g.n), np.float32))

    def run():
        st = lanczos(dg, x, k)
        return np.asarray(st.alpha)

    t0 = time.time()
    alpha = run()
    t_compile = time.time() - t0
    assert np.all(np.isfinite(alpha))
    # each sample queues BATCH async dispatches and syncs once: the
    # testbed's tunnel charges ~25-30 ms per host sync (an artifact of
    # the remote harness, not the program — the reference's sync rode
    # local PCIe), which single-run timing would bill to every run.
    # Each in-flight dispatch holds its own (k, n_pad) q_basis, so the
    # batch shrinks on large graphs to stay inside HBM.
    q_bytes = k * getattr(dg, "n_pad", g.n) * x.dtype.itemsize
    BATCH = max(1, min(3, int(5e9 // max(q_bytes, 1))))

    def sample(batch):
        t0 = time.time()
        sts = [lanczos(dg, x, k) for _ in range(batch)]
        np.asarray(sts[-1].alpha)  # device executes in order: syncs all
        del sts  # free the batch's q_basis buffers before the next one
        return (time.time() - t0) / batch

    times = []
    for _ in range(reps):
        try:
            times.append(sample(BATCH))
        except Exception as e:  # RESOURCE_EXHAUSTED at the batched sync:
            # the q_basis-budget heuristic under-counted pack + x HBM
            # residency — fall back to single-dispatch sampling for this
            # config rather than aborting the whole suite run.  Drop any
            # amortized samples already taken: the two protocols differ
            # by the per-sync tunnel RTT, so mixing them in one median
            # would misreport both (and the recorded batch field).
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            BATCH = 1
            times = []
            times.append(sample(1))
    t = float(np.median(times))
    # single-dispatch protocol alongside: one dispatch, one sync — bills
    # the testbed tunnel's ~25-30 ms host-sync RTT to the run (closest to
    # the reference's local-PCIe cudaEvent timing; both are recorded so
    # headline claims can cite either)
    t_single = float(np.median([sample(1) for _ in range(2)]))

    # index-traffic roofline: bytes the SpMV must move per iteration
    fmt = type(dg).__name__
    tiles = None
    cyc_per_tile = None
    if fmt == "CPGGraph":
        # BYTES, not element counts: l2 is int16 for sub > 256 packs
        # (2 B/element), so nbytes is the honest traffic figure
        idx_bytes = sum(
            int(np.asarray(lv["l1"]).nbytes)
            + int(np.asarray(lv["l2"]).nbytes)
            for lv in dg.levels
        )
        # the honest per-tile metric: measured cycles per executed tile
        # vs the ~500-cyc routing-chain floor (docs/DESIGN.md)
        tiles = int(dg.total_tiles)
        cyc_per_tile = round(t * 0.94e9 / max(k * tiles, 1))
    else:
        idx_bytes = g.nnz * 8
    roofline_s = k * idx_bytes / (HBM_GBPS * 1e9)
    ref_key = "ref_s" if k == 50 else ("ref_s_k100" if k == 100 else None)
    ref_s = cfg.get(ref_key) if ref_key else None
    rel_err = err_ref = err_s = None
    if accuracy and fmt == "CPGGraph":
        try:
            rel_err, err_ref, err_s = _accuracy(cfg, g, dg, k, cache_dir)
        except Exception as e:  # accuracy is additive: never lose the row
            err_ref = f"failed: {type(e).__name__}"
    out = dict(
        name=cfg["name"], n=g.n, nnz=g.nnz, fmt=fmt, k=k,
        build_s=round(t_build, 1), pack_s=round(t_pack, 1),
        compile_s=round(t_compile, 1), lanczos_s=round(t, 4),
        lanczos_s_single=round(t_single, 4),
        protocol=dict(timing="amortized_batch", batch=BATCH, reps=reps),
        gnnz_per_s=round(g.nnz * k / t / 1e9, 2),
        roofline_pct=round(100 * roofline_s / t, 1),
        tiles=tiles, cyc_per_tile=cyc_per_tile,
        rel_err=float(f"{rel_err:.3e}") if rel_err is not None else None,
        err_ref=err_ref, err_s=err_s,
        analog=cfg.get("analog"), ref_s=ref_s,
        vs_ref=round(ref_s / t, 2) if ref_s else None,
    )
    print(json.dumps(out), flush=True)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="only the two smallest configs")
    ap.add_argument("--only", help="comma-separated config names")
    ap.add_argument("--k", type=int, default=50,
                    help="krylov dim (the reference recorded 50 and 100)")
    ap.add_argument("--no-acc", action="store_true",
                    help="skip the per-row hardware accuracy column")
    args = ap.parse_args(argv)
    from tpu_lanczos.utils import enable_compile_cache

    enable_compile_cache()
    configs = CONFIGS[:1] + CONFIGS[2:3] if args.quick else CONFIGS
    if args.only:
        names = set(args.only.split(","))
        configs = [c for c in CONFIGS if c["name"] in names]
    results = [run_one(c, k=args.k, accuracy=not args.no_acc)
               for c in configs]
    print(f"\n{'name':22} {'n':>10} {'nnz':>11} {'fmt':9} "
          f"{'lanczos_s':>9} {'Gnnz/s':>7} {'vs_ref':>7} {'rel_err':>9}",
          file=sys.stderr)
    for r in results:
        err = f"{r['rel_err']:.1e}" if r.get("rel_err") is not None else "-"
        print(f"{r['name']:22} {r['n']:>10} {r['nnz']:>11} {r['fmt']:9} "
              f"{r['lanczos_s']:>9} {r['gnnz_per_s']:>7} "
              f"{r['vs_ref'] if r['vs_ref'] else '-':>7} {err:>9}",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
