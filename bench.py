"""Headline benchmark: Lanczos k=50 on the reference's flagship graph.

Reproduces the reference's headline configuration — Barabasi-Albert
n=1,000,000, m=10 (the 'bn1000000e9999944' graph), krylov_dim=50 — and
times the full Lanczos decomposition on the device, comparing against the
reference's CUDA time on an RTX 2080 Super: 0.4166 s
(parallel-final/output/final_output1.txt:16; BASELINE.md).

Prints ONE JSON line:
  {"metric": "lanczos_k50_bn1M", "value": <seconds>, "unit": "s",
   "vs_baseline": <ref_time / our_time>}   (>1 means faster than the ref)

Timing protocol: compile and H2D transfer excluded (first run warms the
jit cache); completion is forced by a host fetch of alpha (the
decomposition's output scalars), mirroring the reference's cudaEvent
bracketing of the decompose call (parallel-final/main.cu:115-121,
helpers.cu:14-29).  Each timing sample queues BATCH async dispatches and
syncs once: this testbed reaches the chip through a network tunnel whose
~25-30 ms host-sync round trip would otherwise be billed to every run —
an artifact of the remote harness, not of the program (the reference's
host sync rode local PCIe).  The median of 3 samples / BATCH is
reported.
"""

import json
import os
import sys
import time

import numpy as np

REF_CUDA_LANCZOS_S = 0.4166  # final_output1.txt:16 (k=50, double, RTX 2080S)
N, M, K, SEED = 1_000_000, 10, 50, 0
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_graph(n=N, m=M, seed=SEED):
    """Cached native-RNG BA graph (also reused by eval/stochastic_bench
    so every hardware record refers to the same flagship graph)."""
    from tpu_lanczos.graphs.csr import CSRGraph

    os.makedirs(CACHE, exist_ok=True)
    # cache key includes the generator implementation: the native RNG
    # stream differs from numpy's, so the two are distinct graphs
    p = os.path.join(CACHE, f"ba_{n}_{m}_{seed}_native.npz")
    if os.path.exists(p):
        z = np.load(p)
        return CSRGraph(indptr=z["indptr"], indices=z["indices"], n=int(z["n"]))
    from tpu_lanczos.graphs import generators

    t0 = time.time()
    g = generators.barabasi_albert(n, m, seed=seed, use_native=True)
    log(f"generated BA graph (native) in {time.time()-t0:.1f}s (nnz={g.nnz})")
    np.savez(p, indptr=g.indptr, indices=g.indices, n=g.n)
    return g


def main():
    import jax

    from tpu_lanczos.utils import enable_compile_cache, enable_heap_reuse

    enable_compile_cache()
    enable_heap_reuse()
    g = load_graph()
    from tpu_lanczos.core.pipeline import best_device_pack
    from tpu_lanczos.core.lanczos import lanczos
    import jax.numpy as jnp

    t0 = time.time()
    from tpu_lanczos.kernels.cpg import PACK_VERSION

    # sub=512 measured fastest for this power-law class on v5e (0.266s
    # vs 0.394s at the sub=256 auto-pick; bench_results/suite_full.jsonl)
    SUB = 512
    cpg_cache = os.path.join(
        CACHE, f"cpg_{N}_{M}_{SEED}_v{PACK_VERSION}_sub{SUB}.npz"
    )
    dg = None
    if jax.default_backend() not in ("cpu", "gpu") and os.path.exists(cpg_cache):
        from tpu_lanczos.kernels.cpg import load_cpg

        dg = load_cpg(cpg_cache)
    if dg is None:
        if jax.default_backend() not in ("cpu", "gpu"):
            from tpu_lanczos.kernels.cpg import pack_cpg, save_cpg

            dg = pack_cpg(g, sub=SUB)
            save_cpg(dg, cpg_cache)
        else:
            dg = best_device_pack(g)
    log(f"packed ({type(dg).__name__}) in {time.time()-t0:.1f}s")
    x = jnp.asarray(dg.permute_in(np.ones(g.n), np.float32))

    def run():
        st = lanczos(dg, x, K)
        alpha = np.asarray(st.alpha)  # forces completion through the tunnel
        return st, alpha

    t0 = time.time()
    st, alpha = run()
    log(f"first run (compile+exec): {time.time()-t0:.1f}s")
    assert np.all(np.isfinite(alpha)), "non-finite alpha"

    BATCH = 3  # async dispatches per sample, one sync (amortizes RTT)
    times = []
    for _ in range(3):
        t0 = time.time()
        sts = [lanczos(dg, x, K) for _ in range(BATCH)]
        np.asarray(sts[-1].alpha)  # device executes in order: syncs all
        del sts  # free the batch's q_basis buffers before the next one
        times.append((time.time() - t0) / BATCH)
    t = float(np.median(times))
    log(f"runs (per-dispatch, batch {BATCH}): {[round(x, 4) for x in times]}")
    log(f"nnz/s: {g.nnz * K / t / 1e9:.2f}G")

    print(json.dumps({
        "metric": "lanczos_k50_bn1M",
        "value": round(t, 4),
        "unit": "s",
        "vs_baseline": round(REF_CUDA_LANCZOS_S / t, 3),
    }))


if __name__ == "__main__":
    main()
