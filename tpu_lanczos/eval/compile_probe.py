"""Isolate the ba_4M first-call spike: compile vs H2D vs first run.

The suite's compile_s column is first-call wall time, which confounds
three terms: XLA+Mosaic compilation, the lazy H2D transfer of the pack
arrays (6.4 GB for ba_4M's lv1 — by far the largest pack in the suite),
and the first execution.  Round-3's verdict flagged ba_4M at 34.9 s
(k=50) / 66.8 s (k=100) vs <=15 s elsewhere without attribution.

This probe separates them:
  h2d       explicit jax.device_put of every pack array, fenced
  compile   jax.jit(...).lower().compile() — AOT, no execution
  first     first real execution after both (should ~= steady run)

Run: ``python -m tpu_lanczos.eval.compile_probe [--config ba_4M_m9]
[--k 50 100]``.  Prints one JSON line per (config, k).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="ba_4M_m9")
    ap.add_argument("--k", type=int, nargs="+", default=[50, 100])
    ap.add_argument("--no-cache", action="store_true",
                    help="skip enable_compile_cache (measure cold Mosaic)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu_lanczos.core.lanczos import lanczos
    from tpu_lanczos.eval.bench_suite import CONFIGS, build, pack_cache_path
    from tpu_lanczos.kernels.cpg import load_cpg
    from tpu_lanczos.utils import enable_compile_cache, enable_heap_reuse

    if not args.no_cache:
        enable_compile_cache()
    enable_heap_reuse()
    cfg = next(c for c in CONFIGS if c["name"] == args.config)

    t0 = time.time()
    g = build(cfg)
    dg = load_cpg(pack_cache_path(cfg))
    load_s = time.time() - t0
    print(f"load {load_s:.1f}s", file=sys.stderr)

    # 1. fence the pack's device arrays.  load_cpg already jnp.asarray'd
    # every leaf, which STARTS the async H2D at load time — so the
    # attribution is (load_s = disk read + transfer issue) and
    # (h2d_s = residual transfer wait); their SUM bounds disk+H2D, and
    # the compile/exec stages below are cleanly separated either way
    t0 = time.time()
    leaves = jax.tree_util.tree_leaves(dg)  # registered pytree
    jax.block_until_ready(leaves)
    h2d_s = time.time() - t0
    h2d_gb = sum(a.size * a.dtype.itemsize for a in leaves) / 1e9
    print(f"h2d residual wait {h2d_s:.1f}s ({h2d_gb:.2f} GB; transfers "
          "overlap the load phase)", file=sys.stderr)

    x = jnp.asarray(dg.permute_in(np.ones(g.n), np.float32))
    for k in args.k:
        # dg passes as a pytree ARGUMENT (like the production call) —
        # closing over it would bake 5 GB of constants into the HLO
        fn = jax.jit(lambda dgx, xx: lanczos(dgx, xx, k).alpha)
        t0 = time.time()
        lowered = fn.lower(dg, x)
        lower_s = time.time() - t0
        t0 = time.time()
        compiled = lowered.compile()
        compile_s = time.time() - t0
        t0 = time.time()
        alpha = np.asarray(compiled(dg, x))
        first_s = time.time() - t0
        assert np.all(np.isfinite(alpha))
        t0 = time.time()
        np.asarray(compiled(dg, x))
        steady_s = time.time() - t0
        row = dict(
            study=f"{args.config}_compile_probe_k{k}",
            h2d_s=round(h2d_s, 1), h2d_gb=round(h2d_gb, 2),
            lower_s=round(lower_s, 1), compile_s=round(compile_s, 1),
            first_exec_s=round(first_s, 2), steady_s=round(steady_s, 2),
            cache="off" if args.no_cache else "persistent",
            note=("AOT split of the suite's first-call compile_s column: "
                  "lazy pack H2D + XLA/Mosaic compile + first execution"),
        )
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
