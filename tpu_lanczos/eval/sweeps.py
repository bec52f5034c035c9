"""Sweep harnesses — the reference's shell-script studies as one module.

- ``k_sweep``: accuracy/convergence vs Krylov dimension (reference:
  serial/tests/numerical_test.sh k-grid and parallel-final/final.sh
  cross-k ans comparisons, writeup Table 5);
- ``pack_sweep``: CPG pack parameters (theta x sub) vs tile count and
  device time (reference: parallel-mult-on-card/tests/linalg_test.sh
  rewriting lib/blocks.h per blocksize and rebuilding).

Both print one JSON line per point; run as
``python -m tpu_lanczos.eval.sweeps {k,pack} [options]``.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def k_sweep(n=2000, edges=8000, seed=1, ks=(5, 10, 15, 20, 25, 30, 40),
            dtype="float64"):
    """Relative error vs dense ground truth across k (small graphs), the
    analog of the reference's NotreDame_yeast analytic study
    (BASELINE.md: 2.14 @ k=5 -> ~4e-15 plateau @ k>=25)."""
    from tpu_lanczos.graphs import generators
    from tpu_lanczos.core.pipeline import expm_action
    from tpu_lanczos.eval import oracle

    # f64 requires jax x64 — without it jnp silently truncates every
    # array to f32 and the study floors at ~5e-7 instead of ~1e-14
    # (the CLI enables this the same way, cli/main.py _main); on TPU
    # x64 is emulated/slow, so pass dtype="float32" there instead
    if dtype == "float64":
        import jax

        jax.config.update("jax_enable_x64", True)

    g = generators.uniform_random(n, edges, seed=seed)
    ref = oracle.expm_action_dense(g, np.ones(g.n))
    out = []
    for k in ks:
        res = expm_action(g, k=k, dtype=dtype)
        err = oracle.rel_error(res.ans, ref)
        rec = dict(k=int(k), rel_err=float(err))
        print(json.dumps(rec), flush=True)
        out.append(rec)
    return out


def pack_sweep(n=200_000, m=10, seed=1, thetas=(40, 75, 110),
               subs=(128, 256), k=50):
    """CPG pack-parameter sweep: tiles, fill, and (on TPU) Lanczos time."""
    import jax
    import jax.numpy as jnp

    from tpu_lanczos.graphs import generators
    from tpu_lanczos.kernels.cpg import pack_cpg
    from tpu_lanczos.core.lanczos import lanczos

    g = generators.barabasi_albert(n, m, seed=seed)
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    out = []
    for sub in subs:
        for theta in thetas:
            t0 = time.time()
            cg = pack_cpg(g, theta=theta, sub=sub)
            rec = dict(theta=theta, sub=sub, tiles=cg.total_tiles,
                       fill_pct=round(100 * cg.fill, 2),
                       pack_s=round(time.time() - t0, 1))
            if on_tpu:
                x = jnp.asarray(cg.permute_in(np.ones(g.n), np.float32))
                np.asarray(lanczos(cg, x, k).alpha)  # compile
                t0 = time.time()
                np.asarray(lanczos(cg, x, k).alpha)
                rec["lanczos_s"] = round(time.time() - t0, 4)
            print(json.dumps(rec), flush=True)
            out.append(rec)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    sp = ap.add_subparsers(dest="cmd", required=True)
    pk = sp.add_parser("k")
    pk.add_argument("-n", type=int, default=2000)
    pk.add_argument("-e", type=int, default=8000)
    pp = sp.add_parser("pack")
    pp.add_argument("-n", type=int, default=200_000)
    pp.add_argument("-m", type=int, default=10)
    args = ap.parse_args(argv)
    if args.cmd == "k":
        k_sweep(n=args.n, edges=args.e)
    else:
        pack_sweep(n=args.n, m=args.m)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
