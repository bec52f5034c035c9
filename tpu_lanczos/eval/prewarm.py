"""Pre-warm the bench-suite pack cache on the host (no TPU needed).

``pack_cpg`` is pure host work (numpy + the native C++ core), so the
expensive packs for the benchmark suite can be built while the device
is busy or the tunnel is down.  Saves each pack to the exact cache path
``bench_suite.run_one`` will look for (PACK_VERSION-tagged), with
``pack_s`` recorded inside the npz.

Run: ``python -m tpu_lanczos.eval.prewarm [--only name,name]``
"""

from __future__ import annotations

import argparse
import os
import time


from tpu_lanczos.eval.bench_suite import (
    CONFIGS, build, pack_cache_path, save_pack_cache,
)
from tpu_lanczos.kernels.cpg import pack_cpg


def prewarm(cfg, cache_dir=".bench_cache"):
    path = pack_cache_path(cfg, cache_dir)
    if os.path.exists(path):
        print(f"{cfg['name']}: cached ({path})", flush=True)
        return
    t0 = time.time()
    g = build(cfg, cache_dir)
    t_build = time.time() - t0
    t0 = time.time()
    dg = pack_cpg(g, **(cfg.get("pack") or {}))
    t_pack = time.time() - t0
    os.makedirs(cache_dir, exist_ok=True)
    save_pack_cache(dg, path, t_pack)
    print(f"{cfg['name']}: build {t_build:.1f}s pack {t_pack:.1f}s "
          f"tiles {dg.total_tiles} -> {path}", flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", help="comma-separated config names")
    ap.add_argument("--cache-dir", default=".bench_cache")
    args = ap.parse_args(argv)
    from tpu_lanczos.utils import enable_heap_reuse

    enable_heap_reuse()  # pack entry point: fault big temporaries once
    # packing is host work: force the CPU backend so a busy/wedged TPU
    # tunnel can't stall it (in this environment jax may be pre-imported
    # with the tunnel platform; env vars are too late — see
    # tests/conftest.py)
    import jax

    jax.config.update("jax_platforms", "cpu")
    configs = CONFIGS
    if args.only:
        names = set(args.only.split(","))
        configs = [c for c in CONFIGS if c["name"] in names]
    for cfg in configs:
        prewarm(cfg, args.cache_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
