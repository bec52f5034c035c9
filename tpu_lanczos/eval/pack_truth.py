"""Pack-time ground truth: real CPU work vs microVM page-fault overhead.

The suite's pack_s column (75-300 s) has two candidate explanations:
real packing CPU, or the testbed microVM's lazy page provisioning
(first-touch faults on multi-GB numpy temporaries).  The reference
builds bn1M from .mtx in seconds (serial/lib/adjMatrix.cc:18-52), so
the difference must be attributed by measurement, not assertion.

Protocol: pack the identical graph twice in one process.
- COLD: first pack — pays first-touch faults on every new heap page.
- WARM: immediate repack — with ``enable_heap_reuse()`` (mallopt
  M_MMAP_THRESHOLD/M_TRIM_THRESHOLD) the allocator reuses the already-
  provisioned pages, so WARM wall ~= real pack work.
Each leg records wall, ru_utime (user CPU), ru_stime (kernel CPU —
fault service lives here), and ru_majflt/ru_minflt deltas from
``resource.getrusage``.  COLD - WARM + the fault counts separate
provisioning from work.

Run: ``python -m tpu_lanczos.eval.pack_truth [--config ba_1M_m10]``
(CPU-only: never touches the TPU).  Prints one JSON line per leg plus
a summary line for suite_full.jsonl.
"""

from __future__ import annotations

import argparse
import json
import resource
import sys
import time

import numpy as np


def _leg(name, fn):
    r0 = resource.getrusage(resource.RUSAGE_SELF)
    t0 = time.time()
    out = fn()
    wall = time.time() - t0
    r1 = resource.getrusage(resource.RUSAGE_SELF)
    rec = dict(
        leg=name,
        wall_s=round(wall, 1),
        utime_s=round(r1.ru_utime - r0.ru_utime, 1),
        stime_s=round(r1.ru_stime - r0.ru_stime, 1),
        majflt=r1.ru_majflt - r0.ru_majflt,
        minflt=r1.ru_minflt - r0.ru_minflt,
        maxrss_gb=round(r1.ru_maxrss / 1e6, 2),
    )
    print(json.dumps(rec), flush=True)
    return out, rec


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="ba_1M_m10")
    ap.add_argument("--warm-reps", type=int, default=2)
    args = ap.parse_args(argv)

    # actually honor the 'CPU-only: never touches the TPU' claim:
    # pack_cpg's _finalize jnp.asarray's every multi-GB level array,
    # which on the default backend means TPU init + H2D through the
    # tunnel — contaminating exactly the COLD/WARM attribution this
    # tool exists to measure (prewarm.py guards the same way)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from tpu_lanczos.eval.bench_suite import CONFIGS
    from tpu_lanczos.kernels.cpg import pack_cpg
    from tpu_lanczos.utils import enable_heap_reuse

    enable_heap_reuse()
    cfg = next(c for c in CONFIGS if c["name"] == args.config)
    pack_kw = cfg.get("pack") or {}

    from tpu_lanczos.eval.bench_suite import build

    g, _ = _leg("build_graph", lambda: build(cfg))

    dg, cold = _leg("pack_cold", lambda: pack_cpg(g, **pack_kw))
    tiles = int(dg.total_tiles)
    warms = []
    for i in range(args.warm_reps):
        del dg  # release the previous pack so its pages are reusable
        dg, w = _leg(f"pack_warm_{i + 1}", lambda: pack_cpg(g, **pack_kw))
        warms.append(w)

    warm_wall = float(np.median([w["wall_s"] for w in warms]))
    summary = dict(
        study=f"{args.config}_pack_truth",
        tiles=tiles,
        cold_wall_s=cold["wall_s"],
        warm_wall_s=warm_wall,
        provisioning_s=round(cold["wall_s"] - warm_wall, 1),
        cold_utime_s=cold["utime_s"],
        cold_stime_s=cold["stime_s"],
        warm_utime_s=warms[-1]["utime_s"],
        warm_stime_s=warms[-1]["stime_s"],
        cold_majflt=cold["majflt"],
        warm_majflt=warms[-1]["majflt"],
        cold_minflt=cold["minflt"],
        warm_minflt=warms[-1]["minflt"],
        note=("warm repack of the identical graph in-process; "
              "wall-utime gap + fault counts attribute provisioning "
              "vs real pack CPU"),
    )
    print(json.dumps(summary), flush=True)
    print(
        f"\ncold {cold['wall_s']}s (u {cold['utime_s']} / s "
        f"{cold['stime_s']}, minflt {cold['minflt']:,}) -> warm "
        f"{warm_wall}s (u {warms[-1]['utime_s']} / s "
        f"{warms[-1]['stime_s']}, minflt {warms[-1]['minflt']:,})",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
