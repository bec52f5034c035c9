"""Embed per-tile pair_mask arrays into cached CPG packs in place.

Packs saved before the masked second gather lack ``lv*_pair_mask``;
``load_cpg`` recovers the masks from the index tiles on every load,
which costs ~1 min for the 4M-node packs.  This one-shot upgrade writes
them back into the .npz so later loads are free.

Usage: python scripts/embed_pair_masks.py [.bench_cache]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpu_lanczos.kernels.cpg import mask_from_l1l2  # noqa: E402


def upgrade(path: str) -> None:
    z = dict(np.load(path))
    if "n_levels" not in z:
        print(f"  {path}: not a CPG pack, skipped")
        return
    n_levels = int(z["n_levels"])
    if all(f"lv{i}_pair_mask" in z for i in range(n_levels)):
        print(f"  {path}: already has masks")
        return
    sub = int(z["sub"]) if "sub" in z else 128
    layout = str(z["layout"]) if "layout" in z else "classic"
    if sub == 128:
        # single-gather kernel: load_cpg never reads the mask (and skips
        # its own recovery) — nothing worth embedding
        print(f"  {path}: sub=128 (mask unused), skipped")
        return
    t0 = time.time()
    for i in range(n_levels):
        key = f"lv{i}_pair_mask"
        if key in z:
            continue
        z[key] = mask_from_l1l2(z[f"lv{i}_l1"], z[f"lv{i}_l2"], sub, layout)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **z)
    os.replace(tmp, path)
    print(f"  {path}: masks embedded in {time.time() - t0:.0f}s")


def main() -> int:
    cache = sys.argv[1] if len(sys.argv) > 1 else ".bench_cache"
    for name in sorted(os.listdir(cache)):
        if name.endswith(".npz"):
            upgrade(os.path.join(cache, name))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
