"""Pack design-space scanner: predict CPG tile counts WITHOUT building
index tiles.

The CPG kernel's runtime is ``tiles x cyc_per_tile`` with (measured on
v5e, docs/DESIGN.md):

    cyc_per_tile(sub) ~= 260 * (sub/128) + 50 * (sub/128)^2

(linear: first gather + transpose + DMA; quadratic: the second gather's
(sub/128)^2 slab-select units).  Tiles are the Konig bound
``sum_block max(endpoint loads)``, which the native coloring achieves to
within ~1% — so a scan over (theta, theta_s, sub, order, redeal) that
only computes per-block load maxima predicts hardware time well enough
to pick a pack config (validated: ba_4M sub=512 predicted 1.41s,
measured 1.78s at the pre-group-DMA kernel; ratios between configs
track much tighter than absolute times).

This mirrors the reference's practice of sweeping launch/blocking
parameters per graph (parallel-final writeup Table 3); here the sweep
runs on the host in seconds instead of on device.

Usage: ``python -m tpu_lanczos.eval.pack_scan --kind rmat540
--spec 120,120,512,degree,1 --spec 70,none,256,locality,0``
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

from tpu_lanczos.kernels.cpg import (
    LANE, REAL_LANES, _group_deal, _pos_of_unit, _split_counts,
)

# measured v5e kernel cost model (docs/DESIGN.md round-2 breakdown)
_CYC_LIN = 260.5
_CYC_QUAD = 50.5
CLOCK_HZ = 0.94e9


def cyc_per_tile(sub: int) -> float:
    m = sub / 128.0
    return _CYC_LIN * m + _CYC_QUAD * m * m


def est_level_tiles(src_pos: np.ndarray, dst_pos: np.ndarray, sub: int):
    """Konig tile bound for one level: sum over (S, D) blocks of the max
    staging-cell / dest-cell load."""
    s_chunk = src_pos // (sub * LANE)
    ss = (src_pos // LANE) % sub
    d_chunk = dst_pos // (sub * LANE)
    rd = (dst_pos // LANE) % sub
    ld = dst_pos % LANE
    block = d_chunk.astype(np.int64) * (1 << 32) + s_chunk
    ub, binv = np.unique(block, return_inverse=True)
    a_key = binv.astype(np.int64) * (sub * LANE) + ss * LANE + ld
    b_key = binv.astype(np.int64) * (sub * LANE) + rd * LANE + ld
    delta = np.zeros(ub.size, dtype=np.int64)
    for key in (a_key, b_key):
        uk, cnt = np.unique(key, return_counts=True)
        np.maximum.at(delta, uk // (sub * LANE), cnt)
    return int(delta.sum()), int(ub.size)


def _splits(g, theta: int, theta_s: int | None):
    """Shared preamble: endpoint arrays + dest/source split bookkeeping
    (must mirror pack_cpg's _pack_split semantics — one copy only)."""
    rows = g.row_ids().astype(np.int64)
    cols = g.indices.astype(np.int64)
    n = g.n
    ddeg = np.bincount(rows, minlength=n)
    d_parts = _split_counts(ddeg, theta)
    d_extra = np.maximum(d_parts - 1, 0)
    sdeg = np.bincount(cols, minlength=n)
    s_parts = _split_counts(sdeg, theta_s) if theta_s else np.ones(n, np.int64)
    s_extra = np.maximum(s_parts - 1, 0)
    return rows, cols, n, ddeg, d_parts, d_extra, sdeg, s_parts, s_extra


def _degree_rank(deg_u: np.ndarray, order: str) -> np.ndarray:
    if order != "degree":
        return np.arange(deg_u.size, dtype=np.int64)
    srt = np.argsort(-deg_u, kind="stable")
    rank = np.empty(deg_u.size, dtype=np.int64)
    rank[srt] = np.arange(deg_u.size)
    return rank


def scan_config(g, theta: int, theta_s: int | None, sub: int,
                order: str = "degree", redeal: bool = True) -> dict:
    """Estimate tiles/time for one pack config (single-level reduce-tree
    approximation — exact for rows with <= theta^2 degree)."""
    (rows, cols, n, ddeg, d_parts, d_extra,
     sdeg, s_parts, s_extra) = _splits(g, theta, theta_s)
    d_base = np.zeros(n, np.int64)
    d_base[1:] = np.cumsum(d_extra)[:-1]
    n_units = n + int(d_extra.sum())
    d_base += n
    s_base = np.zeros(n, np.int64)
    s_base[1:] = np.cumsum(s_extra)[:-1]
    s_base += n_units
    n_units += int(s_extra.sum())

    # the cumsum-based s_base/d_base layout makes the split ids
    # CONTIGUOUS across units, so both lists are single aranges — the
    # per-unit Python loop cost O(split units) tiny allocations on the
    # 4M-node kinds, defeating the 'host sweep in seconds' point
    nz_s = np.nonzero(s_extra)[0]
    bc_src = np.repeat(nz_s, s_extra[nz_s])
    first_s = s_base[nz_s[0]] if nz_s.size else 0
    bc_dst = first_s + np.arange(int(s_extra.sum()), dtype=np.int64)

    nz_d = np.nonzero(d_extra)[0]
    first_d = d_base[nz_d[0]] if nz_d.size else 0
    r_src = first_d + np.arange(int(d_extra.sum()), dtype=np.int64)
    r_dst = np.repeat(nz_d, d_extra[nz_d])

    deg_u = np.zeros(n_units, np.int64)
    deg_u[:n] = (np.minimum(ddeg, theta)
                 + np.minimum(sdeg, theta_s or 0) + d_extra + s_extra)
    if r_src.size:
        deg_u[r_src] = theta
    if bc_dst.size:
        deg_u[bc_dst] = theta_s
    rank = _degree_rank(deg_u, order)
    pos = _pos_of_unit(rank, sub)
    n_chunks = int(np.ceil(n_units / (sub * REAL_LANES)))

    if redeal:
        s_chunk_of_entry = pos[cols] // (sub * LANE)
        dpart = _group_deal(rows, s_chunk_of_entry, d_parts)
    else:
        starts = np.zeros(n + 1, np.int64)
        np.cumsum(ddeg, out=starts[1:])
        dpart = (np.arange(rows.size) - starts[rows]) // theta
    dunit = np.where(dpart == 0, rows, d_base[rows] + dpart - 1)

    if theta_s:
        d_chunk_of_entry = pos[dunit] // (sub * LANE)
        if redeal:
            spart = _group_deal(cols, d_chunk_of_entry, s_parts)
        else:
            csort = np.argsort(cols, kind="stable")
            sstarts = np.zeros(n + 1, np.int64)
            np.cumsum(sdeg, out=sstarts[1:])
            within = np.empty(cols.size, np.int64)
            within[csort] = np.arange(cols.size) - sstarts[cols[csort]]
            spart = within % np.maximum(s_parts[cols], 1)
        sunit = np.where(spart == 0, cols, s_base[cols] + spart - 1)
    else:
        sunit = cols

    levels = [est_level_tiles(pos[sunit], pos[dunit], sub)]
    if theta_s and bc_src.size:
        levels.append(est_level_tiles(pos[bc_src], pos[bc_dst], sub))
    if r_src.size:
        levels.append(est_level_tiles(pos[r_src], pos[r_dst], sub))
    total = sum(t for t, _ in levels)
    pred_s = 50 * total * cyc_per_tile(sub) / CLOCK_HZ
    return dict(theta=theta, theta_s=theta_s, sub=sub, order=order,
                redeal=redeal, n_units=n_units, n_chunks=n_chunks,
                levels=levels, total_tiles=total,
                pred_k50_s=round(pred_s, 4))


def scan_config_aux(g, theta: int, theta_s: int | None, sub: int,
                    order: str = "degree", interleave: bool = False) -> dict:
    """Estimate tiles/time for the FOLD/SPREAD aux-region layout:
    virtual rows and source copies live in dedicated pow2-segment
    regions folded/spread by plain XLA reshape-sums, so the reduce and
    broadcast CPG levels collapse to two tiny seed/delivery levels.
    """
    from tpu_lanczos.kernels.cpg import _alloc_aux

    (rows, cols, n, ddeg, d_parts, d_extra,
     sdeg, s_parts, s_extra) = _splits(g, theta, theta_s)

    # real units only in the main rank space
    deg_u = (np.minimum(ddeg, theta)
             + (np.minimum(sdeg, theta_s) if theta_s else 0))
    rank = _degree_rank(deg_u, order)

    # allocate aux regions linearly (region row space), sized first
    s_ids = np.nonzero(s_extra)[0]
    d_ids = np.nonzero(d_extra)[0]
    row0 = 0
    pos_s, info_s = _alloc_aux(s_extra[s_ids], row0)
    row0 += info_s["rows"]
    pos_d, info_d = _alloc_aux(d_extra[d_ids], row0)
    row0 += info_d["rows"]
    ms = info_d["multi_sizes"]
    while ms.size:  # deeper rounds are pure folds: no tiles
        _, info_r = _alloc_aux(ms, row0)
        row0 += info_r["rows"]
        ms = info_r["multi_sizes"]
    pos_del, info_del = _alloc_aux(np.ones(d_ids.size, np.int64), row0)
    aux_rows = row0 + info_del["rows"]

    r_real = int(np.ceil(n / REAL_LANES))
    if interleave:
        # reserve a band of R sublanes at the top of every chunk
        c = max(int(np.ceil((r_real + aux_rows) / sub)), 1)
        for _ in range(12):
            band = int(np.ceil(aux_rows / c))
            c2 = max(int(np.ceil(r_real / max(sub - band, 1))), 1)
            if c2 <= c:
                break
            c = c2
        band = int(np.ceil(aux_rows / c))
        c_main = c
        sub_eff = sub - band
        assert sub_eff >= 1, (sub, band)
        chunk = rank // (sub_eff * REAL_LANES)
        w = rank % (sub_eff * REAL_LANES)
        pos_real = (chunk * sub + w // REAL_LANES) * LANE + w % REAL_LANES

        def map_aux(p):
            r, lane = p // LANE, p % LANE
            grow = (r // band) * sub + sub_eff + (r % band)
            return grow * LANE + lane

        pos_s, pos_d, pos_del = map_aux(pos_s), map_aux(pos_d), \
            map_aux(pos_del)
        seg_pos_s = map_aux(info_s["seg_pos"])
        n_chunks = c_main
    else:
        pos_real = _pos_of_unit(rank, sub)
        c_main = int(np.ceil(n / (sub * REAL_LANES)))
        off = c_main * sub * LANE
        pos_s, pos_d, pos_del = pos_s + off, pos_d + off, pos_del + off
        seg_pos_s = info_s["seg_pos"] + off
        n_chunks = c_main + int(np.ceil(aux_rows / sub))

    d_base = np.zeros(n, np.int64)
    d_base[d_ids] = np.cumsum(d_extra[d_ids]) - d_extra[d_ids]
    s_base = np.zeros(n, np.int64)
    s_base[s_ids] = np.cumsum(s_extra[s_ids]) - s_extra[s_ids]

    # dealing (block-aware, same as the packer's redeal path)
    s_chunk_of_entry = pos_real[cols] // (sub * LANE)
    dpart = _group_deal(rows, s_chunk_of_entry, d_parts)
    dst_pos = np.where(dpart == 0, pos_real[rows],
                       pos_d[d_base[rows] + dpart - 1] if pos_d.size
                       else pos_real[rows])
    if theta_s:
        d_chunk_of_entry = dst_pos // (sub * LANE)
        spart = _group_deal(cols, d_chunk_of_entry, s_parts)
        src_pos = np.where(spart == 0, pos_real[cols],
                           pos_s[s_base[cols] + spart - 1] if pos_s.size
                           else pos_real[cols])
    else:
        src_pos = pos_real[cols]

    levels = [est_level_tiles(src_pos, dst_pos, sub)]
    if info_s["out_group"].size:
        # seed level: one entry per x-side segment
        levels.append(est_level_tiles(
            pos_real[s_ids[info_s["out_group"]]], seg_pos_s, sub))
    if d_ids.size:
        # delivery level: one entry per split parent
        levels.append(est_level_tiles(pos_del, pos_real[d_ids], sub))
    total = sum(t for t, _ in levels)
    pred_s = 50 * total * cyc_per_tile(sub) / CLOCK_HZ
    return dict(theta=theta, theta_s=theta_s, sub=sub, order=order,
                aux=True, interleave=interleave, n_chunks=n_chunks,
                c_main=c_main, aux_rows=aux_rows,
                levels=levels, total_tiles=total,
                pred_k50_s=round(pred_s, 4))


_KINDS = {
    "ba300k": (lambda G: G.barabasi_albert(300_000, 9, seed=7), None),
    "bn1M": (lambda G: G.barabasi_albert(1_000_000, 10, seed=0), 0.4166),
    "rmat540": (lambda G: G.rmat(540_000, 15_250_000, seed=0), 0.1200),
    "copapers": (lambda G: G.clique_union(540_000, 1_240_000, seed=0),
                 0.1200),
    "rmat4M": (lambda G: G.rmat(4_000_000, 34_700_000, seed=0), 1.3245),
    "ba4M": (lambda G: G.barabasi_albert(4_000_000, 9, seed=0), 1.3245),
}


def main(argv=None):
    from tpu_lanczos.graphs import generators

    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", default="rmat540", choices=sorted(_KINDS))
    ap.add_argument("--spec", action="append", default=[],
                    help="theta,theta_s|none,sub,order,redeal(0/1)")
    ap.add_argument("--aux", action="store_true",
                    help="scan the fold/spread aux-region layout instead")
    args = ap.parse_args(argv)
    from tpu_lanczos.utils import enable_heap_reuse

    enable_heap_reuse()  # pack entry point: fault big temporaries once
    gen, ref = _KINDS[args.kind]
    g = gen(generators)
    print(f"{args.kind}: n={g.n} nnz={g.nnz}", file=sys.stderr)
    specs = args.spec or ["120,120,512,degree,1", "70,70,512,degree,1",
                          "120,none,256,locality,0"]
    for spec in specs:
        th, ths, sb, od, rd = spec.split(",")
        t0 = time.time()
        if args.aux:
            r = scan_config_aux(g, int(th),
                                None if ths == "none" else int(ths),
                                int(sb), order=od,
                                interleave=rd == "1")
        else:
            r = scan_config(g, int(th), None if ths == "none" else int(ths),
                            int(sb), order=od, redeal=rd == "1")
        if ref:
            r["pred_vs_ref"] = round(ref / r["pred_k50_s"], 2)
        r["scan_s"] = round(time.time() - t0, 1)
        print(json.dumps(r), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
