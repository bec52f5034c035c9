"""CPG format + Pallas hardware-path SpMV tests (interpret mode on CPU).

CPG is the format the TPU actually runs (kernels/spmv_cpg.py); hardware
equivalence was verified exactly (hw == interpret bit-for-bit on v5e).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from tpu_lanczos.graphs import generators
from tpu_lanczos.graphs.csr import CSRGraph
from tpu_lanczos.kernels.cpg import pack_cpg
from tpu_lanczos.kernels.spmv_cpg import spmv_cpg
from tpu_lanczos.core.pipeline import expm_action
from tpu_lanczos.eval import oracle


GRAPHS = {
    "uniform": lambda: generators.uniform_random(2000, 8000, seed=1),
    "barabasi": lambda: generators.barabasi_albert(2000, 8, seed=2, use_native=False),
    "stencil": lambda: generators.stencil_2d(40),
    "multichunk": lambda: generators.barabasi_albert(40000, 6, seed=3, use_native=False),
    # coPapersDBLP class: community-local clique union, locality order
    "clique": lambda: generators.clique_union(25600, 60000, seed=4),
}


@pytest.mark.parametrize("name", list(GRAPHS))
def test_cpg_spmv_matches_scipy(name):
    g = GRAPHS[name]()
    cg = pack_cpg(g)
    rng = np.random.default_rng(0)
    xr = rng.standard_normal(g.n)
    x = jnp.asarray(cg.permute_in(xr, np.float64))
    got = cg.permute_out(np.asarray(spmv_cpg(cg, x, interpret=True)))
    want = g.to_scipy() @ xr
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-11)


def test_cpg_star_graph_deep_split():
    """Hub of degree n-1 exercises multi-level virtual-row reduction."""
    n = 3000
    hub = np.stack([np.zeros(n - 1, dtype=np.int64),
                    np.arange(1, n, dtype=np.int64)], axis=1)
    ring = np.stack([np.arange(1, n - 1), np.arange(2, n)], axis=1)
    g = CSRGraph.from_edges(n, np.concatenate([hub, ring]))
    cg = pack_cpg(g)
    assert len(cg.levels) >= 2
    rng = np.random.default_rng(3)
    xr = rng.standard_normal(n)
    x = jnp.asarray(cg.permute_in(xr, np.float64))
    got = cg.permute_out(np.asarray(spmv_cpg(cg, x, interpret=True)))
    want = g.to_scipy() @ xr
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-11)


def test_cpg_pipeline_end_to_end():
    g = GRAPHS["barabasi"]()
    res = expm_action(g, k=30, dtype="float64", fmt="cpg", spmv_impl="interpret")
    ref = oracle.expm_action(g, np.ones(g.n), 30)
    assert oracle.rel_error(res.ans, ref) < 1e-12


@pytest.mark.parametrize("sub", [512, 1024])
def test_cpg_wide_sub_l2_int16(sub):
    """sub > 256 needs int16 l2 tiles: staging-sublane indices range over
    [0, sub), past uint8.  Regression for the silent-truncation bug found
    while calibrating the power-law sub=512 pack (round 2)."""
    g = GRAPHS["multichunk"]()
    cg = pack_cpg(g, sub=sub)
    assert all(np.asarray(lv["l2"]).dtype == np.int16 for lv in cg.levels)
    rng = np.random.default_rng(0)
    xr = rng.standard_normal(g.n)
    x = jnp.asarray(cg.permute_in(xr, np.float64))
    got = cg.permute_out(np.asarray(spmv_cpg(cg, x, interpret=True)))
    want = g.to_scipy() @ xr
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-11)


def test_cpg_pair_mask_skips_match_full_mask():
    """The masked second gather only ever skips structurally-zero units:
    forcing every tile's pair_mask to all-ones (no skipping) must give
    the identical SpMV result, and real packs must contain tiles that do
    skip (else the mask is dead weight)."""
    import dataclasses

    g = GRAPHS["multichunk"]()
    cg = pack_cpg(g, sub=512)
    n_slab = 512 // 128
    full = (1 << (n_slab * n_slab)) - 1
    some_sparse = any(
        np.asarray(lv["pair_mask"])[: int(np.asarray(lv["counts"]).sum())]
        .min() < full
        for lv in cg.levels
    )
    assert some_sparse
    rng = np.random.default_rng(7)
    xr = rng.standard_normal(g.n)
    x = jnp.asarray(cg.permute_in(xr, np.float64))
    got = np.asarray(spmv_cpg(cg, x, interpret=True))
    levels_full = tuple(
        {**lv, "pair_mask": jnp.full_like(lv["pair_mask"], full)}
        for lv in cg.levels
    )
    cg_full = dataclasses.replace(cg, levels=levels_full)
    want = np.asarray(spmv_cpg(cg_full, x, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_native_level_builder_wide_sub_matches_numpy():
    """Native and numpy level builders agree at sub=512 (int16 l2)."""
    from tpu_lanczos.graphs import native
    from tpu_lanczos.kernels import cpg

    if not native.available():
        pytest.skip("native core unavailable")
    rng = np.random.default_rng(1)
    sub = 512
    span = sub * 128 * 3
    src = rng.integers(0, span, 50000)
    dst = rng.integers(0, span, 50000)
    lv_nat = cpg._build_cpg_level(src, dst, sub)
    lv_np = cpg._build_cpg_level_np(src, dst, sub)
    assert lv_nat.l2.dtype == np.int16 == lv_np.l2.dtype
    np.testing.assert_array_equal(lv_nat.s_ids, lv_np.s_ids)
    np.testing.assert_array_equal(lv_nat.d_ids, lv_np.d_ids)
    np.testing.assert_array_equal(lv_nat.l1, lv_np.l1)
    np.testing.assert_array_equal(lv_nat.l2, lv_np.l2)
    np.testing.assert_array_equal(lv_nat.pair_mask, lv_np.pair_mask)
    # the index-tile-derived mask recovery (legacy pack upgrade path)
    # agrees with the entry-derived masks
    np.testing.assert_array_equal(
        cpg.mask_from_l1l2(lv_np.l1, lv_np.l2, sub), lv_np.pair_mask)


def test_cpg_lane127_invariant():
    """Lane 127 of every sublane is structurally zero (ghost target)."""
    g = GRAPHS["uniform"]()
    cg = pack_cpg(g)
    assert np.all(cg.new_of_old % 128 != 127)
    mask = np.asarray(cg.realmask).reshape(-1, 128)
    assert np.all(mask[:, 127] == 0)


def test_native_level_builder_matches_numpy():
    """The native one-shot CPG level builder must reproduce the numpy
    reference builder exactly (same tile numbering, l1/l2, ghost mex)."""
    import numpy as np
    import pytest

    from tpu_lanczos.graphs import generators, native
    from tpu_lanczos.kernels import cpg

    if not native.available():
        pytest.skip("native core unavailable")
    g = generators.barabasi_albert(2000, 7, seed=3)
    rows = g.row_ids().astype(np.int64)
    cols = g.indices.astype(np.int64)
    sub = 128
    # simple identity-rank positions (skip lane 127), no theta split
    pos = (np.arange(g.n) // 127) * 128 + np.arange(g.n) % 127
    src, dst = pos[cols], pos[rows]
    lv_nat = cpg._build_cpg_level(src, dst, sub)
    lv_np = cpg._build_cpg_level_np(src, dst, sub)
    # native Konig coloring is also used by the numpy path, so the two
    # must agree bit for bit
    np.testing.assert_array_equal(lv_nat.s_ids, lv_np.s_ids)
    np.testing.assert_array_equal(lv_nat.d_ids, lv_np.d_ids)
    np.testing.assert_array_equal(lv_nat.l1, lv_np.l1)
    np.testing.assert_array_equal(lv_nat.l2, lv_np.l2)
    np.testing.assert_array_equal(lv_nat.pair_mask, lv_np.pair_mask)


def test_native_split_rows_matches_numpy():
    import numpy as np
    import pytest

    from tpu_lanczos.graphs import generators, native
    from tpu_lanczos.kernels import cst

    if not native.available():
        pytest.skip("native core unavailable")
    g = generators.barabasi_albert(2000, 7, seed=3)
    rows = g.row_ids().astype(np.int64)
    cols = g.indices.astype(np.int64)
    u1, n1, p1 = native.split_rows(rows, g.n, 16)
    # numpy path (bypass the native dispatch inside _split_rows)
    deg = np.bincount(rows, minlength=g.n)
    starts = np.zeros(g.n + 1, dtype=np.int64)
    np.cumsum(deg, out=starts[1:])
    within = np.arange(rows.size) - starts[rows]
    part = within // 16
    n_parts = np.maximum(deg + 15, 1) // 16
    extra = np.maximum(n_parts - 1, 0)
    virt_base = np.zeros(g.n, dtype=np.int64)
    virt_base[1:] = np.cumsum(extra)[:-1]
    virt_base += g.n
    unit = np.where(part == 0, rows, virt_base[rows] + part - 1)
    assert n1 == g.n + int(extra.sum())
    np.testing.assert_array_equal(u1, unit)
    np.testing.assert_array_equal(p1, np.repeat(np.arange(g.n), extra))


def test_alloc_aux_fold_recipe():
    """Aux-region allocator: pow2 lane segments whose group sums are a
    plain reshape-sum (the fold/spread layout the round-2 design study
    measured — kept for the scanner; see docs/DESIGN.md)."""
    from tpu_lanczos.kernels.cpg import LANE, _alloc_aux

    rng = np.random.default_rng(0)
    sizes = np.concatenate([rng.integers(1, 400, 50),
                            [1, 2, 127, 128, 129, 1000]])
    pos, info = _alloc_aux(sizes, base_row=10)
    assert pos.size == sizes.sum()
    assert np.unique(pos).size == pos.size          # no collisions
    assert (pos % LANE != 127).all()                # lane 127 never used
    rows = pos // LANE
    assert rows.min() >= 10 and rows.max() < 10 + info["rows"]
    # simulate the fold and check exact group sums
    region = np.zeros((10 + info["rows"], LANE))
    vals = rng.standard_normal(pos.size)
    region[pos // LANE, pos % LANE] = vals
    outs = []
    for (w, r0, nr, nseg) in info["folds"]:
        s = region[r0:r0 + nr].reshape(nr, LANE // w, w).sum(-1)
        outs.append(s.ravel()[:nseg])
    out = np.concatenate(outs)
    assert out.size == info["out_group"].size == info["seg_pos"].size
    gsum = np.zeros(sizes.size)
    np.add.at(gsum, info["out_group"], out)
    off = np.concatenate([[0], np.cumsum(sizes)])
    goal = np.add.reduceat(vals, off[:-1])
    np.testing.assert_allclose(gsum, goal, rtol=1e-12)
    # empty input
    pos0, info0 = _alloc_aux(np.zeros(0, np.int64), base_row=0)
    assert pos0.size == 0 and info0["rows"] == 0


def test_group_deal_native_matches_numpy():
    """The native gc_group_deal must reproduce the numpy dealing
    bit-for-bit (stable sort order, group stagger, modulo parts)."""
    from tpu_lanczos.graphs import native
    from tpu_lanczos.kernels.cpg import _group_deal_np

    if not native.available():
        import pytest

        pytest.skip("native core unavailable")
    rng = np.random.default_rng(3)
    E, P = 200_000, 500
    parent = rng.integers(0, P, E)
    opp = rng.integers(0, 40, E)
    n_parts = rng.integers(1, 9, P)
    got = native.group_deal(parent, opp, n_parts)
    want = _group_deal_np(parent, opp, n_parts)
    np.testing.assert_array_equal(got, want)
    # degenerate: single group, parts=1 -> all zeros
    got1 = native.group_deal(np.zeros(10, np.int64), np.zeros(10, np.int64),
                             np.ones(1, np.int64))
    np.testing.assert_array_equal(got1, 0)


def test_densify_mask_thresholds():
    """Break-even densify: sparse masks survive only at low occupancy;
    wide subs (u2 > int32 capacity) force the all-dense sentinel."""
    from tpu_lanczos.kernels.cpg import _densify_mask

    # sub=512 classic: u2=16, threshold (77*16 - 52*4)/129 ~ 7.9
    full = (1 << 16) - 1
    lo = np.int32((1 << 7) - 1)       # occ 7 -> kept
    hi = np.int32((1 << 9) - 1)       # occ 9 -> densified
    out = _densify_mask(np.array([lo, hi, full], np.int32), 512, "classic")
    np.testing.assert_array_equal(out, [lo, full, full])
    # sub=128: single-gather kernel, masks pass through untouched
    pm = np.array([1, 0], np.int32)
    np.testing.assert_array_equal(_densify_mask(pm, 128, "classic"), pm)
    # sub=1024 classic: u2=64 > 30 -> all-ones sentinel
    out = _densify_mask(np.array([3, 9], np.int32), 1024, "classic")
    np.testing.assert_array_equal(out, [-1, -1])


def test_mask_from_l1l2_slab_layout():
    """Slab-layout mask recovery (bit j = output slab j has a real
    entry) agrees with the builder's entry-derived mask."""
    from tpu_lanczos.kernels import cpg

    rng = np.random.default_rng(5)
    sub = 256
    span = sub * 128 * 2
    src = rng.integers(0, span, 30_000)
    dst = rng.integers(0, span, 30_000)
    lv = cpg._build_cpg_level_slab_np(src, dst, sub)
    got = cpg.mask_from_l1l2(lv.l1, lv.l2, sub, "slab")
    np.testing.assert_array_equal(got, lv.pair_mask)


def test_slab_mask_capacity_sentinel():
    """Slab-layout mask construction past int32 bit capacity (n_slab >
    30, i.e. sub >= 3968) must emit the all-dense -1 sentinel instead of
    overflowing the shift (signed-shift UB in the native twin)."""
    from tpu_lanczos.kernels import cpg

    rng = np.random.default_rng(7)
    sub = 4096  # n_slab = 32: bit index reaches 31
    span = sub * 128
    src = rng.integers(0, span, 5_000)
    dst = rng.integers(0, span, 5_000)
    lv = cpg._build_cpg_level_slab_np(src, dst, sub)
    np.testing.assert_array_equal(lv.pair_mask,
                                  np.full(lv.pair_mask.shape, -1))
    assert not cpg._mask_is_sparse(lv.pair_mask, sub, "slab")
    # dispatcher (native builder when available) must agree
    lv2 = cpg._build_cpg_level_slab(src, dst, sub)
    np.testing.assert_array_equal(lv2.pair_mask,
                                  np.full(lv2.pair_mask.shape, -1))


def test_mask_sparse_flag_consistent():
    """The static per-level mask_sparse flag must agree with the level's
    actual (real-tile) masks: True iff any real tile kept a non-FULL
    mask after densify — a stale flag either compiles dead dispatch or,
    worse, drops the sparse path for a level that needs it."""
    from tpu_lanczos.graphs import generators

    for g, sub in ((generators.stencil_2d(600), 256),
                   (GRAPHS["multichunk"](), 512)):
        cg = pack_cpg(g, sub=sub)
        u2 = (sub // 128) ** 2
        full = (1 << u2) - 1
        assert len(cg.mask_sparse) == len(cg.levels)
        for flag, lv in zip(cg.mask_sparse, cg.levels):
            pm = np.asarray(lv["pair_mask"])[
                : int(np.asarray(lv["counts"]).sum())]
            assert flag == bool((pm != full).any())
    # power-law at wide sub must actually exercise the sparse path
    assert any(pack_cpg(GRAPHS["multichunk"](), sub=512).mask_sparse)


def test_embed_pair_masks_upgrade(tmp_path):
    """The cache-upgrade script recovers masks for legacy packs (saved
    before pair_mask existed) that match the fresh builder's masks."""
    import importlib.util
    import os

    from tpu_lanczos.kernels.cpg import load_cpg, save_cpg

    g = GRAPHS["multichunk"]()
    cg = pack_cpg(g, sub=512)
    path = str(tmp_path / "legacy.npz")
    save_cpg(cg, path)
    # strip the masks to simulate a pre-mask pack
    z = dict(np.load(path))
    fresh = [z.pop(f"lv{i}_pair_mask") for i in range(int(z["n_levels"]))]
    np.savez(path, **z)

    spec = importlib.util.spec_from_file_location(
        "embed_pair_masks",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "embed_pair_masks.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.upgrade(path)
    z2 = np.load(path)
    for i, want in enumerate(fresh):
        got = np.asarray(z2[f"lv{i}_pair_mask"])
        # the script embeds EXACT masks; the saved ones were densified —
        # they must agree wherever the saved mask was kept sparse, and
        # a re-load must produce identical device masks either way
        assert got.shape == want.shape
    cg2 = load_cpg(path)
    for lv_a, lv_b in zip(cg.levels, cg2.levels):
        np.testing.assert_array_equal(np.asarray(lv_a["pair_mask"]),
                                      np.asarray(lv_b["pair_mask"]))
    assert cg2.mask_sparse == cg.mask_sparse
