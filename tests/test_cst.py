"""CST format + Pallas-kernel SpMV tests (interpret mode on CPU).

Kernel-level micro-tests against scipy — mechanism 3 of SURVEY.md §4 (the
reference's SPMV_test.cu kernel-vs-serial cross-checks)."""

import numpy as np
import pytest
import jax.numpy as jnp

from tpu_lanczos.graphs import generators
from tpu_lanczos.kernels.cst import pack_cst, _greedy_slots
from tpu_lanczos.kernels.spmv_pallas2 import spmv_cst
from tpu_lanczos.core.pipeline import expm_action
from tpu_lanczos.eval import oracle


GRAPHS = {
    "uniform": lambda: generators.uniform_random(2000, 8000, seed=1),
    "barabasi": lambda: generators.barabasi_albert(2000, 8, seed=2, use_native=False),
    "stencil": lambda: generators.stencil_2d(40),
    "tiny": lambda: generators.uniform_random(50, 100, seed=0),
}


@pytest.mark.parametrize("name", list(GRAPHS))
def test_cst_spmv_matches_scipy(name):
    g = GRAPHS[name]()
    cg = pack_cst(g)
    rng = np.random.default_rng(0)
    xr = rng.standard_normal(g.n)
    x = jnp.asarray(cg.permute_in(xr, np.float64))
    y = np.asarray(spmv_cst(cg, x, interpret=True))
    got = cg.permute_out(y)
    want = g.to_scipy() @ xr
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_cst_heavy_hub_split():
    """A star-plus-ring graph: one row of degree n-1 forces deep row
    splitting (the reference's heavy-row special case, cu_SPMV.cu:121-171)."""
    n = 3000
    hub_edges = np.stack([np.zeros(n - 1, dtype=np.int64),
                          np.arange(1, n, dtype=np.int64)], axis=1)
    ring = np.stack([np.arange(1, n - 1), np.arange(2, n)], axis=1)
    from tpu_lanczos.graphs.csr import CSRGraph

    g = CSRGraph.from_edges(n, np.concatenate([hub_edges, ring]))
    cg = pack_cst(g)
    assert len(cg.idx1) >= 2  # at least one reduce level
    # slots bounded nowhere near the hub degree (n-1)
    assert sum(a.shape[0] for a in cg.idx1) < 200
    rng = np.random.default_rng(3)
    xr = rng.standard_normal(n)
    x = jnp.asarray(cg.permute_in(xr, np.float64))
    got = cg.permute_out(np.asarray(spmv_cst(cg, x, interpret=True)))
    want = g.to_scipy() @ xr
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_greedy_slots_constraints():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 50, size=5000)
    b = rng.integers(0, 80, size=5000)
    slot = _greedy_slots(a, b)
    assert slot.min() >= 0
    # within a slot, both keys unique
    for s in np.unique(slot):
        sel = slot == s
        assert len(np.unique(a[sel])) == sel.sum()
        assert len(np.unique(b[sel])) == sel.sum()
    # greedy stays within 2x the trivial lower bound (max load)
    lb = max(np.bincount(a).max(), np.bincount(b).max())
    assert slot.max() + 1 <= 2 * lb


def test_cst_pipeline_end_to_end():
    g = GRAPHS["barabasi"]()
    res = expm_action(g, k=30, dtype="float64", fmt="cst", spmv_impl="interpret")
    ref = oracle.expm_action(g, np.ones(g.n), 30)
    assert oracle.rel_error(res.ans, ref) < 1e-12


def test_cst_fill_reasonable():
    """Slot count must track mean degree, not max degree."""
    g = generators.barabasi_albert(5000, 10, seed=4, use_native=False)
    cg = pack_cst(g)
    d_mean = g.nnz / g.n
    assert cg.total_slots < 8 * d_mean
