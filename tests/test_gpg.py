"""GPG (granule-packed gather) format: pack + kernel interpret-mode tests.

GPG is an experimental second-generation format (kernels/gpg.py): it
decouples source granularity from dest-chunk height to manufacture tile
fill on expander graphs.  Round-2 hardware measurements (docs/DESIGN.md)
showed the dest-cell collision cascade caps its advantage below the CPG
block format, so CPG remains the production path; GPG stays as a tested
exploration with exact-correctness guarantees.
"""

import numpy as np
import pytest
import jax.numpy as jnp
import scipy.sparse as sp

from tpu_lanczos.graphs import generators
from tpu_lanczos.graphs.csr import CSRGraph
from tpu_lanczos.kernels.gpg import pack_gpg, save_gpg, load_gpg
from tpu_lanczos.kernels.spmv_gpg import spmv_gpg


def _check(g, **kw):
    gg = pack_gpg(g, **kw)
    x = np.random.default_rng(0).standard_normal(g.n)
    xp = jnp.asarray(gg.permute_in(x, np.float64))
    y = gg.permute_out(np.asarray(spmv_gpg(gg, xp, interpret=True)))
    A = sp.csr_matrix((np.ones(g.nnz), g.indices, g.indptr), shape=(g.n, g.n))
    ref = A @ x
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-12
    return gg


GRAPHS = {
    "uniform": lambda: generators.uniform_random(1500, 5000, seed=1),
    "barabasi": lambda: generators.barabasi_albert(1500, 6, seed=2),
    "rmat": lambda: generators.rmat(1500, 5000, seed=3),
    "stencil": lambda: generators.stencil_2d(40),
}


@pytest.mark.parametrize("name", list(GRAPHS))
def test_gpg_spmv_matches_scipy(name):
    _check(GRAPHS[name]())


def test_gpg_star_reduce_levels():
    n = 1200
    hub = np.stack([np.zeros(n - 1, dtype=np.int64),
                    np.arange(1, n, dtype=np.int64)], axis=1)
    gg = _check(CSRGraph.from_edges(n, hub))
    assert len(gg.levels) >= 2


def test_gpg_param_variants():
    g = GRAPHS["barabasi"]()
    _check(g, sub_d=512)
    _check(g, g_s=8)
    _check(g, sub_s=128, g_s=16)


def test_gpg_save_load_roundtrip(tmp_path):
    g = GRAPHS["uniform"]()
    gg = pack_gpg(g)
    p = str(tmp_path / "g.npz")
    save_gpg(gg, p)
    back = load_gpg(p)
    x = np.random.default_rng(1).standard_normal(g.n)
    xp = jnp.asarray(gg.permute_in(x, np.float64))
    y1 = np.asarray(spmv_gpg(gg, xp, interpret=True))
    y2 = np.asarray(spmv_gpg(back, xp, interpret=True))
    np.testing.assert_array_equal(y1, y2)


def test_gpg_dispatch_via_spmv():
    from tpu_lanczos.kernels.spmv import spmv

    g = GRAPHS["uniform"]()
    gg = pack_gpg(g)
    x = jnp.asarray(gg.permute_in(np.ones(g.n), np.float64))
    y = np.asarray(spmv(gg, x))
    A = sp.csr_matrix((np.ones(g.nnz), g.indices, g.indptr), shape=(g.n, g.n))
    ref = A @ np.ones(g.n)
    assert np.linalg.norm(gg.permute_out(y) - ref) / np.linalg.norm(ref) < 1e-12
