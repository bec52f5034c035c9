"""Multi-chip (8 virtual CPU devices) row-sharded pipeline tests.

The reference could only test its distributed path on two physical GPUs
(parallel-two-cards/README.md:11); here the sharded path is cross-checked
against the single-device pipeline and the numpy oracle on a simulated
mesh (SURVEY.md §4 'Multi-device testing without a cluster')."""

import numpy as np
import pytest
import jax

from tpu_lanczos.graphs import generators
from tpu_lanczos.dist import (
    make_mesh,
    balanced_permutation,
    pack_sharded,
    expm_action_sharded,
    lanczos_sharded,
)
from tpu_lanczos.dist.mesh import ROWS
from tpu_lanczos.eval import oracle
from tpu_lanczos.core.pipeline import expm_action


GRAPHS = {
    "barabasi": lambda: generators.barabasi_albert(2000, 5, seed=2, use_native=False),
    "uniform": lambda: generators.uniform_random(1500, 6000, seed=1),
    "stencil": lambda: generators.stencil_2d(40),
}


@pytest.mark.parametrize("name", list(GRAPHS))
def test_sharded_matches_oracle(name):
    g = GRAPHS[name]()
    mesh = make_mesh(8)
    ans, _, state, sg = expm_action_sharded(g, k=30, mesh=mesh, dtype="float64")
    ref = oracle.expm_action(g, np.ones(g.n), 30)
    assert oracle.rel_error(ans, ref) < 1e-12


def test_sharded_matches_single_device():
    """Same graph through the sharded and single-device pipelines: the
    implementation cross-check (reference: check_ans serial-vs-CUDA,
    parallel-final/main.cu:156)."""
    g = GRAPHS["uniform"]()
    mesh = make_mesh(8)
    ans_sharded, _, _, _ = expm_action_sharded(g, k=25, mesh=mesh, dtype="float64")
    res_single = expm_action(g, k=25, dtype="float64")
    assert oracle.rel_error(ans_sharded, res_single.ans) < 1e-12


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_device_count_invariance(n_dev):
    """The answer must not depend on the mesh size."""
    g = GRAPHS["barabasi"]()
    mesh = make_mesh(n_dev)
    ans, _, _, _ = expm_action_sharded(g, k=20, mesh=mesh, dtype="float64")
    ref = oracle.expm_action(g, np.ones(g.n), 20)
    assert oracle.rel_error(ans, ref) < 1e-12


def test_balanced_permutation_is_permutation_and_balanced():
    g = generators.barabasi_albert(3000, 8, seed=0, use_native=False)
    for d in (2, 8):
        perm = balanced_permutation(g, d)
        # injectivity + explicit range: n distinct non-negative
        # positions inside [0, d * n_loc) with n_loc = ceil(n / d)
        # (the default snake deal's max shard size)
        assert len(np.unique(perm)) == g.n
        n_loc_d = int(np.ceil(g.n / d))
        assert perm.min() >= 0 and perm.max() < d * n_loc_d
        n_loc = int(np.ceil(g.n / d))
        # nnz balance within 15% even for power-law degree graphs
        sh = balanced_permutation(g, d, n_loc)[g.row_ids()] // n_loc
        counts = np.bincount(sh, minlength=d)
        assert counts.max() / counts.mean() < 1.15


def test_sharded_reorthogonalize():
    g = GRAPHS["uniform"]()
    mesh = make_mesh(4)
    ans, _, _, _ = expm_action_sharded(
        g, k=40, mesh=mesh, dtype="float64", reorthogonalize=True
    )
    ref = oracle.expm_action_dense(g, np.ones(g.n))
    assert oracle.rel_error(ans, ref) < 1e-10


def test_sharded_q_basis_sharding():
    """Q must stay sharded over the mesh (the reference streamed Q off-card,
    its PCIe bottleneck — cu_lanczos.cu:126; here it never leaves)."""
    g = GRAPHS["stencil"]()
    mesh = make_mesh(8)
    sg = pack_sharded(g, 8, mesh=mesh)
    x = np.ones(g.n)
    import jax.numpy as jnp

    x_dev = jax.device_put(
        jnp.asarray(sg.permute_in(x, np.float64)),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(ROWS)),
    )
    state = lanczos_sharded(sg, x_dev, 10, mesh)
    spec = state.q_basis.sharding.spec
    assert tuple(spec) == (None, ROWS)
