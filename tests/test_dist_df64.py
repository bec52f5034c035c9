"""Row-sharded df64 pipeline tests (interpret mode, virtual CPU mesh).

The reference's dual-GPU path ran the SAME templated-double arithmetic
as its single-GPU path (parallel-two-cards/lib/cu_lanczos.cu); the df64
sharded pipeline must likewise deliver f64-grade accuracy, not f32,
across any mesh size."""

import numpy as np
import pytest

from tpu_lanczos.core.lanczos_df import expm_action_df
from tpu_lanczos.dist import make_mesh
from tpu_lanczos.dist.lanczos_df import expm_action_df_sharded
from tpu_lanczos.eval import oracle
from tpu_lanczos.graphs import generators


GRAPHS = {
    "barabasi": lambda: generators.barabasi_albert(2000, 5, seed=2,
                                                   use_native=False),
    "uniform": lambda: generators.uniform_random(1500, 6000, seed=1),
    "stencil": lambda: generators.stencil_2d(40),
}


@pytest.mark.parametrize("name", list(GRAPHS))
def test_sharded_df64_matches_oracle(name):
    """f64-grade accuracy through the sharded df64 pipeline: orders of
    magnitude inside the f32 floor (~1e-7)."""
    g = GRAPHS[name]()
    mesh = make_mesh(8)
    res = expm_action_df_sharded(g, k=30, mesh=mesh)
    ref = oracle.expm_action(g, np.ones(g.n), 30)
    assert oracle.rel_error(res.ans, ref) < 5e-12


def test_sharded_df64_matches_single_chip_df64():
    """Implementation cross-check (reference: check_ans serial-vs-CUDA,
    parallel-final/main.cu:156): sharded vs single-chip df64 agree to
    df roundoff (the cross-shard dot fold changes summation order, so
    bit-identity is not expected — but the difference must sit at the
    ~2^-48 level, not the f32 level)."""
    g = GRAPHS["uniform"]()
    mesh = make_mesh(8)
    res_sh = expm_action_df_sharded(g, k=25, mesh=mesh)
    res_1 = expm_action_df(g, k=25)
    err = (np.linalg.norm(res_sh.ans - res_1.ans)
           / np.linalg.norm(res_1.ans))
    assert err < 1e-12
    np.testing.assert_allclose(res_sh.alpha, res_1.alpha,
                               rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize("n_dev", [2, 5, 8])
def test_sharded_df64_device_count_invariance(n_dev):
    """The answer must not depend on the mesh size (includes a
    non-dividing shard count)."""
    g = GRAPHS["barabasi"]()
    mesh = make_mesh(n_dev)
    res = expm_action_df_sharded(g, k=20, mesh=mesh)
    ref = oracle.expm_action(g, np.ones(g.n), 20)
    assert oracle.rel_error(res.ans, ref) < 5e-12


def test_sharded_df64_overlap_split_matches_unsplit():
    """The own/cross-source overlap split must not change df64 values
    beyond reordering roundoff."""
    g = GRAPHS["stencil"]()
    mesh = make_mesh(4)
    r_ov = expm_action_df_sharded(g, k=20, mesh=mesh, overlap=True)
    r_no = expm_action_df_sharded(g, k=20, mesh=mesh, overlap=False)
    err = (np.linalg.norm(r_ov.ans - r_no.ans)
           / np.linalg.norm(r_no.ans))
    assert err < 1e-13


def test_sharded_df64_log_scale_overflow_regime():
    """Hub-heavy graph where e^shift is large: the log-scale surface
    must carry the shift symbolically, matching the single-chip df64
    path on the common scale."""
    g = GRAPHS["barabasi"]()
    mesh = make_mesh(8)
    r_sh = expm_action_df_sharded(g, k=25, mesh=mesh, log_scale=True)
    r_1 = expm_action_df(g, k=25, log_scale=True)
    a = r_sh.ans * np.exp(r_sh.log_scale - r_1.log_scale)
    err = np.linalg.norm(a - r_1.ans) / np.linalg.norm(r_1.ans)
    assert err < 1e-12
