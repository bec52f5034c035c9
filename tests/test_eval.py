"""Eval-layer tests: sweeps, profiling helpers, bench-suite plumbing."""

import json

import numpy as np
import pytest

from tpu_lanczos.eval.sweeps import k_sweep, pack_sweep
from tpu_lanczos.eval.profiling import StageTimer, timed


def test_k_sweep_converges(capsys):
    out = k_sweep(n=400, edges=1200, ks=(5, 15, 30))
    errs = {r["k"]: r["rel_err"] for r in out}
    assert errs[30] < 1e-9
    assert errs[30] < errs[5]
    # JSON lines emitted
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert all(json.loads(l) for l in lines)


def test_pack_sweep_runs(capsys):
    out = pack_sweep(n=5000, m=6, thetas=(40,), subs=(128, 256))
    assert len(out) == 2
    assert all(r["tiles"] > 0 for r in out)
    # bigger chunks should not increase tile count
    assert out[1]["tiles"] <= out[0]["tiles"]


def test_stage_timer():
    import jax.numpy as jnp

    t = StageTimer()
    x = jnp.ones((256, 256))
    with t.stage("mm", x) as st:
        y = x @ x
        st.fence(y)  # the stage's OWN output is fenced at exit
    with t.stage("sum", y) as st:
        z = y.sum()
        st.fence(z)
    assert set(t.stages) == {"mm", "sum"}
    assert "total" in t.table()
    assert all(v > 0 for v in t.stages.values())


def test_timed():
    import jax.numpy as jnp

    x = jnp.ones((128, 128))
    out, dt = timed(lambda a: a + 1, x, reps=2)
    assert dt >= 0
    np.testing.assert_allclose(np.asarray(out), 2.0)


def test_bench_suite_config_shapes():
    from tpu_lanczos.eval.bench_suite import CONFIGS, build

    small = dict(name="t", kind="stencil", side=10)
    g = build(small)
    assert g.n == 100
    assert {c["kind"] for c in CONFIGS} <= {"barabasi", "uniform", "stencil", "stencil3d", "rmat", "clique"}


def test_pack_scan_estimates_match_actual_pack():
    """The scanner's Konig bound should track the real packer's tile
    count closely (native coloring achieves the bound to ~1%; the
    scanner's single-level reduce approximation adds a little slack)."""
    import numpy as np

    from tpu_lanczos.eval.pack_scan import scan_config
    from tpu_lanczos.graphs import generators
    from tpu_lanczos.kernels.cpg import pack_cpg

    g = generators.barabasi_albert(40000, 8, seed=3, use_native=False)
    est = scan_config(g, theta=50, theta_s=50, sub=256, order="degree",
                      redeal=True)
    cg = pack_cpg(g, theta=50, theta_s=50, sub=256, order="degree",
                  redeal=True)
    actual = cg.total_tiles
    assert 0.8 * actual <= est["total_tiles"] <= 1.2 * actual
