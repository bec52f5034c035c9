"""Double-word float32 ("df64") arithmetic for f64-grade accuracy on TPU.

TPU v5e has no hardware float64; JAX x64 on TPU is unusably slow, and
plain f32 floors the pipeline at ~1e-7 relative error (round-1
measurement) against the reference CUDA pipeline's hardware-f64
3e-16..9e-13 (parallel-final/output/final_output1.txt:31,63,95).  This
module implements the classical error-free transformations (Knuth
two-sum, Dekker split/two-product — no FMA required, which Mosaic does
not expose) over pairs of f32s, giving ~2^-48 relative precision:

- scalars and vectors are (hi, lo) pairs with |lo| <= ulp(hi)/2;
- ``df_dot`` uses exact per-element two-products plus a two-sum
  pairwise reduction tree whose error terms are summed separately
  (Ogita-Rump-Oishi dot2 structure, vectorized for the VPU: log2(n)
  tree levels instead of a sequential Kahan loop);
- the SpMV side stays exact by construction: the CPG kernel's routing
  moves values without arithmetic, and its tile accumulation runs in a
  compensated (two-sum) variant (kernels/spmv_cpg.py compensated=True).

Everything is jittable, static-shaped, and runs on the VPU at a small
constant multiple of the f32 cost — the TPU-native substitute for the
reference's `-lcublas` double math.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# High-half mask for the bit-level split: keep sign+exponent+top 11
# mantissa bits (12 significant bits), zero the low 12.  Both halves
# then carry <=12 significant bits, so all half-products are exact in
# f32 (24-bit significand).
_HI_MASK = jnp.uint32(0xFFFFF000)


def two_sum(a, b):
    """Error-free transformation: a + b = s + e exactly (Knuth)."""
    s = a + b
    z = s - a
    e = (a - (s - z)) + (b - z)
    return s, e


def fast_two_sum(a, b):
    """Error-free a + b = s + e, requiring |a| >= |b| (Dekker)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    """Bit-level split: a = hi + lo with <=12-significant-bit halves
    (exact products).  A bitcast+mask truncation rather than the
    classical Veltkamp multiply (t = 4097*a; hi = t - (t - a)): the
    Veltkamp form relies on the ROUNDING of t, and compiler backends
    that contract `a*4097 - a` into a fused multiply-add (XLA:CPU's
    LLVM pipeline does, inside large fusions) compute it exactly,
    silently destroying the split and with it every downstream
    error-free transformation — measured as an f32-grade ~2e-8 floor
    on the whole df64 pipeline.  Bit masking has no multiply to
    contract, is exact by construction, and is a cheaper VPU op."""
    bits = jax.lax.bitcast_convert_type(a, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(bits & _HI_MASK, jnp.float32)
    return hi, a - hi


def two_prod(a, b):
    """Error-free a * b = p + e (exact-product tree, contraction-proof).

    The classical Dekker form computes ``p = a*b`` then reconstructs the
    error as ``(ah*bh - p) + ...`` — which requires ``p`` to be the
    ROUNDED product.  XLA:CPU's codegen contracts ``mul`` feeding
    ``add``/``sub`` into an FMA unconditionally (no flag disables it;
    optimization_barrier and bitcast round-trips are elided before
    codegen), so any consumer of ``p`` may silently see the UNROUNDED
    product and the EFT collapses to f32 grade (measured: a stable
    ~2e-8 floor on the df64 pipeline).

    This version never exposes a rounded product to an add/sub: the
    four split-products are EXACT in f32 (each factor carries <=12
    significand bits, see _split), and ``fma(x, y, z) == (x*y) + z ==
    round(round(x*y) + z)`` when ``x*y`` is exact — so FMA contraction
    is semantics-preserving everywhere it can occur.  ``p`` itself is
    assembled by two_sums (add-topped, nothing to contract), and
    ``p + e == a*b`` exactly with the error terms' own rounding at
    second order (~2^-48 relative), same as the Dekker form."""
    ah, al = _split(a)
    bh, bl = _split(b)
    p, e1 = two_sum(ah * bh, ah * bl)
    p, e2 = two_sum(p, al * bh)
    p, e3 = two_sum(p, al * bl)
    return p, (e1 + e2) + e3


# ------------------------------------------------------------- df scalars
# A df value is a tuple (hi, lo); scalars and same-shape arrays alike.


def df_add(x, y):
    s, e = two_sum(x[0], y[0])
    e = e + (x[1] + y[1])
    return fast_two_sum(s, e)


def df_sub(x, y):
    return df_add(x, (-y[0], -y[1]))


def df_mul(x, y):
    p, e = two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return fast_two_sum(p, e)


def df_div(x, y):
    q1 = x[0] / y[0]
    r = df_sub(x, df_mul((q1, jnp.zeros_like(q1)), y))
    q2 = (r[0] + r[1]) / y[0]
    return fast_two_sum(q1, q2)


def df_sqrt(x):
    s1 = jnp.sqrt(x[0])
    r = df_sub(x, df_mul((s1, jnp.zeros_like(s1)), (s1, jnp.zeros_like(s1))))
    s2 = (r[0] + r[1]) / (2.0 * s1)
    s2 = jnp.where(s1 > 0, s2, jnp.zeros_like(s2))
    return fast_two_sum(s1, s2)


def df_from(a):
    return jnp.asarray(a, jnp.float32), jnp.zeros_like(jnp.asarray(a, jnp.float32))


def df_to_f64(x):
    """Host-side: collapse a df pair to numpy float64."""
    import numpy as np

    return np.asarray(x[0], np.float64) + np.asarray(x[1], np.float64)


# ------------------------------------------------------------- reductions


def _tree_sum_df(p, e_vec):
    """Pairwise two-sum reduction of p (n,) to a df scalar.  The tree's
    per-level error terms (and the caller's first-order error vector
    ``e_vec``) are summed plainly — their own rounding is second-order
    (~n * 2^-48 relative)."""
    err = jnp.sum(e_vec)
    n = p.shape[0]
    pow2 = 1 << max((n - 1).bit_length(), 0)
    if pow2 != n:
        p = jnp.concatenate([p, jnp.zeros(pow2 - n, p.dtype)])
    while p.shape[0] > 1:
        m = p.shape[0] // 2
        p, t = two_sum(p[:m], p[m:])
        err = err + jnp.sum(t)
    return fast_two_sum(p[0], err)


def df_dot(x, y):
    """df dot product of df vectors x, y -> df scalar.

    Exact two-products; hi parts reduced by a pairwise two-sum tree, all
    error terms (product errors + cross terms + tree errors) summed
    plainly (their own rounding is second-order, ~n * 2^-48)."""
    p, e = two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return _tree_sum_df(p, e)


def df_norm(x):
    return df_sqrt(df_dot(x, x))


# df scalar * df vector / axpy-style ops (elementwise df ops broadcast)


def df_scale(a, x):
    """df scalar a times df vector x."""
    return df_mul((jnp.broadcast_to(a[0], x[0].shape),
                   jnp.broadcast_to(a[1], x[0].shape)), x)
