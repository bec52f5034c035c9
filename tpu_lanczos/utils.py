"""Small shared utilities."""

from __future__ import annotations

import os

import numpy as np


def enable_compile_cache(path: str | None = None) -> None:
    """Point JAX at a persistent compilation cache directory.

    The Pallas CPG kernel's first compile for a new shape bucket can take
    minutes (Mosaic through the remote compile-helper); the cache makes
    every later process pay ~0 for the same bucket.  Call before the first
    jit execution.  The reference's analog is nvcc ahead-of-time builds
    (its kernels compile once at make time, serial/Makefile:1-48); JAX
    compiles at trace time, so caching across processes is the equivalent.
    """
    import jax

    if path is None:
        path = os.environ.get(
            "TPU_LANCZOS_COMPILE_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"),
        )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs: compile cache is best-effort


class HostArray:
    """Hashable wrapper for host-side numpy metadata carried in pytree aux
    (jit cache keys require hashable aux with simple equality).

    Identity-based: two separately-constructed wrappers compare unequal
    even for equal contents, which at worst costs a recompile — never a
    wrong cache hit.
    """

    __slots__ = ("a",)

    def __init__(self, a):
        self.a = None if a is None else np.asarray(a)

    def __eq__(self, other):
        return isinstance(other, HostArray) and (
            self.a is other.a
            or (self.a is None and other.a is None)
        )

    def __hash__(self):
        return id(self.a) if self.a is not None else 0

    def __repr__(self):
        return f"HostArray({None if self.a is None else self.a.shape})"
